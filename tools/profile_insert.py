"""Sub-stage timing of insert_keyframe_fused on the real device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, local_mapping
from orb_slam2v2_1_tpu.models.map_state import empty_map, _update_mp_stats_jit
from orb_slam2v2_1_tpu.ops import orb
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig

print("backend:", jax.default_backend())

cfg = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
    bf=44.0, th_depth=40.0,
)
rng = np.random.default_rng(7)
scene = synthetic.make_desk(rng)
poses = synthetic.desk_trajectory(6)
poses = [p @ np.linalg.inv(poses[0]) for p in poses]
K = jnp.asarray(cfg.K)
dist = jnp.asarray(cfg.dist, jnp.float32)
bf = jnp.float32(cfg.bf)
depth_limit = jnp.float32(cfg.bf * cfg.th_depth / cfg.fx)
ocfg = orb.OrbConfig(n_features=cfg.n_features)

frames = []
for Tcw in poses:
    img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
    frames.append((jnp.asarray(img), jnp.asarray(depth)))


def timeit(f, *a, n=10, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


build = jax.jit(
    lambda im, de: frontend.build_frame_only(
        im, de, K, dist, bf, jnp.int32(0), ocfg, True, cfg.width, cfg.height
    )
)
f0 = build(*frames[0])
state = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
state, kf0, _ = initialization.create_initial_map_depth(state, f0, K)
f0 = f0._replace(mp=state.kf_mp[0])

proc = jax.jit(
    lambda st, im, de, last, vel, havev: frontend.process_frame_impl(
        st, im, de, last, vel, havev, jnp.int32(0), K, dist, bf, depth_limit,
        jnp.int32(1), ocfg, True, cfg.width, cfg.height, False,
    )
)
res = proc(state, *frames[1], f0, jnp.eye(4), jnp.asarray(False))
st, fr = res.state, res.frame

append = jax.jit(lambda s, f: frontend._append_keyframe_body(s, f, K, bf, depth_limit))
st1, kf_id = append(st, fr)
print(f"append+depth_pts:  {timeit(append, st, fr):.2f} ms")

cull = jax.jit(local_mapping.cull_map_points)
st2 = cull(st1, kf_id)
print(f"cull_map_points:   {timeit(cull, st1, kf_id):.2f} ms")

create = jax.jit(lambda s, k, key: local_mapping.create_map_points(s, k, K, bf, key))
key = jax.random.key(1)
st3 = create(st2, kf_id, key)
print(f"create_map_points: {timeit(create, st2, kf_id, key):.2f} ms")

fuse = jax.jit(lambda s, k: local_mapping.fuse_map_points(s, k, K, bf))
st4 = fuse(st3, kf_id)
print(f"fuse_map_points:   {timeit(fuse, st3, kf_id):.2f} ms")

stats = jax.jit(_update_mp_stats_jit)
st5 = stats(st4)
print(f"update_mp_stats:   {timeit(stats, st4):.2f} ms")

lba = jax.jit(lambda s, k: local_mapping.local_bundle_adjustment_impl(s, k, K, bf))
st6, cost = lba(st5, kf_id)
print(f"local_BA:          {timeit(lba, st5, kf_id):.2f} ms")
