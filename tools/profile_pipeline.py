"""Per-stage timing of the bench pipeline on the real device.

Breaks the offline scan step into its stages to locate the ms budget:
frame build (ORB), tracking (match + pose opt), keyframe insertion
(triangulate/fuse/cull/local BA).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization
from orb_slam2v2_1_tpu.models.map_state import empty_map
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


def timeit(f, *a, n=20, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


img0, dep0 = frames[0]

# Stage 1: frame build (ORB extraction + undistort + depth association)
build = jax.jit(
    lambda im, de: frontend.build_frame_only(
        im, de, K, dist, bf, jnp.int32(0), ocfg, True, cfg.width, cfg.height
    )
)
t_build = timeit(build, img0, dep0)
print(f"build_frame_only: {t_build:.2f} ms")

# Sub-stage: raw ORB extraction
ex = jax.jit(lambda im: orb.extract_orb(im, ocfg))
t_orb = timeit(ex, img0)
print(f"  extract_orb:    {t_orb:.2f} ms")

# Init map on frame 0
f0 = build(img0, dep0)
state = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
state, kf0, _ = initialization.create_initial_map_depth(state, f0, K)
f0 = f0._replace(mp=state.kf_mp[0])

# Stage 2: full per-frame tracking program
proc = jax.jit(
    lambda st, im, de, last, vel, havev: frontend.process_frame(
        st, im, de, last, vel, havev, jnp.int32(0), K, dist, bf, depth_limit,
        jnp.int32(1), ocfg, True, cfg.width, cfg.height, False,
    ),
    static_argnames=(),
)
img1, dep1 = frames[1]
res = proc(state, img1, dep1, f0, jnp.eye(4), jnp.asarray(False))
t_track = timeit(proc, state, img1, dep1, f0, jnp.eye(4), jnp.asarray(False))
print(f"process_frame:    {t_track:.2f} ms   (tracking minus build = {t_track - t_build:.2f})")

# Stage 3: keyframe insertion (mapping + local BA)
ins = jax.jit(
    lambda st, fr: frontend.insert_keyframe_fused(
        st, fr, K, bf, depth_limit, jax.random.key(1)
    )
)
_ = ins(res.state, res.frame)
t_ins = timeit(ins, res.state, res.frame, n=10)
print(f"insert_keyframe_fused: {t_ins:.2f} ms")

print(
    f"\nscan-step estimate: track {t_track:.1f} + kf_rate*insert {t_ins:.1f}"
)
