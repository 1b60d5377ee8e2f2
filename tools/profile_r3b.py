"""Round-3 stage profile of the bench path on the real device.

Breaks the 76 ms/frame down into: ORB frame build, tracking stages, and the
keyframe-insertion pipeline (and its sub-stages), using the exact bench
shapes (640x480, 1000 feats, 128 KF / 16k MP capacity).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, local_mapping
from orb_slam2v2_1_tpu.models.map_state import (
    empty_map, refresh_covis, update_mp_stats_window,
)
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
poses = synthetic.desk_trajectory(12)
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


# --- build a live map with several keyframes so stage costs are realistic ---
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
    lambda st, im, de, last, vel, havev, ref, fid: frontend.process_frame_impl(
        st, im, de, last, vel, havev, ref, K, dist, bf, depth_limit,
        fid, ocfg, True, cfg.width, cfg.height, False,
    )
)
ins = jax.jit(
    lambda st, fr, key: frontend.insert_keyframe_fused(st, fr, K, bf, depth_limit, key)
)

last = f0
vel = jnp.eye(4)
havev = jnp.asarray(False)
ref = jnp.int32(0)
for i in range(1, len(frames)):
    res = proc(state, *frames[i], last, vel, havev, ref, jnp.int32(i))
    state = res.state
    if i % 3 == 0:
        state, kf_id, _, _, _, _ = ins(state, res.frame, jax.random.fold_in(jax.random.key(0), i))
        ref = kf_id
        fr = res.frame._replace(mp=state.kf_mp[kf_id])
    else:
        fr = res.frame
    last, vel, havev = fr, res.velocity, jnp.asarray(True)

n_kf = int(jnp.sum(state.kf_valid.astype(jnp.int32)))
n_mp = int(jnp.sum(state.mp_valid.astype(jnp.int32)))
print(f"map: {n_kf} KFs, {n_mp} MPs")

im, de = frames[-1]
res = proc(state, im, de, last, vel, havev, ref, jnp.int32(99))
fr = res.frame

# --- headline stage costs ---
print(f"build_frame_only:      {timeit(build, im, de):7.2f} ms")
t_proc = timeit(proc, state, im, de, last, vel, havev, ref, jnp.int32(99))
print(f"process_frame (full):  {t_proc:7.2f} ms")

track = jax.jit(
    lambda st, cur, last, vel, havev, ref: frontend.track_frame_impl(
        st, cur, last, vel, havev, ref, K, bf, depth_limit,
        cfg.width, cfg.height, False,
    )
)
print(f"track only:            {timeit(track, state, fr, last, vel, havev, ref):7.2f} ms")

key = jax.random.fold_in(jax.random.key(0), 99)
print(f"insert_keyframe_fused: {timeit(ins, state, fr, key, n=5):7.2f} ms")

# --- insertion sub-stages ---
append = jax.jit(lambda s, f: frontend._append_keyframe_body(s, f, K, bf, depth_limit))
st1, kf_id = append(state, fr)
print(f"  append+depth_pts:    {timeit(append, state, fr):7.2f} ms")

cull_mp = jax.jit(lambda s: local_mapping.cull_map_points(s, kf_id))
st2 = cull_mp(st1)
print(f"  cull_map_points:     {timeit(cull_mp, st1):7.2f} ms")

create = jax.jit(lambda s: local_mapping.create_map_points(s, kf_id, K, bf, key))
st3 = create(st2)
print(f"  create_map_points:   {timeit(create, st2):7.2f} ms")

fuse = jax.jit(lambda s: local_mapping.fuse_map_points(s, kf_id, K, bf))
st4 = fuse(st3)
print(f"  fuse_map_points:     {timeit(fuse, st3):7.2f} ms")

stats = jax.jit(lambda s: update_mp_stats_window(s, kf_id))
st5 = stats(st4)
print(f"  update_mp_stats_win: {timeit(stats, st4):7.2f} ms")

lba = jax.jit(lambda s: local_mapping.local_bundle_adjustment_impl(s, kf_id, K, bf)[0])
st6 = lba(st5)
print(f"  local_BA:            {timeit(lba, st5, n=5):7.2f} ms")

cull_kf = jax.jit(lambda s: local_mapping.cull_keyframes(s, kf_id)[0])
st7 = cull_kf(st6)
print(f"  cull_keyframes:      {timeit(cull_kf, st6):7.2f} ms")

rc = jax.jit(refresh_covis)
print(f"  refresh_covis:       {timeit(rc, st7):7.2f} ms")

# --- ORB extraction sub-stages ---
ex = jax.jit(lambda i: orb.extract_orb(i, ocfg))
print(f"extract_orb:           {timeit(ex, im):7.2f} ms")

# tracking sub-stages
from orb_slam2v2_1_tpu.models import tracking as trk
mm = jax.jit(
    lambda st, cur, last: trk.track_motion_model(
        st, cur, last, last.pose, K, bf, jnp.float32(7.0)
    )
)
_ = mm(state, fr, last)
print(f"  track_motion_model:  {timeit(mm, state, fr, last):7.2f} ms")

tlm = jax.jit(
    lambda st, cur: trk.track_local_map(
        st, cur, cur.pose, K, bf, jnp.float32(0.5),
        jnp.asarray([cfg.width, cfg.height], jnp.float32),
    )
)
_ = tlm(state, fr)
print(f"  track_local_map:     {timeit(tlm, state, fr):7.2f} ms")

trf = jax.jit(
    lambda st, cur, ref: trk.track_reference_keyframe(
        st, cur, ref, cur.pose, K, bf
    )
)
_ = trf(state, fr, ref)
print(f"  track_ref_kf:        {timeit(trf, state, fr, ref):7.2f} ms")
