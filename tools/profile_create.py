"""Isolate the cost inside create_map_points' vmapped candidates."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, local_mapping
from orb_slam2v2_1_tpu.models.map_state import empty_map, covisibility
from orb_slam2v2_1_tpu.ops import orb, hamming, matching
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
append = jax.jit(lambda s, f: frontend._append_keyframe_body(s, f, K, bf, depth_limit))
st1, kf_id = append(res.state, res.frame)
key = jax.random.key(1)

T = local_mapping.TRI_NEIGHBORS


def cands_only(state, kf_id):
    C = covisibility(state)
    neigh_w, neigh_idx = jax.lax.top_k(C[kf_id], T)
    return jax.vmap(
        lambda n_kf, w: local_mapping._triangulate_candidates(
            state, kf_id, n_kf, w > 0, K, bf
        )
    )(neigh_idx, neigh_w)


co = jax.jit(cands_only)
print(f"candidates vmap:  {timeit(co, st1, kf_id):.2f} ms")


def one_cand(state, kf_id, n_kf):
    return local_mapping._triangulate_candidates(state, kf_id, n_kf, jnp.asarray(True), K, bf)


oc = jax.jit(one_cand)
print(f"one candidate:    {timeit(oc, st1, kf_id, jnp.int32(0)):.2f} ms")


# pieces of one candidate pair
def match_part(state, kf1, kf2):
    N = state.kf_xy.shape[1]
    free1 = state.kf_kp_valid[kf1] & (state.kf_mp[kf1] < 0)
    free2 = state.kf_kp_valid[kf2] & (state.kf_mp[kf2] < 0)
    d1 = hamming.unpack_pm1(state.kf_desc[kf1])
    d2 = hamming.unpack_pm1(state.kf_desc[kf2])
    mask = free1[:, None] & free2[None, :]
    m = matching.match_nn(d1, d2, mask, max_dist=matching.TH_LOW, nn_ratio=1.0)
    dang = state.kf_angle[kf1] - state.kf_angle[kf2][m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    m = matching.resolve_duplicates(m.idx, m.dist, ok, N)
    return m


mp = jax.jit(match_part)
print(f"  match part (1): {timeit(mp, st1, kf_id, jnp.int32(0)):.2f} ms")

mpv = jax.jit(
    lambda s, k: jax.vmap(lambda n: match_part(s, k, n))(jnp.arange(T, dtype=jnp.int32))
)
print(f"  match part x{T}: {timeit(mpv, st1, kf_id):.2f} ms")


def med_part(state, kf2):
    pose2 = state.kf_pose[kf2]
    mp2 = state.kf_mp[kf2]
    has2 = (mp2 >= 0) & state.kf_kp_valid[kf2]
    pz = (pose2[2, :3] @ state.mp_pos[jnp.maximum(mp2, 0)].T) + pose2[2, 3]
    pz = jnp.where(has2, pz, jnp.nan)
    return jnp.nanmedian(pz)


mdv = jax.jit(lambda s: jax.vmap(lambda n: med_part(s, n))(jnp.arange(T, dtype=jnp.int32)))
print(f"  nanmedian x{T}:  {timeit(mdv, st1):.2f} ms")
