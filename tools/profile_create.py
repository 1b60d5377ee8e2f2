"""Bisect create_map_points + local BA window assembly on the real device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, local_mapping
from orb_slam2v2_1_tpu.models.map_state import empty_map, covisibility
from orb_slam2v2_1_tpu.ops import ba, hamming, matching, orb
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

# --- create_map_points sub-pieces ---
cov = jax.jit(covisibility)
print(f"covisibility:        {timeit(cov, st1):7.2f} ms")

T = local_mapping.TRI_NEIGHBORS
C = cov(st1)
neigh_w, neigh_idx = jax.lax.top_k(C[kf_id], T)

tri = jax.jit(
    lambda s, nidx, nw: jax.vmap(
        lambda n_kf, w: local_mapping._triangulate_candidates(s, kf_id, n_kf, w > 0, K, bf)
    )(nidx, nw)
)
out = tri(st1, neigh_idx, neigh_w)
print(f"tri_candidates x10:  {timeit(tri, st1, neigh_idx, neigh_w):7.2f} ms")

# single pair
tri1 = jax.jit(
    lambda s: local_mapping._triangulate_candidates(s, kf_id, neigh_idx[0], True, K, bf)
)
_ = tri1(st1)
print(f"tri_candidates x1:   {timeit(tri1, st1):7.2f} ms")

# --- full create for scale ---
create = jax.jit(lambda s, k, key: local_mapping.create_map_points(s, k, K, bf, key))
key = jax.random.key(1)
st3 = create(st1, kf_id, key)
print(f"create_map_points:   {timeit(create, st1, kf_id, key):7.2f} ms")

# --- local BA: assembly vs solve ---
st5 = st3


def assemble(state, kf_id):
    """Everything in local_bundle_adjustment_impl before bundle_adjust_window."""
    Kmax, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    P = min(local_mapping.BA_PTS, M)
    from orb_slam2v2_1_tpu.models.tracking import INV_LEVEL_SIGMA2, N_LEVELS

    C = covisibility(state)
    w = C[kf_id].at[kf_id].set(1 << 20)
    w = jnp.where(state.kf_valid, w, -1)
    free_w, free_idx = jax.lax.top_k(w, min(local_mapping.BA_CAMS, Kmax))
    free_mask = jnp.zeros(Kmax, bool).at[free_idx].set(free_w > 0)
    mp_in = jnp.where(
        (state.kf_mp >= 0) & state.kf_kp_valid & free_mask[:, None], state.kf_mp, M
    )
    pt_mask = jnp.zeros(M + 1, bool).at[mp_in.reshape(-1)].set(True)[:M] & state.mp_valid
    _, pt_sel = jax.lax.top_k(pt_mask.astype(jnp.int32), P)
    pt_sel_valid = pt_mask[pt_sel]
    inv_pt = jnp.full(M + 1, P, jnp.int32).at[jnp.where(pt_sel_valid, pt_sel, M)].set(
        jnp.arange(P, dtype=jnp.int32)
    )[:M]
    sees_sel = jnp.any(
        (state.kf_mp >= 0) & state.kf_kp_valid & (inv_pt[jnp.maximum(state.kf_mp, 0)] < P),
        axis=1,
    )
    fixed_cand = sees_sel & ~free_mask & state.kf_valid
    _, fixed_idx = jax.lax.top_k(fixed_cand.astype(jnp.int32), min(local_mapping.BA_FIXED, Kmax))
    fixed_valid = fixed_cand[fixed_idx]
    cam_kf = jnp.concatenate([free_idx, fixed_idx])
    cam_used = jnp.concatenate([free_mask[free_idx], fixed_valid])
    cam_fixed = jnp.concatenate(
        [jnp.zeros_like(free_idx, dtype=bool), jnp.ones_like(fixed_idx, dtype=bool)]
    )
    cam_fixed = cam_fixed | ~cam_used
    order_key = jnp.where(cam_used & ~cam_fixed, cam_kf, 1 << 20)
    anchor = jnp.argsort(order_key)[:1]
    cam_fixed = cam_fixed.at[anchor].set(True)
    kf_mp_w = state.kf_mp[cam_kf]
    pt_idx = inv_pt[jnp.maximum(kf_mp_w, 0)]
    obs_valid = (
        cam_used[:, None]
        & state.kf_kp_valid[cam_kf]
        & (kf_mp_w >= 0)
        & (pt_idx < P)
    )
    win = ba.BAWindow(
        poses=state.kf_pose[cam_kf],
        points=state.mp_pos[pt_sel],
        pt_idx=jnp.where(obs_valid, pt_idx, P),
        target=jnp.concatenate(
            [state.kf_xy[cam_kf], state.kf_ur[cam_kf][..., None]], -1
        ),
        inv_sigma2=INV_LEVEL_SIGMA2[jnp.clip(state.kf_level[cam_kf], 0, N_LEVELS - 1)],
        is_stereo=state.kf_ur[cam_kf] >= 0,
        valid=obs_valid,
        cam_fixed=cam_fixed,
        K=K,
        bf=bf,
    )
    return win


asm = jax.jit(assemble)
win = asm(st5, kf_id)
print(f"BA window assembly:  {timeit(asm, st5, kf_id):7.2f} ms")

solve5 = jax.jit(lambda w: ba.ba_window_steps(w, iters=5, robust=True))
_ = solve5(win)
print(f"ba_window 5 iters:   {timeit(solve5, win):7.2f} ms")

solve15 = jax.jit(lambda w: ba.bundle_adjust_window(w))
_ = solve15(win)
print(f"bundle_adjust_window:{timeit(solve15, win):7.2f} ms")

lba = jax.jit(lambda s, k: local_mapping.local_bundle_adjustment_impl(s, k, K, bf))
_ = lba(st5, kf_id)
print(f"local_BA total:      {timeit(lba, st5, kf_id):7.2f} ms")
