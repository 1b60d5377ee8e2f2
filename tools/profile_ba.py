"""Fine-grained timing of the local-BA path on the real device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, local_mapping
from orb_slam2v2_1_tpu.models.map_state import empty_map
from orb_slam2v2_1_tpu.ops import ba, orb
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


# --- prologue: window selection + problem extraction only ---
def prologue(state, kf_id):
    from orb_slam2v2_1_tpu.models.local_mapping import (
        BA_CAMS, BA_FIXED, BA_OBS, BA_PTS,
    )
    from orb_slam2v2_1_tpu.models.map_state import covisibility
    from orb_slam2v2_1_tpu.models.tracking import INV_LEVEL_SIGMA2, N_LEVELS

    Kmax, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    C = covisibility(state)
    w = C[kf_id].at[kf_id].set(1 << 20)
    w = jnp.where(state.kf_valid, w, -1)
    free_w, free_idx = jax.lax.top_k(w, min(BA_CAMS, Kmax))
    free_mask = jnp.zeros(Kmax, bool).at[free_idx].set(free_w > 0)
    mp_in = jnp.where(
        (state.kf_mp >= 0) & state.kf_kp_valid & free_mask[:, None], state.kf_mp, M
    )
    pt_mask = jnp.zeros(M + 1, bool).at[mp_in.reshape(-1)].set(True)[:M] & state.mp_valid
    _, pt_sel = jax.lax.top_k(pt_mask.astype(jnp.int32), min(BA_PTS, M))
    pt_sel_valid = pt_mask[pt_sel]
    inv_pt = jnp.full(M + 1, -1, jnp.int32).at[jnp.where(pt_sel_valid, pt_sel, M)].set(
        jnp.arange(pt_sel.shape[0], dtype=jnp.int32)
    )
    sees_sel = jnp.any(
        (state.kf_mp >= 0) & state.kf_kp_valid & (inv_pt[jnp.maximum(state.kf_mp, 0)] >= 0),
        axis=1,
    )
    fixed_cand = sees_sel & ~free_mask & state.kf_valid
    _, fixed_idx = jax.lax.top_k(fixed_cand.astype(jnp.int32), min(BA_FIXED, Kmax))
    cam_kf = jnp.concatenate([free_idx, fixed_idx])
    in_cam = jnp.zeros(Kmax, bool).at[cam_kf].set(True)
    flat_ok = (
        in_cam[:, None]
        & state.kf_kp_valid
        & (state.kf_mp >= 0)
        & (inv_pt[jnp.maximum(state.kf_mp, 0)] >= 0)
    ).reshape(-1)
    _, obs_sel = jax.lax.top_k(flat_ok.astype(jnp.int32), min(BA_OBS, Kmax * N))
    return cam_kf, pt_sel, obs_sel


prol = jax.jit(prologue)
r = prol(st1, kf_id)
print(f"prologue (topk x3): {timeit(prol, st1, kf_id):.2f} ms")


# extract a real problem to time the solver alone
def extract(state, kf_id):
    # reuse the impl but stop before bundle_adjust by monkeypatching
    probs = []
    orig = ba.bundle_adjust

    def capture(p, **kw):
        probs.append(p)
        return orig(p, **kw)

    ba.bundle_adjust = capture
    try:
        local_mapping.local_bundle_adjustment_impl(state, kf_id, K, bf)
    finally:
        ba.bundle_adjust = orig
    return probs[0]


prob = jax.tree.map(lambda x: x, extract(st1, kf_id))
prob = jax.block_until_ready(prob)
C = prob.poses.shape[0]
P = prob.points.shape[0]
O = prob.obs.valid.shape[0]
print(f"problem: C={C} P={P} O={O}")

s5d = jax.jit(lambda p: ba.ba_step_count(p, iters=5, robust=True, dense=True))
print(f"ba 5 iters dense:  {timeit(s5d, prob, n=5):.2f} ms")
s5p = jax.jit(lambda p: ba.ba_step_count(p, iters=5, robust=True, dense=False))
print(f"ba 5 iters pcg:    {timeit(s5p, prob, n=5):.2f} ms")
s1d = jax.jit(lambda p: ba.ba_step_count(p, iters=1, robust=True, dense=True))
print(f"ba 1 iter dense:   {timeit(s1d, prob, n=5):.2f} ms")

cls = jax.jit(ba.classify_outliers)
print(f"classify_outliers: {timeit(cls, prob, n=5):.2f} ms")

# building blocks
inl = prob.obs.valid.astype(jnp.float32)
bs = jax.jit(lambda p: ba._build_system(p, True, inl))
print(f"_build_system:     {timeit(bs, prob, n=10):.2f} ms")

r_, Jc, Jp, w_, cost, chi2, behind = bs(prob)
sd = jax.jit(lambda p, r, Jc, Jp, w: ba._schur_solve_dense(p, r, Jc, Jp, w, jnp.float32(1e-4)))
print(f"_schur_dense:      {timeit(sd, prob, r_, Jc, Jp, w_, n=10):.2f} ms")

# inner pieces of dense schur
cam = prob.obs.cam_idx
pt = prob.obs.pt_idx
Wc = Jc * w_[:, None, None]
Wp = Jp * w_[:, None, None]
Bo = jnp.einsum("oia,oib->oab", Wc, Jp)
scatter_B = jax.jit(lambda Bo: jnp.zeros((P, C, 6, 3)).at[pt, cam].add(Bo))
B = scatter_B(Bo)
print(f"  scatter B:       {timeit(scatter_B, Bo, n=10):.2f} ms")
Hpp = jnp.zeros((P, 3, 3)).at[pt].add(jnp.einsum("oia,oib->oab", Jp, Wp))
Hpp_d = Hpp + 1e-3 * jnp.eye(3)
inv3 = jax.jit(jnp.linalg.inv)
print(f"  inv (P,3,3):     {timeit(inv3, Hpp_d, n=10):.2f} ms")
Hpp_inv = inv3(Hpp_d)
corr = jax.jit(
    lambda B, Hpp_inv: jnp.einsum(
        "pcay,pdby->cadb", jnp.einsum("pcax,pxy->pcay", B, Hpp_inv), B
    )
)
print(f"  S_corr einsums:  {timeit(corr, B, Hpp_inv, n=10):.2f} ms")
S = corr(B, Hpp_inv).reshape(C * 6, C * 6) + 1e3 * jnp.eye(C * 6)
cho = jax.jit(lambda S: jax.scipy.linalg.cho_factor(S))
print(f"  cho_factor 288:  {timeit(cho, S, n=10):.2f} ms")
