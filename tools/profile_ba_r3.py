"""Bisect ba_window_steps on a REAL local-BA window from the pipeline.

The axon tunnel has a ~4 ms per-dispatch floor, so every measurement loops
the op inside one jitted fori_loop (k reps) and divides.
"""

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
poses = synthetic.desk_trajectory(12)
poses = [p @ np.linalg.inv(poses[0]) for p in poses]
K = jnp.asarray(cfg.K)
dist = jnp.asarray(cfg.dist, jnp.float32)
bf = jnp.float32(cfg.bf)
depth_limit = jnp.float32(cfg.bf * cfg.th_depth / cfg.fx)
ocfg = orb.OrbConfig(n_features=cfg.n_features)

frames = [
    tuple(map(jnp.asarray, synthetic.render(scene, jnp.asarray(T), K, cfg.width, cfg.height)))
    for T in poses
]

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

last, vel, havev, ref = f0, jnp.eye(4), jnp.asarray(False), jnp.int32(0)
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

# Append one more KF (not BA'd yet) and grab its real window.
res = proc(state, *frames[-1], last, vel, havev, ref, jnp.int32(99))
append = jax.jit(lambda s, f: frontend._append_keyframe_body(s, f, K, bf, depth_limit))
st1, kf_id = append(res.state, res.frame)
st1 = jax.jit(lambda s: local_mapping.cull_map_points(s, kf_id))(st1)
st1 = jax.jit(lambda s: local_mapping.create_map_points(s, kf_id, K, bf, jax.random.key(3)))(st1)

# Reproduce window assembly (same code as local_bundle_adjustment_impl).
from orb_slam2v2_1_tpu.models.map_state import row_covisibility
from orb_slam2v2_1_tpu.models.tracking import INV_LEVEL_SIGMA2, N_LEVELS


def assemble(state):
    Kmax, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    P = min(local_mapping.BA_PTS, M)
    row = row_covisibility(state, kf_id)
    w = row.at[kf_id].set(1 << 20)
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
    order_key = jnp.where(cam_used & ~cam_fixed, state.kf_seq[cam_kf], 1 << 20)
    anchor = jnp.argsort(order_key)[:1]
    cam_fixed = cam_fixed.at[anchor].set(True)
    kf_mp_w = state.kf_mp[cam_kf]
    pt_idx = inv_pt[jnp.maximum(kf_mp_w, 0)]
    obs_valid = (
        cam_used[:, None] & state.kf_kp_valid[cam_kf] & (kf_mp_w >= 0) & (pt_idx < P)
    )
    return ba.BAWindow(
        poses=state.kf_pose[cam_kf],
        points=state.mp_pos[pt_sel],
        pt_idx=jnp.where(obs_valid, pt_idx, P),
        target=jnp.concatenate([state.kf_xy[cam_kf], state.kf_ur[cam_kf][..., None]], -1),
        inv_sigma2=INV_LEVEL_SIGMA2[jnp.clip(state.kf_level[cam_kf], 0, N_LEVELS - 1)],
        is_stereo=state.kf_ur[cam_kf] >= 0,
        valid=obs_valid,
        cam_fixed=cam_fixed,
        K=K,
        bf=bf,
    )


win = jax.jit(assemble)(st1)
print("window: obs =", int(jnp.sum(win.valid)), " pts =", int(jnp.sum(jnp.any(win.pt_idx[None] >= 0, 0) & (win.pt_idx < win.points.shape[0])).item() if False else 0))


def timeit(f, *a, n=10, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


# iteration sweep on the REAL window
prev = None
for it in (1, 2, 3, 5, 8, 15):
    f = jax.jit(lambda w, i=it: ba.ba_window_steps(w, iters=i))
    t = timeit(f, win, n=10)
    d = "" if prev is None else f"  (+{t - prev:.2f}/iter-ish)"
    print(f"ba_window_steps it={it:2d}: {t:7.2f} ms{d}")
    prev = t

# full composite
f = jax.jit(lambda w: ba.bundle_adjust_window(w))
print(f"bundle_adjust_window:  {timeit(f, win, n=10):7.2f} ms")

# repeated schur step inside ONE jit to amortize dispatch
slot_of = jax.jit(ba._window_slot_of)(win)
r, Jc, Jp, _ = jax.jit(lambda w: ba._window_eval(w.poses, w.points, w, with_jac=True))(win)
wgt = win.inv_sigma2 * win.valid


def rep_step(k):
    def body(i, acc):
        dxc, dxp = ba._window_schur_step(win, slot_of, r, Jc, Jp, wgt + acc * 0, jnp.float32(1e-4))
        return acc + jnp.sum(dxc) * 1e-20

    return jax.jit(lambda: jax.lax.fori_loop(0, k, body, jnp.float32(0.0)))


t1 = timeit(rep_step(1), n=5)
t11 = timeit(rep_step(11), n=5)
print(f"schur_step amortized:  {(t11 - t1) / 10:7.2f} ms/step  (1rep={t1:.2f}, 11rep={t11:.2f})")


def rep_eval(k):
    def body(i, acc):
        r, Jc, Jp, _ = ba._window_eval(win.poses + acc * 0, win.points, win, with_jac=True)
        return acc + r[0, 0, 0] * 1e-20

    return jax.jit(lambda: jax.lax.fori_loop(0, k, body, jnp.float32(0.0)))


t1 = timeit(rep_eval(1), n=5)
t11 = timeit(rep_eval(11), n=5)
print(f"window_eval amortized: {(t11 - t1) / 10:7.2f} ms/step")


def rep_cost(k):
    def body(i, acc):
        c = ba._window_cost(win.poses + acc * 0, win.points, win, True, win.valid.astype(jnp.float32))
        return acc + c * 1e-20

    return jax.jit(lambda: jax.lax.fori_loop(0, k, body, jnp.float32(0.0)))


t1 = timeit(rep_cost(1), n=5)
t11 = timeit(rep_cost(11), n=5)
print(f"window_cost amortized: {(t11 - t1) / 10:7.2f} ms/step")


# ---- schur_step internals, amortized ----
C_, N_ = wgt.shape
P_ = win.points.shape[0]
lam = jnp.float32(1e-4)


def partA(eps):
    Wc = Jc * (wgt + eps)[..., None, None]
    Hcc = jnp.einsum("cnia,cnib->cab", Jc, Wc)
    gc = jnp.einsum("cnia,cni->ca", Wc, r)
    Bo = jnp.einsum("cnia,cnib->cnab", Wc, Jp)
    Wp = Jp * (wgt + eps)[..., None, None]
    Hpp_o = jnp.einsum("cnia,cnib->cnab", Jp, Wp)
    gp_o = jnp.einsum("cnia,cni->cna", Wp, r)
    G = jnp.concatenate([Bo.reshape(C_, N_, 18), Hpp_o.reshape(C_, N_, 9), gp_o], axis=-1)
    return G, Hcc, gc


G0, Hcc0, gc0 = jax.jit(lambda: partA(0.0))()
slot_c = jnp.minimum(slot_of, N_ - 1)
obs_ok = (slot_of < N_).astype(jnp.float32)[..., None]
cam_iota = jax.lax.broadcasted_iota(jnp.int32, slot_c.shape, 1)


def partB(G):
    return G[cam_iota, slot_c] * obs_ok


Gp0 = jax.jit(partB)(G0)


def partC(Gp, Hcc):
    B = Gp[..., :18].reshape(P_, C_, 6, 3)
    Hpp = jnp.sum(Gp[..., 18:27], axis=1).reshape(P_, 3, 3)
    gp = jnp.sum(Gp[..., 27:30], axis=1)
    eye6 = jnp.eye(6)
    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None] * eye6
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6)[..., None] * jnp.eye(3)
    Hpp_inv = ba._inv3x3(Hpp_d)
    U = jnp.einsum("pcax,pxy->pcay", B, Hpp_inv)
    U2 = U.transpose(1, 2, 0, 3).reshape(C_ * 6, P_ * 3)
    B2 = B.transpose(1, 2, 0, 3).reshape(C_ * 6, P_ * 3)
    S = -jnp.dot(U2, B2.T, preferred_element_type=jnp.float32)
    diag_idx = jnp.arange(C_)
    S = S.reshape(C_, 6, C_, 6).at[diag_idx, :, diag_idx, :].add(Hcc_d).reshape(C_ * 6, C_ * 6)
    free6 = jnp.repeat(~win.cam_fixed, 6)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = -(gc0 - jnp.einsum("pcay,py->ca", U, gp))
    rhs = rhs * (~win.cam_fixed)[:, None]
    return S, rhs, Hpp_inv, B, gp


S0, rhs0, Hppi0, B0, gp0 = jax.jit(partC)(Gp0, Hcc0)


def amort(name, fn, carry0):
    def rep(k):
        def body(i, acc):
            out = fn(acc)
            return out

        return jax.jit(lambda: jax.lax.fori_loop(0, k, body, carry0))

    t1 = timeit(rep(1), n=5)
    t11 = timeit(rep(11), n=5)
    print(f"{name:22s} {(t11 - t1) / 10:7.3f} ms/step")


amort("A: G einsums", lambda acc: partA(acc)[0][0, 0, 0] * 1e-20, jnp.float32(0))
amort("B: gather Gp", lambda acc: partB(G0 + acc)[0, 0, 0] * 1e-20, jnp.float32(0))
amort("C: S build", lambda acc: partC(Gp0 + acc, Hcc0)[0][0, 0] * 1e-20, jnp.float32(0))
amort("D: spd CG48", lambda acc: ba._spd_solve(S0, rhs0.reshape(-1) + acc)[0] * 1e-20, jnp.float32(0))


def partE(eps):
    hpc_dx = jnp.einsum("pcax,ca->px", B0, rhs0 + eps)
    dx_pt = -jnp.einsum("pab,pb->pa", Hppi0, gp0 + hpc_dx)
    return dx_pt[0, 0] * 1e-20


amort("E: backsub", partE, jnp.float32(0))

import jax.scipy.linalg as jsl
amort(
    "D': cholesky",
    lambda acc: jsl.cho_solve(jsl.cho_factor(S0), rhs0.reshape(-1) + acc)[0] * 1e-20,
    jnp.float32(0),
)


# ---- one full lm_iter amortized ----
def one_iter(win, lam):
    robust = True
    inlier0 = win.valid.astype(jnp.float32)
    r, Jc, Jp, _ = ba._window_eval(win.poses, win.points, win, with_jac=True)
    chi2 = ba._window_chi2(r, win)
    w = win.inv_sigma2 * ba._window_huber(win, chi2, jnp.asarray(robust)) * win.valid
    cost0 = jnp.sum(chi2 * ba._window_huber(win, chi2, robust) * win.valid)
    Jc_f = Jc * (~win.cam_fixed)[:, None, None, None].astype(Jc.dtype)
    dx_cam, dx_pt = ba._window_schur_step(win, slot_of, r, Jc_f, Jp, w, lam)
    from orb_slam2v2_1_tpu.ops import lie
    new_poses = lie.se3_exp(dx_cam) @ win.poses
    new_points = win.points + dx_pt
    cost1 = ba._window_cost(new_poses, new_points, win, robust, inlier0)
    accept = cost1 < cost0
    win = win._replace(
        poses=jnp.where(accept, new_poses, win.poses),
        points=jnp.where(accept, new_points, win.points),
    )
    lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6)
    return win, lam


def rep_full(k):
    def body(i, st):
        w, l = st
        return one_iter(w, l)

    return jax.jit(lambda: jax.lax.fori_loop(0, k, body, (win, jnp.float32(1e-4)))[1])


t1 = timeit(rep_full(1), n=5)
t11 = timeit(rep_full(11), n=5)
print(f"full lm_iter amortized: {(t11 - t1) / 10:7.3f} ms/step")
