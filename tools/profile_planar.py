"""Prototype: planar (lane-friendly) window LM iteration vs current one.

Checks numerical agreement of dx against the current _window_schur_step on a
real-ish random window, then times both amortized.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import ba, lie

print("backend:", jax.default_backend())

key = jax.random.key(0)
C, N, P = 32, 1024, 4096

# Build a consistent synthetic window: cameras on an arc looking at points.
k1, k2, k3 = jax.random.split(key, 3)
pts = jax.random.normal(k1, (P, 3)) * jnp.array([2.0, 1.5, 1.0]) + jnp.array([0, 0, 6.0])
angles = jnp.linspace(0, 0.2, C)
poses = []
for i in range(C):
    T = np.eye(4, dtype=np.float32)
    a = float(angles[i])
    T[:3, :3] = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float32,
    )
    T[0, 3] = 0.1 * i
    poses.append(T)
poses = jnp.asarray(np.stack(poses))
Kc = jnp.array([550.0, 550.0, 320.0, 240.0])
bf = jnp.float32(44.0)

pt_idx = jax.random.randint(k2, (C, N), 0, P)
# target = true projection + noise
pw = pts[pt_idx]
pc = jnp.einsum("cij,cnj->cni", poses[:, :3, :3], pw) + poses[:, None, :3, 3]
z = jnp.maximum(pc[..., 2], 1e-6)
u = Kc[0] * pc[..., 0] / z + Kc[2]
v = Kc[1] * pc[..., 1] / z + Kc[3]
ur = u - bf / z
tgt = jnp.stack([u, v, ur], -1) + jax.random.normal(k3, (C, N, 3)) * 0.5
valid = (z > 0.5) & (jax.random.uniform(k3, (C, N)) < 0.8)

win = ba.BAWindow(
    poses=poses,
    points=pts,
    pt_idx=jnp.where(valid, pt_idx, P),
    target=tgt,
    inv_sigma2=jnp.ones((C, N)),
    is_stereo=jnp.ones((C, N), bool),
    valid=valid,
    cam_fixed=jnp.zeros(C, bool).at[0].set(True),
    K=Kc,
    bf=bf,
)
slot_of = jax.jit(ba._window_slot_of)(win)
lam = jnp.float32(1e-4)


# ---------------- current path ----------------
def cur_step(win):
    r, Jc, Jp, _ = ba._window_eval(win.poses, win.points, win, with_jac=True)
    chi2 = ba._window_chi2(r, win)
    w = win.inv_sigma2 * ba._window_huber(win, chi2, jnp.asarray(True)) * win.valid
    Jc_f = Jc * (~win.cam_fixed)[:, None, None, None].astype(Jc.dtype)
    return ba._window_schur_step(win, slot_of, r, Jc_f, Jp, w, lam)


# ---------------- planar path ----------------
def planar_step(win):
    """Same math, planes-only layout."""
    Pn = win.points.shape[0]
    Cn, Nn = win.valid.shape
    fx, fy = win.K[0], win.K[1]

    R = win.poses[:, :3, :3]
    t = win.poses[:, :3, 3]
    pw = win.points[jnp.minimum(win.pt_idx, Pn - 1)]  # (C,N,3)
    pc = jnp.einsum("cij,cnj->cni", R, pw) + t[:, None, :]
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz

    u = fx * x * iz + win.K[2]
    v = fy * y * iz + win.K[3]
    ur = u - win.bf * iz
    st = win.is_stereo.astype(jnp.float32)
    r0 = u - win.target[..., 0]
    r1 = v - win.target[..., 1]
    r2 = (ur - win.target[..., 2]) * st

    chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * win.inv_sigma2
    delta2 = jnp.where(win.is_stereo, ba.CHI2_STEREO, ba.CHI2_MONO)
    hw = jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    w = win.inv_sigma2 * hw * win.valid
    wfree = w * (~win.cam_fixed)[:, None]  # zero fixed-cam J columns via weight? NO:
    # fixed cams must still contribute to Hpp/gp. Handle by zeroing Jc planes.
    free = (~win.cam_fixed)[:, None].astype(jnp.float32)

    # J_pc rows (planes):
    a00 = fx * iz
    a02 = -fx * x * iz2
    a11 = fy * iz
    a12 = -fy * y * iz2
    a20 = a00
    a22 = a02 + win.bf * iz2
    # rows: row0=(a00,0,a02), row1=(0,a11,a12), row2=(a20,0,a22)*st
    # J_pose[i,:3] = J_pc[i]; J_pose[i,3:] = J_pc[i] @ (-hat(pc))
    # -hat(pc) = [[0,z,-y],[-z,0,x],[y,-x,0]]  (note: uses raw pc entries)
    zc = pc[..., 2]
    # row i entries (b0,b1,b2) -> J[i,3]=-b1*zc+b2*y ; J[i,4]=b0*zc-b2*x ; J[i,5]=-b0*y+b1*x
    def rot_cols(b0, b1, b2):
        return (-b1 * zc + b2 * y, b0 * zc - b2 * x, -b0 * y + b1 * x)

    J0 = (a00, jnp.zeros_like(a00), a02) + rot_cols(a00, jnp.zeros_like(a00), a02)
    J1 = (jnp.zeros_like(a11), a11, a12) + rot_cols(jnp.zeros_like(a11), a11, a12)
    J2r = (a20, jnp.zeros_like(a20), a22) + rot_cols(a20, jnp.zeros_like(a20), a22)
    J2 = tuple(p * st for p in J2r)

    # J_point[i] = J_pc[i] @ R  (R per camera, broadcast planes)
    def jp_row(b0, b1, b2):
        return tuple(
            b0 * R[:, None, 0, k] + b1 * R[:, None, 1, k] + b2 * R[:, None, 2, k]
            for k in range(3)
        )

    P0 = jp_row(a00, jnp.zeros_like(a00), a02)
    P1 = jp_row(jnp.zeros_like(a11), a11, a12)
    P2r = jp_row(a20, jnp.zeros_like(a20), a22)
    P2 = tuple(p * st for p in P2r)

    rows_r = (r0, r1, r2)
    Jrows = (J0, J1, J2)
    Prows = (P0, P1, P2)

    # ---- Hcc (C,6,6) and gc (C,6) via stacked matmul over N ----
    # stack (C, 18, N): w-weighted on one side.
    Jstack = jnp.stack([Jrows[i][a] for i in range(3) for a in range(6)], axis=1)  # (C,18,N)
    Jw = Jstack * (w * free)[:, None, :]
    Hfull = jnp.einsum("cxn,cyn->cxy", Jw, Jstack * free[:, None, :])  # (C,18,18)
    Hcc = (
        Hfull.reshape(C, 3, 6, 3, 6)[:, jnp.arange(3), :, jnp.arange(3), :].sum(0)
    )  # (C,6,6)
    rstack = jnp.stack(rows_r, axis=1)  # (C,3,N)
    gfull = jnp.einsum("cxn,cin->cxi", Jw, rstack)  # (C,18,3)
    gc = gfull.reshape(C, 3, 6, 3)[:, jnp.arange(3), :, jnp.arange(3)].sum(0)  # (C,6)

    # ---- G planes: Bo (18), Hpp_o (6 sym), gp_o (3) => 27 planes (C,N) ----
    # Bo[a,b] = w * sum_i Jfree[i,a] * P[i,b]
    JF = [[Jrows[i][a] * free for a in range(6)] for i in range(3)]
    Gplanes = []
    for a in range(6):
        for b in range(3):
            Gplanes.append(w * (JF[0][a] * P0[b] + JF[1][a] * P1[b] + JF[2][a] * P2[b]))
    # Hpp_o symmetric entries (6): (0,0),(0,1),(0,2),(1,1),(1,2),(2,2)
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for (a, b) in sym:
        Gplanes.append(w * (P0[a] * P0[b] + P1[a] * P1[b] + P2[a] * P2[b]))
    for b in range(3):
        Gplanes.append(w * (P0[b] * r0 + P1[b] * r1 + P2[b] * r2))
    G = jnp.stack(Gplanes, axis=-1)  # (C,N,27)

    # ---- gather to point-major ----
    slot_c = jnp.minimum(slot_of, Nn - 1)
    obs_ok = (slot_of < Nn).astype(G.dtype)[..., None]
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, slot_c.shape, 1)
    flat_idx = (cam_iota * Nn + slot_c).reshape(-1)
    Gp = jnp.take(G.reshape(Cn * Nn, 27), flat_idx, axis=0).reshape(Pn, Cn, 27) * obs_ok

    # Hpp planes (P,) and gp planes
    h = [jnp.sum(Gp[..., 18 + i], axis=1) for i in range(6)]  # sym entries
    gp = [jnp.sum(Gp[..., 24 + i], axis=1) for i in range(3)]
    # damped
    h00 = h[0] * (1 + lam) + 1e-6
    h11 = h[3] * (1 + lam) + 1e-6
    h22 = h[5] * (1 + lam) + 1e-6
    h01, h02, h12 = h[1], h[2], h[4]
    # closed-form inverse of symmetric 3x3 (planes)
    cA = h11 * h22 - h12 * h12
    cB = h02 * h12 - h01 * h22
    cC = h01 * h12 - h02 * h11
    det = h00 * cA + h01 * cB + h02 * cC
    idet = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    i00 = cA * idet
    i01 = cB * idet
    i02 = cC * idet
    i11 = (h00 * h22 - h02 * h02) * idet
    i12 = (h01 * h02 - h00 * h12) * idet
    i22 = (h00 * h11 - h01 * h01) * idet

    # Bz (3, P, C6): component x = point-dim; columns (c,a) as c*6+a? — we can
    # slice from Gp: plane (a,b) at index a*3+b -> B_b[:, :, a].
    Bz = jnp.stack(
        [
            Gp[..., [b + 3 * a for a in range(6)]].reshape(Pn, Cn * 6)
            for b in range(3)
        ]
    )  # (3, P, C6) with col = c*6+a  (C-major then a)
    # NOTE: Gp[..., idxlist] gathers components -> (P, C, 6); reshape (P, C6).
    iH = ((i00, i01, i02), (i01, i11, i12), (i02, i12, i22))
    Uz = jnp.stack(
        [
            sum(iH[xx][yy][:, None] * Bz[yy] for yy in range(3))
            for xx in range(3)
        ]
    )  # (3,P,C6)
    S = -jnp.einsum("xpc,xpd->cd", Uz, Bz)
    diag_idx = jnp.arange(Cn)
    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None] * jnp.eye(6)
    S = (
        S.reshape(Cn, 6, Cn, 6)
        .at[diag_idx, :, diag_idx, :]
        .add(Hcc_d)
        .reshape(Cn * 6, Cn * 6)
    )
    free6 = jnp.repeat(~win.cam_fixed, 6)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))

    hig = [sum(iH[xx][yy] * gp[yy] for yy in range(3)) for xx in range(3)]  # (P,) x3
    corr = sum(jnp.einsum("pc,p->c", Bz[xx], hig[xx]) for xx in range(3))
    rhs = -(gc.reshape(-1) - corr)
    rhs = rhs * free6

    dx_cam = ba._spd_solve(S, rhs).reshape(Cn, 6)
    dx_cam = dx_cam * (~win.cam_fixed)[:, None]
    dx_cam = jnp.where(jnp.all(jnp.isfinite(dx_cam)), dx_cam, jnp.zeros_like(dx_cam))

    hpc = [jnp.einsum("pc,c->p", Bz[xx], dx_cam.reshape(-1)) for xx in range(3)]
    dx_pt = jnp.stack(
        [
            -sum(iH[xx][yy] * (gp[yy] + hpc[yy]) for yy in range(3))
            for xx in range(3)
        ],
        axis=-1,
    )
    dx_pt = jnp.where(jnp.all(jnp.isfinite(dx_pt)), dx_pt, jnp.zeros_like(dx_pt))
    has_obs = jnp.any(slot_of < Nn, axis=1)
    dx_pt = dx_pt * has_obs[:, None]
    return dx_cam, dx_pt


cur = jax.jit(cur_step)
pla = jax.jit(planar_step)
dxc0, dxp0 = cur(win)
dxc1, dxp1 = pla(win)
err_c = float(jnp.max(jnp.abs(dxc0 - dxc1)))
err_p = float(jnp.max(jnp.abs(dxp0 - dxp1)))
rel_c = err_c / (float(jnp.max(jnp.abs(dxc0))) + 1e-12)
print(f"dx_cam max abs diff: {err_c:.3e} (rel {rel_c:.3e}); dx_pt: {err_p:.3e}")


def timeit(f, *a, n=5, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def amort(name, step):
    def rep(k):
        def body(i, acc):
            dxc, dxp = step(win._replace(points=win.points + acc * 0))
            return acc + dxc[0, 0] * 1e-20

        return jax.jit(lambda: jax.lax.fori_loop(0, k, body, jnp.float32(0)))

    t1 = timeit(rep(1))
    t11 = timeit(rep(11))
    print(f"{name:18s} {(t11 - t1) / 10:7.3f} ms/step")


amort("current step", cur_step)
amort("planar step", planar_step)
