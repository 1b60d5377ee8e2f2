"""Batched Horn closed-form Sim(3) estimation + RANSAC.

Replaces the reference `Sim3Solver` (src/Sim3Solver.cc): Horn's quaternion
absolute-orientation (`ComputeSim3`, :226-338) run as N_HYP vmapped
hypotheses of 3 correspondences each, with the same mutual reprojection
inlier check (`CheckInliers`, :340-367). Scale is fixed to 1 for
stereo/RGB-D (mbFixScale, src/LoopClosing.cc:284).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

N_HYP = 256


class Sim3Result(NamedTuple):
    success: jax.Array
    S12: jax.Array  # (4,4) Sim3 mapping cam2 coords -> cam1 coords
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array


def horn_sim3(p1: jax.Array, p2: jax.Array, fix_scale: bool) -> jax.Array:
    """Closed-form Sim3 from matched 3-D sets (S,3),(S,3): p1 ~ S12 * p2."""
    c1 = jnp.mean(p1, axis=0)
    c2 = jnp.mean(p2, axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1  # note: maps 2 -> 1
    # Horn's 4x4 N matrix.
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[:, -1]  # (w, x, y, z) for max eigenvalue
    R = lie.quat_to_rot(jnp.stack([q[1], q[2], q[3], q[0]]))
    # Scale (symmetric form) unless fixed.
    num = jnp.sum((q2 @ R.T) * q1)
    den = jnp.sum(q2 * q2)
    s = jnp.where(fix_scale, 1.0, num / jnp.maximum(den, 1e-12))
    t = c1 - s * (R @ c2)
    return lie.make_sim3(R, t, s)


def _project(pc, K):
    z = jnp.maximum(pc[:, 2], 1e-6)
    return jnp.stack([K[0] * pc[:, 0] / z + K[2], K[1] * pc[:, 1] / z + K[3]], -1)


@partial(jax.jit, static_argnames=("fix_scale",))
def sim3_ransac(
    p1_cam: jax.Array,  # (N,3) matched points in camera-1 frame
    p2_cam: jax.Array,  # (N,3) matched points in camera-2 frame
    uv1: jax.Array,  # (N,2) observed pixels in image 1
    uv2: jax.Array,  # (N,2) observed pixels in image 2
    sigma2_1: jax.Array,  # (N,) level sigma^2 in image 1
    sigma2_2: jax.Array,  # (N,)
    valid: jax.Array,
    K: jax.Array,
    key: jax.Array,
    fix_scale: bool = True,
) -> Sim3Result:
    """Reference thresholds: chi2 9.210 (2 dof, 99%) on both reprojections
    (src/Sim3Solver.cc:89-92,340-367)."""
    g = jax.random.gumbel(key, (N_HYP, valid.shape[0]))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, sets = jax.lax.top_k(g, 3)

    def hyp(idx):
        S12 = horn_sim3(p1_cam[idx], p2_cam[idx], fix_scale)
        S21 = lie.sim3_inverse(S12)
        e1 = _project((p2_cam @ S12[:3, :3].T) + S12[:3, 3], K) - uv1
        e2 = _project((p1_cam @ S21[:3, :3].T) + S21[:3, 3], K) - uv2
        c1 = jnp.sum(e1 * e1, -1) / sigma2_1
        c2 = jnp.sum(e2 * e2, -1) / sigma2_2
        inl = valid & (c1 < 9.210) & (c2 < 9.210)
        return jnp.sum(inl.astype(jnp.int32)), S12, inl

    scores, Ss, inls = jax.vmap(hyp)(sets)
    best = jnp.argmax(scores)
    n = scores[best]
    # Refit on the consensus set (LO step) with masked Horn.
    w = inls[best].astype(jnp.float32)

    def weighted_horn():
        ww = w / jnp.maximum(jnp.sum(w), 1e-9)
        c1 = jnp.sum(p1_cam * ww[:, None], 0)
        c2 = jnp.sum(p2_cam * ww[:, None], 0)
        q1 = (p1_cam - c1) * w[:, None]
        q2 = (p2_cam - c2) * w[:, None]
        # Reuse horn via stacked masked points: approximate by weighting.
        M = q2.T @ q1
        Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
        Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
        Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
        Nm = jnp.array(
            [
                [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
                [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
                [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
                [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
            ]
        )
        _, evecs = jnp.linalg.eigh(Nm)
        q = evecs[:, -1]
        R = lie.quat_to_rot(jnp.stack([q[1], q[2], q[3], q[0]]))
        num = jnp.sum(((p2_cam - c2) @ R.T) * (p1_cam - c1) * w[:, None])
        den = jnp.sum((p2_cam - c2) ** 2 * w[:, None])
        s = jnp.where(fix_scale, 1.0, num / jnp.maximum(den, 1e-12))
        t = c1 - s * (R @ c2)
        return lie.make_sim3(R, t, s)

    S_ref = weighted_horn()
    # Re-evaluate refit inliers (continues below).
    S21r = lie.sim3_inverse(S_ref)
    e1 = _project((p2_cam @ S_ref[:3, :3].T) + S_ref[:3, 3], K) - uv1
    e2 = _project((p1_cam @ S21r[:3, :3].T) + S21r[:3, 3], K) - uv2
    inl_r = valid & (jnp.sum(e1 * e1, -1) / sigma2_1 < 9.210) & (
        jnp.sum(e2 * e2, -1) / sigma2_2 < 9.210
    )
    n_r = jnp.sum(inl_r.astype(jnp.int32))
    better = n_r >= n
    return Sim3Result(
        success=jnp.maximum(n, n_r) >= 20,  # reference accepts >=20 (src/LoopClosing.cc:339)
        S12=jnp.where(better, S_ref, Ss[best]),
        inliers=jnp.where(better, inl_r, inls[best]),
        n_inliers=jnp.maximum(n, n_r),
    )


# ---------------------------------------------------------------------------
# Sim3 refinement (Optimizer::OptimizeSim3 analog)
# ---------------------------------------------------------------------------

CHI2_SIM3 = 9.210  # 2-dof 99% gate, both directions (src/Optimizer.cc:1124-1133)


@partial(jax.jit, static_argnames=("fix_scale", "iters"))
def optimize_sim3(
    p1_cam: jax.Array,  # (N,3) matched points in camera-1 frame
    p2_cam: jax.Array,  # (N,3) matched points in camera-2 frame
    uv1: jax.Array,  # (N,2) observed pixels in image 1
    uv2: jax.Array,  # (N,2) observed pixels in image 2
    inv_sigma2_1: jax.Array,  # (N,)
    inv_sigma2_2: jax.Array,  # (N,)
    valid: jax.Array,  # (N,) bool
    S12_0: jax.Array,  # (4,4) initial Sim3 (cam2 -> cam1)
    K: jax.Array,
    fix_scale: bool = True,
    iters: int = 10,
):
    """LM refinement of a relative Sim3 with BOTH-direction reprojection
    edges (Optimizer::OptimizeSim3, reference src/Optimizer.cc:1051-1249):
    5 robust iterations, chi2 > 9.21 outlier removal (either direction
    kills the pair, :1180-1199), then `iters` more plain iterations.
    Jacobians via jacfwd of the closed-form residual in the 7-dof tangent
    (scale row frozen when fix_scale). Returns (S12, inlier_mask, n_inliers).
    """

    def residuals(xi, S0):
        S12 = lie.sim3_exp(xi) @ S0
        S21 = lie.sim3_inverse(S12)
        e1 = _project((p2_cam @ S12[:3, :3].T) + S12[:3, 3], K) - uv1
        e2 = _project((p1_cam @ S21[:3, :3].T) + S21[:3, 3], K) - uv2
        return jnp.concatenate([e1, e2], axis=-1)  # (N,4)

    zero = jnp.zeros(7)
    jac_fn = jax.jacfwd(residuals, argnums=0)

    def chi2_pair(r):
        c1 = jnp.sum(r[:, :2] ** 2, -1) * inv_sigma2_1
        c2 = jnp.sum(r[:, 2:] ** 2, -1) * inv_sigma2_2
        return c1, c2

    def cost_of(S, inlier, robust):
        r = residuals(zero, S)
        c1, c2 = chi2_pair(r)

        def hub(c):
            return jnp.where(
                robust & (c > CHI2_SIM3),
                2.0 * jnp.sqrt(CHI2_SIM3 * jnp.maximum(c, 1e-12)) - CHI2_SIM3,
                c,
            )

        return jnp.sum((hub(c1) + hub(c2)) * inlier)

    def lm_phase(S12, inlier, robust, n_it):
        def body(i, carry):
            S12, lam = carry
            r = residuals(zero, S12)  # (N,4)
            J = jac_fn(zero, S12)  # (N,4,7)
            if fix_scale:
                J = J.at[..., 6].set(0.0)
            c1, c2 = chi2_pair(r)
            hw1 = jnp.where(
                robust & (c1 > CHI2_SIM3),
                jnp.sqrt(CHI2_SIM3 / jnp.maximum(c1, 1e-12)),
                1.0,
            )
            hw2 = jnp.where(
                robust & (c2 > CHI2_SIM3),
                jnp.sqrt(CHI2_SIM3 / jnp.maximum(c2, 1e-12)),
                1.0,
            )
            w = jnp.stack(
                [inv_sigma2_1 * hw1] * 2 + [inv_sigma2_2 * hw2] * 2, axis=-1
            ) * inlier[:, None]  # (N,4)
            H = jnp.einsum("nia,ni,nib->ab", J, w, J)
            g = jnp.einsum("nia,ni,ni->a", J, w, r)
            Hd = H + (lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7))
            if fix_scale:
                Hd = Hd.at[6, 6].set(1.0)
            dx = -jnp.linalg.solve(Hd, g)
            if fix_scale:
                dx = dx.at[6].set(0.0)
            cand = lie.sim3_exp(dx) @ S12
            accept = cost_of(cand, inlier, robust) < cost_of(S12, inlier, robust)
            S12 = jnp.where(accept, cand, S12)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6)
            return (S12, lam)

        S12, _ = jax.lax.fori_loop(0, n_it, body, (S12, jnp.float32(1e-4)))
        return S12

    inlier0 = valid.astype(jnp.float32)
    S12 = lm_phase(S12_0, inlier0, jnp.asarray(True), 5)
    # Mid-run outlier removal: either direction over the gate kills the pair.
    c1, c2 = chi2_pair(residuals(zero, S12))
    inlier = valid & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3)
    S12 = lm_phase(S12, inlier.astype(jnp.float32), jnp.asarray(False), iters)
    c1, c2 = chi2_pair(residuals(zero, S12))
    inlier = valid & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3)
    return S12, inlier, jnp.sum(inlier.astype(jnp.int32))
