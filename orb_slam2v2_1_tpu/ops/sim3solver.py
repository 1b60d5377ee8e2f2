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
    # Re-evaluate refit inliers.
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
