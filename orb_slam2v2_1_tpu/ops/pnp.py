"""Batched RANSAC absolute-pose (PnP) from 2D-3D correspondences.

Replaces the reference's EPnP + RANSAC `PnPsolver` (src/PnPsolver.cc:165
`iterate`, used for relocalization at src/Tracking.cc:1526-1545). Instead of
EPnP's control-point machinery, each hypothesis solves the 6-point DLT for
the full projective matrix and re-projects it onto SE(3) using the known
intrinsics — linear, branch-free, and trivially vmappable; the RANSAC loop
becomes one batched evaluation of N_HYP hypotheses (SURVEY §7 "RANSAC becomes
batched hypothesis evaluation"). Inlier test matches the reference:
scale-dependent squared reprojection threshold (`CheckInliers`,
src/PnPsolver.cc:308-337).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

N_HYP = 256
SAMPLE = 6


class PnPResult(NamedTuple):
    success: jax.Array  # () bool
    Tcw: jax.Array  # (4,4)
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array  # () i32


def _dlt_pose(pw: jax.Array, uv: jax.Array, K: jax.Array) -> jax.Array:
    """(S,3) world points + (S,2) pixels -> (4,4) Tcw via DLT + SO(3)
    projection. Uses normalized camera coords so K is factored out."""
    xn = (uv[:, 0] - K[2]) / K[0]
    yn = (uv[:, 1] - K[3]) / K[1]
    X, Y, Z = pw[:, 0], pw[:, 1], pw[:, 2]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -xn * X, -xn * Y, -xn * Z, -xn], -1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -yn * X, -yn * Y, -yn * Z, -yn], -1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    # Null vector via eigh of A^T A (12x12) — f32-friendly.
    M = A.T @ A
    _, evecs = jnp.linalg.eigh(M)
    P = evecs[:, 0].reshape(3, 4)
    # Scale/sign: rows of R must be unit; points in front.
    Rraw = P[:, :3]
    scale = jnp.exp(jnp.mean(jnp.log(jnp.maximum(
        jnp.linalg.norm(Rraw, axis=1), 1e-12))))
    P = P / scale
    # Sign: mean depth must be positive.
    depth = pw @ P[2, :3] + P[2, 3]
    P = P * jnp.where(jnp.mean(depth) < 0, -1.0, 1.0)
    R = lie.project_so3(P[:, :3])
    return lie.make_se3(R, P[:, 3])


def _sample_sets(key, valid, n_sets, k):
    g = jax.random.gumbel(key, (n_sets, valid.shape[0]))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


@partial(jax.jit, static_argnames=())
def pnp_ransac(
    pw: jax.Array,  # (N,3) world points
    uv: jax.Array,  # (N,2) pixels
    inv_sigma2: jax.Array,  # (N,) per-obs information (octave-scaled)
    valid: jax.Array,  # (N,) bool
    K: jax.Array,
    key: jax.Array,
    chi2_th: float = 5.991,
) -> PnPResult:
    """Batched-hypothesis RANSAC: N_HYP DLT poses scored at once."""
    sets = _sample_sets(key, valid, N_HYP, SAMPLE)

    def hyp(idx):
        T = _dlt_pose(pw[idx], uv[idx], K)
        pc = (T[:3, :3] @ pw.T).T + T[:3, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = K[0] * pc[:, 0] / z + K[2]
        v = K[1] * pc[:, 1] / z + K[3]
        e2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        inl = valid & (e2 < chi2_th) & (pc[:, 2] > 0)
        return jnp.sum(inl.astype(jnp.int32)), T, inl

    scores, Ts, inls = jax.vmap(hyp)(sets)
    best = jnp.argmax(scores)
    n = scores[best]
    min_inliers = jnp.maximum(10, jnp.int32(0.1 * jnp.sum(valid.astype(jnp.int32))))
    return PnPResult(
        success=n >= min_inliers,
        Tcw=Ts[best],
        inliers=inls[best],
        n_inliers=n,
    )
