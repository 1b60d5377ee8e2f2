"""Batched two-view triangulation (DLT, closed-form normal equations).

Replaces `Initializer::Triangulate` (reference src/Initializer.cc:734-747)
and the SVD triangulation inside `LocalMapping::CreateNewMapPoints`
(src/LocalMapping.cc:326-439). The reference solves the homogeneous 4x4
system by SVD; batched tiny SVDs are an iterative (Jacobi) latency sink on
TPU, so we solve the equivalent *inhomogeneous* system A X = -c (fixing
w = 1) through closed-form 3x3 normal equations — pure VPU arithmetic, no
iteration. Points near infinity (w ~ 0) come out ill-conditioned and are
rejected by the callers' depth/reprojection audits, exactly as the SVD
solution would have been.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection_matrix(Tcw: jax.Array, K: jax.Array) -> jax.Array:
    """(..., 4, 4) pose + (4,) intrinsics -> (..., 3, 4) P = K [R|t]."""
    Km = jnp.array(
        [[K[0], 0.0, K[2]], [0.0, K[1], K[3]], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    return Km @ Tcw[..., :3, :4]


def _solve3x3(H: jax.Array, b: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 solve via adjugate (H x = b)."""
    a00, a01, a02 = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    a10, a11, a12 = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    a20, a21, a22 = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    idet = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    x = jnp.stack(
        [
            c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2],
            c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2],
            c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2],
        ],
        axis=-1,
    )
    return x * idet[..., None]


def triangulate(P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """DLT triangulation.

    P1, P2: (3, 4) or (N, 3, 4) projection matrices; x1, x2: (N, 2) pixels.
    Returns (N, 3) world points (finite everywhere; degenerate rays produce
    large-magnitude garbage the callers' audits reject).
    """
    P1 = jnp.broadcast_to(P1, x1.shape[:-1] + (3, 4))
    P2 = jnp.broadcast_to(P2, x2.shape[:-1] + (3, 4))
    A = jnp.stack(
        [
            x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # (N, 4, 4) rows: [coeffs | constant] against (X, 1)
    M = A[..., :3]  # (N, 4, 3)
    c = A[..., 3]  # (N, 4)
    # Row-normalize for conditioning (the pixel-scale rows otherwise swamp
    # the normal equations).
    nrm = jnp.maximum(jnp.linalg.norm(M, axis=-1, keepdims=True), 1e-12)
    M = M / nrm
    c = c / nrm[..., 0]
    H = jnp.einsum("...ri,...rj->...ij", M, M)  # (N, 3, 3)
    b = -jnp.einsum("...ri,...r->...i", M, c)  # (N, 3)
    return _solve3x3(H, b)
