"""Batched two-view triangulation (DLT/SVD).

Replaces `Initializer::Triangulate` (reference src/Initializer.cc:734-747)
and the SVD triangulation inside `LocalMapping::CreateNewMapPoints`
(src/LocalMapping.cc:326-439). vmapped 4x4 SVDs — thousands per step are
trivial on TPU.
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


def triangulate(P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """DLT triangulation.

    P1, P2: (3, 4) or (N, 3, 4) projection matrices; x1, x2: (N, 2) pixels.
    Returns (N, 3) world points (NaN-free; w=0 guarded).
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
    )  # (N, 4, 4)
    # Null vector of A = last right-singular vector.
    _, _, vt = jnp.linalg.svd(A)
    X = vt[..., 3, :]
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
    return X[..., :3] / w_safe[..., None]
