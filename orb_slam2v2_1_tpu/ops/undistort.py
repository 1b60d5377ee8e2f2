"""Keypoint undistortion (radial-tangential model), batched.

Replaces `Frame::UndistortKeyPoints` (reference src/Frame.cc:419-449,
cv::undistortPoints): fixed-point iteration inverting the Brown-Conrady
forward model with coefficients (k1, k2, p1, p2, k3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distort_normalized(xn: jax.Array, dist: jax.Array) -> jax.Array:
    """Forward model on normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


@jax.jit
def undistort_points(uv: jax.Array, K: jax.Array, dist: jax.Array, iters: int = 8) -> jax.Array:
    """Invert distortion for pixel coords (..., 2) -> undistorted pixels."""
    f = jnp.stack([K[0], K[1]])
    c = jnp.stack([K[2], K[3]])
    xd = (uv - c) / f

    def body(_, xn):
        d = distort_normalized(xn, dist) - xn
        return xd - d

    xn = jax.lax.fori_loop(0, iters, body, xd)
    return xn * f + c
