"""Image pyramid + Gaussian blur primitives.

Replaces `ORBextractor::ComputePyramid` (reference src/ORBextractor.cc:1107-1132,
cv::resize bilinear) and the pre-descriptor `GaussianBlur(7x7, sigma=2)`
(src/ORBextractor.cc:1084-1090). Pure XLA: resize + separable convs fuse well
and stay on the VPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    """Static per-level shapes (computed at trace time)."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale**lvl)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


def build_pyramid(img: jax.Array, n_levels: int, scale: float) -> list[jax.Array]:
    """f32 image (H, W) -> list of n_levels images, each 1/scale smaller.

    Matches the reference's per-level bilinear resize from the previous level
    (src/ORBextractor.cc:1118-1124), which compounds slightly differently from
    resizing the base image directly; we resize from the base for better
    fidelity (this is an improvement, not a bug).
    """
    h, w = img.shape
    out = [img]
    for (lh, lw) in pyramid_shapes(h, w, n_levels, scale)[1:]:
        out.append(jax.image.resize(img, (lh, lw), method="bilinear"))
    return out


def _gauss_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("size",))
def gaussian_blur(img: jax.Array, size: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with edge replication (matches cv::GaussianBlur
    BORDER_REFLECT_101 closely enough for descriptor sampling)."""
    k = _gauss_kernel(size, sigma)
    pad = size // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    # Horizontal then vertical 1-D convolutions. DEFAULT precision: image
    # smoothing needs ~8 bits, and the package-wide HIGHEST default (set for
    # geometry) makes these convs measurably slower on the MXU.
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.DEFAULT,
    )
    x = jax.lax.conv_general_dilated(
        x,
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return x[0, 0]


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """(H, W, 3) uint8/f32 -> (H, W) f32 grayscale (cv::cvtColor BGR weights
    applied in RGB order, matching Tracking::GrabImage* conversion)."""
    img = img.astype(jnp.float32)
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
