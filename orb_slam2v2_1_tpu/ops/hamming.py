"""Hamming distance over packed 256-bit ORB descriptors.

Replaces `ORBmatcher::DescriptorDistance` (reference src/ORBmatcher.cc:1649-1666,
the Stanford popcount bit-hack). Two formulations:

* `distance_packed` — XOR + popcount on (.., 8) uint32, exact, for
  small/irregular comparisons.
* `distance_matrix` — all-pairs distances as ONE MXU matmul on +-1 bf16
  descriptors: dot(a, b) = 256 - 2*hamming, so
  hamming = (256 - a @ b^T) / 2. f32 accumulation keeps every value exact
  (integers <= 256). This is the hot path for SearchByProjection /
  SearchByBoW / SearchForTriangulation analogs: a full 1024x1024 frame-pair
  costs one 1024x256x1024 matmul — microseconds on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def popcount32(x: jax.Array) -> jax.Array:
    """Per-element popcount of uint32 (SWAR bit-hack, same algorithm the
    reference cites from Stanford bithacks)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def distance_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamming distance between packed descriptors, broadcasting.

    a: (..., 8) uint32, b: (..., 8) uint32 -> (...,) int32 in [0, 256].
    """
    return jnp.sum(popcount32(jnp.bitwise_xor(a, b)), axis=-1)


def distance_matrix(a_pm1: jax.Array, b_pm1: jax.Array) -> jax.Array:
    """All-pairs Hamming via MXU matmul.

    a_pm1: (N, 256) bf16 in {-1,+1}; b_pm1: (M, 256) -> (N, M) int32.
    """
    dots = jnp.dot(
        a_pm1, b_pm1.T, preferred_element_type=jnp.float32
    )  # exact integers in [-256, 256]
    return ((256.0 - dots) * 0.5).astype(jnp.int32)


def unpack_pm1(packed: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) bf16 +-1 (for descriptors loaded from disk)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)  # (N, 8, 32)
    return (bits.reshape(*packed.shape[:-1], 256).astype(jnp.bfloat16) * 2 - 1)
