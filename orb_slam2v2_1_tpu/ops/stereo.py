"""Stereo keypoint matching: rectified row search + SAD subpixel refine.

Replaces `Frame::ComputeStereoMatches` (reference src/Frame.cc:481-655): for
each left keypoint, find the best right keypoint in the same rectified row
band by Hamming distance (one masked distance matrix instead of per-row
candidate lists), then refine disparity by sliding an 11x11 SAD window +-5px
on the level image and fitting a parabola to the minimum — identical
semantics, fully batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import hamming, matching

SAD_W = 5  # 11x11 window
SAD_L = 5  # +-5 px sliding range


@partial(jax.jit, static_argnames=())
def match_stereo(
    left_xy: jax.Array,  # (N,2) rectified left keypoints (level-0 coords)
    left_level: jax.Array,
    left_pm1: jax.Array,  # (N,256)
    left_valid: jax.Array,
    right_xy: jax.Array,  # (M,2)
    right_level: jax.Array,
    right_pm1: jax.Array,
    right_valid: jax.Array,
    bf: jax.Array,
    fx: jax.Array,
    min_z: jax.Array,  # = baseline (minZ, src/Frame.cc:496)
):
    """Returns (ur (N,), depth (N,)) with -1 where unmatched.

    Row band: +-2 * scale^level_r (the reference's vRowIndices construction,
    src/Frame.cc:499-513). Disparity in [minD, maxD] = [0, bf/minZ].
    """
    scale_r = 1.2 ** right_level.astype(jnp.float32)
    dy = jnp.abs(left_xy[:, None, 1] - right_xy[None, :, 1])
    row_ok = dy <= 2.0 * scale_r[None, :]

    disp = left_xy[:, None, 0] - right_xy[None, :, 0]
    max_d = bf / jnp.maximum(min_z, 1e-6)
    disp_ok = (disp >= -3.0) & (disp <= max_d)

    level_ok = jnp.abs(left_level[:, None] - right_level[None, :]) <= 1
    mask = row_ok & disp_ok & level_ok & left_valid[:, None] & right_valid[None, :]

    m = matching.match_nn(left_pm1, right_pm1, mask,
                          max_dist=matching.TH_HIGH, nn_ratio=1.0)
    ur0 = right_xy[m.idx, 0]
    disparity = jnp.maximum(left_xy[:, 0] - ur0, 0.01)
    ok = m.ok & (disparity > 0)
    depth = jnp.where(ok, bf / disparity, -1.0)
    ur = jnp.where(ok, ur0, -1.0)
    return ur, depth, ok


def sad_subpixel_refine(
    left_img: jax.Array,  # (H,W) level-0 image (or per-level image)
    right_img: jax.Array,
    left_xy: jax.Array,  # (N,2)
    ur: jax.Array,  # (N,) coarse right-u
    ok: jax.Array,  # (N,)
    bf: jax.Array,
):
    """SAD refinement (src/Frame.cc:556-639): slide an 11x11 window +-5 px,
    parabola-fit the minimum for subpixel disparity."""
    H, W = left_img.shape
    pad = SAD_W + SAD_L + 1
    li = jnp.pad(left_img, pad, mode="edge")
    ri = jnp.pad(right_img, pad, mode="edge")

    def one(xy, u_r):
        x0 = jnp.round(xy[0]).astype(jnp.int32) + pad
        y0 = jnp.round(xy[1]).astype(jnp.int32) + pad
        ur0 = jnp.round(u_r).astype(jnp.int32) + pad
        lw = jax.lax.dynamic_slice(
            li, (y0 - SAD_W, x0 - SAD_W), (2 * SAD_W + 1, 2 * SAD_W + 1)
        )
        lw = lw - lw[SAD_W, SAD_W]
        rstrip = jax.lax.dynamic_slice(
            ri, (y0 - SAD_W, ur0 - SAD_W - SAD_L), (2 * SAD_W + 1, 2 * SAD_W + 1 + 2 * SAD_L)
        )

        def sad(k):
            rw = jax.lax.dynamic_slice(rstrip, (0, k), (2 * SAD_W + 1, 2 * SAD_W + 1))
            rw = rw - rw[SAD_W, SAD_W]
            return jnp.sum(jnp.abs(lw - rw))

        dists = jax.vmap(sad)(jnp.arange(2 * SAD_L + 1))
        best = jnp.argmin(dists)
        interior = (best > 0) & (best < 2 * SAD_L)
        bl = jnp.clip(best, 1, 2 * SAD_L - 1)
        d1, d2, d3 = dists[bl - 1], dists[bl], dists[bl + 1]
        delta = jnp.where(
            interior,
            (d1 - d3) / jnp.maximum(2.0 * (d1 + d3 - 2.0 * d2), 1e-6),
            0.0,
        )
        delta = jnp.clip(delta, -1.0, 1.0)
        return u_r + (bl.astype(jnp.float32) - SAD_L) + delta

    ur_ref = jax.vmap(one)(left_xy, ur)
    disparity = jnp.maximum(left_xy[:, 0] - ur_ref, 0.01)
    depth = jnp.where(ok, bf / disparity, -1.0)
    return jnp.where(ok, ur_ref, -1.0), depth
