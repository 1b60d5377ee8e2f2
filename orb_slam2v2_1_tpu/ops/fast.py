"""FAST-9/16 corner scoring + spread-constrained keypoint selection.

TPU-native replacement for the reference's per-cell OpenCV `cv::FAST` with
20->7 threshold fallback (src/ORBextractor.cc:765-853) and the quad-tree
keypoint distribution `DistributeOctTree` (src/ORBextractor.cc:539-763).

Design: instead of branchy per-cell detection + recursive quad-tree culling,
the whole level is scored in one vectorized pass (16 shifted images, circular
min/max bit-trickery on the VPU), non-max suppressed with a 3x3 max-pool,
then distributed by keeping the best corner of each `cell x cell` tile and
taking the strongest `n` tiles. Same *behavior* (<= n well-spread corners,
strongest survive, weak-threshold corners only fill otherwise-empty space)
with fully static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, in circular order: (dy, dx).
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def fast_score(img: jax.Array) -> jax.Array:
    """OpenCV-style FAST-9/16 corner score per pixel: the largest margin `t`
    such that 9 contiguous circle pixels are all brighter than p+t (or all
    darker than p-t). Zero where not a corner at any threshold.

    (H, W) f32 -> (H, W) f32.
    """
    h, w = img.shape
    p = jnp.pad(img, 3, mode="edge")
    # d[k] = circle_k - center, stacked (16, H, W).
    d = jnp.stack([p[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for dy, dx in _CIRCLE]) - img

    def min9(x):
        # Min over each window of 9 consecutive entries (circular) along axis 0.
        w2 = jnp.minimum(x, jnp.roll(x, -1, 0))
        w4 = jnp.minimum(w2, jnp.roll(w2, -2, 0))
        w8 = jnp.minimum(w4, jnp.roll(w4, -4, 0))
        w9 = jnp.minimum(w8, jnp.roll(x, -8, 0))
        return w9

    bright = jnp.max(min9(d), axis=0)  # > t  => bright corner with margin
    dark = jnp.max(min9(-d), axis=0)
    return jnp.maximum(jnp.maximum(bright, dark), 0.0)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-max suppression: keep score only at local maxima."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def suppressed_score(img: jax.Array) -> jax.Array:
    """`nms3(fast_score(img))`, fused into one Pallas kernel on TPU
    (ops/pallas_kernels.py) — the values agree away from the discarded
    extraction border."""
    from . import pallas_kernels

    if pallas_kernels.enabled():
        return pallas_kernels.fast_score_nms(img)
    return nms3(fast_score(img))


@partial(
    jax.jit,
    static_argnames=("n", "cell", "border", "threshold", "min_threshold", "suppress"),
)
def select_keypoints(
    score: jax.Array,
    n: int,
    cell: int = 16,
    border: int = 19,
    threshold: float = 20.0,
    min_threshold: float = 7.0,
    suppress: bool = True,
):
    """Pick <= n spread-out corners: best corner per cell, strongest cells win.

    Returns (yx (n, 2) int32, response (n,) f32, valid (n,) bool).

    Corners with score >= `threshold` always outrank weak corners
    (min_threshold <= score < threshold), which only fill empty cells —
    mirroring the reference's 20 -> 7 fallback (src/ORBextractor.cc:809-816).
    The border mirrors EDGE_THRESHOLD=19 (src/ORBextractor.cc:1043-1082).
    """
    h, w = score.shape
    s = nms3(score) if suppress else score
    # Zero out the border and sub-minimum scores.
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_border = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    s = jnp.where(in_border & (s >= min_threshold), s, 0.0)
    # Rank boost: strong corners sort strictly above all weak corners.
    rank = jnp.where(s >= threshold, s + 1e4, s)
    rank = jnp.where(s > 0.0, rank, 0.0)

    # Pad to cell multiples, then per-cell argmax.
    ph = -h % cell
    pw = -w % cell
    rp = jnp.pad(rank, ((0, ph), (0, pw)))
    ch, cw = rp.shape[0] // cell, rp.shape[1] // cell
    tiles = rp.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(ch, cw, cell * cell)
    cell_best = jnp.max(tiles, axis=-1)  # (ch, cw)
    cell_arg = jnp.argmax(tiles, axis=-1)  # (ch, cw) flat in-cell index

    # Strongest n cells (pad if the grid has fewer cells than requested).
    flat = cell_best.reshape(-1)
    if flat.shape[0] < n:
        flat = jnp.pad(flat, (0, n - flat.shape[0]))
    top_vals, top_idx = jax.lax.top_k(flat, n)
    cy = top_idx // cw
    cx = top_idx % cw
    iy = cell_arg.reshape(-1)[top_idx] // cell
    ix = cell_arg.reshape(-1)[top_idx] % cell
    yx = jnp.stack([cy * cell + iy, cx * cell + ix], axis=-1).astype(jnp.int32)
    valid = top_vals > 0.0
    resp = jnp.where(top_vals >= 1e4, top_vals - 1e4, top_vals)
    return yx, resp, valid


def level_feature_counts(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Per-level keypoint budget, geometric in 1/scale — matches
    `mnFeaturesPerLevel` (src/ORBextractor.cc:52-68)."""
    factor = 1.0 / scale
    total = (1.0 - factor**n_levels) / (1.0 - factor)
    base = n_features / total
    counts = [int(round(base * factor**l)) for l in range(n_levels - 1)]
    counts.append(max(n_features - sum(counts), 0))
    return counts
