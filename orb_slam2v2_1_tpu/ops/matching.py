"""Feature matching: masked Hamming-matrix searches + rotation consistency.

TPU-native replacement for `ORBmatcher` (reference src/ORBmatcher.cc). Where
the reference iterates keypoints and walks a 64x48 occupancy grid
(`Frame::GetFeaturesInArea`, src/Frame.cc:342-395), every search here is one
MXU Hamming matrix (Q x N) combined with elementwise masks for the spatial
window / scale window / threshold / ratio tests — the grid is unnecessary
when the full distance matrix costs microseconds.

Thresholds follow the reference exactly: TH_HIGH=100, TH_LOW=50,
HISTO_LENGTH=30 rotation bins, 0.9/0.8/0.75/0.6 NN ratios per search type
(src/ORBmatcher.cc:37-39 and each Search* overload).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30

_BIG = jnp.int32(1 << 20)


class Matches(NamedTuple):
    """Per-query match result (fixed shape Q)."""

    idx: jax.Array  # (Q,) int32 — matched target index (undefined if !ok)
    dist: jax.Array  # (Q,) int32 — Hamming distance
    ok: jax.Array  # (Q,) bool


def best_two(D: jax.Array, mask: jax.Array):
    """Row-wise best and second-best over a masked distance matrix.

    D: (Q, N) int32; mask: (Q, N) bool. Returns (best_idx, best, second).
    """
    Dm = jnp.where(mask, D, _BIG)
    best = jnp.min(Dm, axis=1)
    best_idx = jnp.argmin(Dm, axis=1)
    D2 = Dm.at[jnp.arange(D.shape[0]), best_idx].set(_BIG)
    second = jnp.min(D2, axis=1)
    return best_idx.astype(jnp.int32), best, second


def window_mask(qxy: jax.Array, txy: jax.Array, radius: jax.Array) -> jax.Array:
    """(Q, N) bool: target keypoint within +-radius box of the query's
    predicted position. radius broadcasts (Q,) or scalar — the reference
    scales the window by octave (`th*scaleFactor^level`)."""
    dx = jnp.abs(qxy[:, None, 0] - txy[None, :, 0])
    dy = jnp.abs(qxy[:, None, 1] - txy[None, :, 1])
    r = jnp.broadcast_to(jnp.asarray(radius), (qxy.shape[0],))[:, None]
    return (dx <= r) & (dy <= r)


def level_mask(pred_level: jax.Array, t_level: jax.Array, lo: int = -1, hi: int = 1):
    """(Q, N) bool: target octave within [pred+lo, pred+hi] (the reference's
    scale-prediction window, e.g. src/ORBmatcher.cc:90-98)."""
    d = t_level[None, :] - pred_level[:, None]
    return (d >= lo) & (d <= hi)


def rotation_consistency(dangle: jax.Array, ok: jax.Array) -> jax.Array:
    """Keep only matches whose angle delta falls in the 3 most popular of 30
    bins (`ORBmatcher::ComputeThreeMaxima`, src/ORBmatcher.cc:1601-1646).

    dangle: (Q,) radians (query angle - target angle); ok: (Q,) bool.
    """
    deg = jnp.degrees(dangle) % 360.0
    bins = jnp.clip((deg * (HISTO_LENGTH / 360.0)).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    hist = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bins].add(ok.astype(jnp.int32))
    vals, top_bins = jax.lax.top_k(hist, 3)
    # Reference drops bins 2/3 if below 0.1x the max bin.
    keep = jnp.array([True, True, True]) & (vals >= 0.1 * vals[0]) & (vals > 0)
    good_bins = jnp.zeros(HISTO_LENGTH, bool).at[top_bins].max(keep)
    return ok & good_bins[bins]


def resolve_duplicates(idx: jax.Array, dist: jax.Array, ok: jax.Array, n_targets: int):
    """One-to-one enforcement with a static target capacity."""
    tgt = jnp.where(ok, idx, n_targets)  # park invalid in a spare slot
    best_per_tgt = (
        jnp.full((n_targets + 1,), _BIG).at[tgt].min(dist)
    )
    winner = ok & (dist <= best_per_tgt[tgt])
    # Break exact-distance ties by query order: keep the first.
    qidx = jnp.arange(idx.shape[0], dtype=jnp.int32)
    first_q = (
        jnp.full((n_targets + 1,), 1 << 30, dtype=jnp.int32)
        .at[jnp.where(winner, tgt, n_targets)]
        .min(qidx)
    )
    winner = winner & (first_q[tgt] == qidx)
    return Matches(idx=idx, dist=dist, ok=winner)


@jax.jit
def match_nn(
    q_desc: jax.Array,  # (Q, 256) bf16 +-1
    t_desc: jax.Array,  # (N, 256)
    mask: jax.Array,  # (Q, N) bool extra constraints (window/level/valid)
    max_dist: int = TH_LOW,
    nn_ratio: float = 1.0,
) -> Matches:
    """Generic masked nearest-neighbour with Lowe ratio."""
    D = hamming.distance_matrix(q_desc, t_desc)
    best_idx, best, second = best_two(D, mask)
    ok = (best <= max_dist) & (best.astype(jnp.float32) <= nn_ratio * second.astype(jnp.float32))
    return Matches(idx=best_idx, dist=best, ok=ok)


def match_projection(
    q_desc: jax.Array,
    q_xy_pred: jax.Array,  # (Q, 2) predicted pixel positions
    q_level_pred: jax.Array,  # (Q,) predicted octave
    q_valid: jax.Array,
    t_desc: jax.Array,
    t_xy: jax.Array,
    t_level: jax.Array,
    t_valid: jax.Array,
    radius: jax.Array,  # (Q,) or scalar pixels (already octave-scaled)
    max_dist: int = TH_HIGH,
    nn_ratio: float = 0.9,
    level_lo: int = -1,
    level_hi: int = 1,
) -> Matches:
    """SearchByProjection analog (map points -> frame keypoints),
    reference src/ORBmatcher.cc:45-137 and :1330-1472."""
    from . import pallas_kernels

    if pallas_kernels.match_enabled():
        # Fused Pallas path: distance + window mask + best-two reduction in
        # one kernel — nothing (Q, N)-shaped touches HBM. Opt-in: see
        # pallas_kernels.match_enabled() for why XLA is the default here.
        best_idx, best, second = pallas_kernels.masked_best_two(
            q_desc, q_xy_pred, q_level_pred, q_valid, radius,
            t_desc, t_xy, t_level, t_valid, level_lo, level_hi,
        )
        ok = (best <= max_dist) & (
            best.astype(jnp.float32) <= nn_ratio * second.astype(jnp.float32)
        )
        return resolve_duplicates(best_idx, best, ok, t_desc.shape[0])

    mask = (
        window_mask(q_xy_pred, t_xy, radius)
        & level_mask(q_level_pred, t_level, level_lo, level_hi)
        & q_valid[:, None]
        & t_valid[None, :]
    )
    m = match_nn(q_desc, t_desc, mask, max_dist, nn_ratio)
    return resolve_duplicates(m.idx, m.dist, m.ok, t_desc.shape[0])


def match_mutual(
    a_desc: jax.Array,
    b_desc: jax.Array,
    mask: jax.Array,
    max_dist: int = TH_LOW,
    nn_ratio: float = 0.9,
) -> Matches:
    """Mutual-best NN a->b (used for initialization,
    `SearchForInitialization` src/ORBmatcher.cc:405-520)."""
    D = hamming.distance_matrix(a_desc, b_desc)
    Dm = jnp.where(mask, D, _BIG)
    a_best_idx, a_best, a_second = best_two(D, mask)
    b_best_idx = jnp.argmin(Dm, axis=0)
    mutual = b_best_idx[a_best_idx] == jnp.arange(a_desc.shape[0])
    ok = (
        (a_best <= max_dist)
        & (a_best.astype(jnp.float32) <= nn_ratio * a_second.astype(jnp.float32))
        & mutual
    )
    return Matches(idx=a_best_idx, dist=a_best, ok=ok)
