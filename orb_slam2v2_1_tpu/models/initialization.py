"""Map bootstrap: monocular two-view init and stereo/RGB-D single-frame init.

Replaces `Tracking::MonocularInitialization` + `CreateInitialMapMonocular`
(reference src/Tracking.cc:706-880) and `StereoInitialization`
(src/Tracking.cc:652-704).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie, matching, twoview
from .map_state import MapState, append_keyframe, refresh_covis, update_mp_stats
from .tracking import FrameData


@jax.jit
def match_for_initialization(ref: FrameData, cur: FrameData):
    """SearchForInitialization (src/ORBmatcher.cc:405-520): window 100px
    around the reference keypoint, ratio 0.9, level-0 only, mutual best,
    rotation consistency."""
    mask = (
        matching.window_mask(ref.xy, cur.xy, 100.0)
        & (ref.level == 0)[:, None]
        & (cur.level == 0)[None, :]
        & ref.kp_valid[:, None]
        & cur.kp_valid[None, :]
    )
    m = matching.match_nn(ref.desc_pm1, cur.desc_pm1, mask, max_dist=50, nn_ratio=0.9)
    dang = ref.angle - cur.angle[m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    return matching.resolve_duplicates(m.idx, m.dist, ok, cur.xy.shape[0])


@partial(jax.jit, donate_argnames=("state",))
def create_initial_map_mono(
    state: MapState,
    ref: FrameData,
    cur: FrameData,
    m_idx: jax.Array,  # (N,) ref-slot -> cur-slot
    res: twoview.TwoViewResult,
    K: jax.Array,
):
    """Build the 2-KF initial map with median-depth normalization
    (CreateInitialMapMonocular, src/Tracking.cc:762-880). Returns
    (state, Tcw_cur, kf0, kf1, n_points)."""
    N = ref.xy.shape[0]
    M = state.mp_pos.shape[0]

    good = res.good
    X = res.points  # in ref camera frame == world (ref at identity)

    # Median depth -> scale so median = 1 (src/Tracking.cc:832-856).
    z = jnp.where(good, X[:, 2], jnp.nan)
    med = jnp.nanmedian(z)
    inv_med = 1.0 / jnp.maximum(med, 1e-6)
    X = X * inv_med
    t = res.t * inv_med

    T0 = jnp.eye(4)
    T1 = lie.make_se3(res.R, t)

    # Allocate point slots 0..n-1 (the map is empty at init).
    rank = jnp.cumsum(good.astype(jnp.int32)) - 1
    slot = jnp.where(good, rank, M)
    mp_pos = state.mp_pos.at[slot].set(X, mode="drop")
    mp_valid = state.mp_valid.at[slot].set(True, mode="drop")
    mp_desc = state.mp_desc.at[slot].set(cur.desc[m_idx], mode="drop")
    mp_first = state.mp_first_kf.at[slot].set(0, mode="drop")
    n_new = jnp.sum(good.astype(jnp.int32))

    mp0 = jnp.where(good, rank, -1)
    mp1 = jnp.full(N, -1, jnp.int32).at[jnp.where(good, m_idx, N)].set(
        jnp.where(good, rank, -1), mode="drop"
    )

    state = state._replace(
        mp_pos=mp_pos,
        mp_valid=mp_valid,
        mp_desc=mp_desc,
        mp_first_kf=mp_first,
        n_mp=n_new,
    )
    state, kf0 = append_keyframe(
        state, T0, ref.frame_id, ref.xy, ref.level, ref.angle, ref.desc,
        ref.kp_valid, ref.ur, mp0,
    )
    state, kf1 = append_keyframe(
        state, T1, cur.frame_id, cur.xy, cur.level, cur.angle, cur.desc,
        cur.kp_valid, cur.ur, mp1,
    )
    state = refresh_covis(update_mp_stats(state))
    return state, T1, kf0, kf1, n_new


@partial(jax.jit, donate_argnames=("state",))
def create_initial_map_depth(state: MapState, frame: FrameData, K: jax.Array):
    """Stereo/RGB-D init: every keypoint with depth becomes a map point
    (StereoInitialization, src/Tracking.cc:652-704). Returns
    (state, kf0, n_points)."""
    N = frame.xy.shape[0]
    M = state.mp_pos.shape[0]
    has_depth = frame.kp_valid & (frame.depth > 0)

    # Unproject at identity pose.
    z = jnp.maximum(frame.depth, 1e-6)
    x = (frame.xy[:, 0] - K[2]) * z / K[0]
    y = (frame.xy[:, 1] - K[3]) * z / K[1]
    X = jnp.stack([x, y, z], -1)

    rank = jnp.cumsum(has_depth.astype(jnp.int32)) - 1
    slot = jnp.where(has_depth, rank, M)
    state = state._replace(
        mp_pos=state.mp_pos.at[slot].set(X, mode="drop"),
        mp_valid=state.mp_valid.at[slot].set(True, mode="drop"),
        mp_desc=state.mp_desc.at[slot].set(frame.desc, mode="drop"),
        mp_first_kf=state.mp_first_kf.at[slot].set(0, mode="drop"),
        n_mp=jnp.sum(has_depth.astype(jnp.int32)),
    )
    mp0 = jnp.where(has_depth, rank, -1)
    state, kf0 = append_keyframe(
        state, jnp.eye(4), frame.frame_id, frame.xy, frame.level, frame.angle,
        frame.desc, frame.kp_valid, frame.ur, mp0,
    )
    state = refresh_covis(update_mp_stats(state))
    return state, kf0, state.n_mp
