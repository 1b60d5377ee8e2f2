"""Frame-rate tracking front end: motion-model tracking + local-map tracking.

TPU-native replacement for the reference `Tracking` class hot path
(src/Tracking.cc:376-649): `TrackWithMotionModel` (:1010-1071),
`TrackLocalMap`/`SearchLocalPoints`/`UpdateLocalKeyFrames` (:1073-1484).
The state machine itself (NOT_INITIALIZED/OK/LOST) lives on the host in
`system.py`; everything here is jitted device code with fixed shapes.

Acceptance thresholds follow the reference: >=10 inliers after motion-model
tracking (src/Tracking.cc:1070), >=30 after local-map tracking
(src/Tracking.cc:1113).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ba, hamming, lie, matching
from ..ops.projection import project
from .map_state import MapState

LOCAL_MP_CAP = 4096  # fixed capacity for the tracked local map
MAX_LOCAL_KFS = 80  # reference caps the local-KF set at 80 (src/Tracking.cc:1430)
SCALE = 1.2
N_LEVELS = 8

# Per-octave measurement information (1/sigma^2), sigma ~ scale^level
# (ORBextractor mvInvLevelSigma2 semantics).
INV_LEVEL_SIGMA2 = jnp.asarray([1.0 / SCALE ** (2 * l) for l in range(N_LEVELS)])


class FrameData(NamedTuple):
    """A tracked frame (fixed N feature slots)."""

    xy: jax.Array  # (N,2) undistorted pixel coords
    level: jax.Array  # (N,) i32
    angle: jax.Array  # (N,) f32
    desc: jax.Array  # (N,8) uint32
    desc_pm1: jax.Array  # (N,256) bf16
    kp_valid: jax.Array  # (N,) bool
    ur: jax.Array  # (N,) f32 stereo right-u (-1 mono)
    depth: jax.Array  # (N,) f32 keypoint depth (-1 unknown)
    pose: jax.Array  # (4,4) Tcw
    mp: jax.Array  # (N,) i32 map-point associations (-1 none)
    frame_id: jax.Array  # () i32


class TrackStats(NamedTuple):
    n_matches: jax.Array  # matches fed to the optimizer
    n_inliers: jax.Array  # inliers after pose optimization


def make_obs_from_frame(frame_xy, frame_ur, frame_level, mp_ids, valid):
    """Build a `ba.Obs` for motion-only optimization from frame slots."""
    n = frame_xy.shape[0]
    is_stereo = frame_ur >= 0
    target = jnp.concatenate([frame_xy, frame_ur[:, None]], axis=-1)
    return ba.Obs(
        cam_idx=jnp.zeros(n, jnp.int32),
        pt_idx=jnp.maximum(mp_ids, 0),
        target=target,
        inv_sigma2=INV_LEVEL_SIGMA2[jnp.clip(frame_level, 0, N_LEVELS - 1)],
        is_stereo=is_stereo,
        valid=valid & (mp_ids >= 0),
    )


@partial(jax.jit, static_argnames=("vo_points",))
def track_motion_model(
    state: MapState,
    cur: FrameData,
    last: FrameData,
    T_pred: jax.Array,
    K: jax.Array,
    bf: jax.Array,
    radius_th: jax.Array,  # 7 (retried at 14 by the host on failure)
    vo_points: bool = False,
):
    """SearchByProjection(cur, last, th) + PoseOptimization.

    Reference: Tracking::TrackWithMotionModel (src/Tracking.cc:1010-1071),
    ORBmatcher::SearchByProjection frame->frame overload
    (src/ORBmatcher.cc:1330-1472).

    `vo_points=True` (localization-only mode, stereo/RGB-D) additionally
    tracks against TEMPORAL points unprojected from the last frame's depth —
    the reference's "visual odometry" points that keep localization alive
    through unmapped stretches (UpdateLastFrame, src/Tracking.cc:962-1008;
    the mbVO mechanism, :434-501). VO matches steer the pose but are never
    written into the map-association output.
    """
    # Project last frame's map points with the predicted pose.
    q_mp = last.mp
    has_mp = (q_mp >= 0) & last.kp_valid & state.mp_valid[jnp.maximum(q_mp, 0)]
    pw = state.mp_pos[jnp.maximum(q_mp, 0)]
    if vo_points:
        Twc_R = last.pose[:3, :3].T
        Twc_t = -Twc_R @ last.pose[:3, 3]
        z = last.depth
        xc = (last.xy[:, 0] - K[2]) * z / K[0]
        yc = (last.xy[:, 1] - K[3]) * z / K[1]
        pw_vo = jnp.stack([xc, yc, z], -1) @ Twc_R.T + Twc_t
        use_vo = ~has_mp & last.kp_valid & (z > 0)
        pw = jnp.where(use_vo[:, None], pw_vo, pw)
        q_has = has_mp | use_vo
    else:
        q_has = has_mp
    pred_xy = project(T_pred, pw, K)
    pc_z = (T_pred[2, :3] @ pw.T) + T_pred[2, 3]
    q_has = q_has & (pc_z > 0)

    radius = radius_th * SCALE ** last.level.astype(jnp.float32)
    m = matching.match_projection(
        q_desc=last.desc_pm1,
        q_xy_pred=pred_xy,
        q_level_pred=last.level,
        q_valid=q_has,
        t_desc=cur.desc_pm1,
        t_xy=cur.xy,
        t_level=cur.level,
        t_valid=cur.kp_valid,
        radius=radius,
        max_dist=matching.TH_HIGH,
        nn_ratio=0.9,
    )
    # Rotation-consistency filter.
    dang = last.angle - cur.angle[m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    N = cur.mp.shape[0]
    n_matches = jnp.sum(ok.astype(jnp.int32))

    if vo_points:
        # Optimize in LAST-slot space over explicit positions so temporal VO
        # points (which have no map id) contribute to the pose; only real
        # map-point matches become associations of the current frame.
        tgt_lvl = cur.level[m.idx]
        tgt_ur = cur.ur[m.idx]
        obs = ba.Obs(
            cam_idx=jnp.zeros(N, jnp.int32),
            pt_idx=jnp.arange(N, dtype=jnp.int32),
            target=jnp.concatenate(
                [cur.xy[m.idx], tgt_ur[:, None]], axis=-1
            ),
            inv_sigma2=INV_LEVEL_SIGMA2[jnp.clip(tgt_lvl, 0, N_LEVELS - 1)],
            is_stereo=tgt_ur >= 0,
            valid=ok,
        )
        Tcw, inlier_last, n_inliers = ba.pose_optimization(T_pred, pw, obs, K, bf)
        okm = ok & has_mp & inlier_last
        cur_mp = jnp.full_like(cur.mp, -1)
        cur_mp = cur_mp.at[jnp.where(okm, m.idx, N)].set(
            jnp.where(okm, q_mp, -1), mode="drop"
        )
        return Tcw, cur_mp, TrackStats(n_matches=n_matches, n_inliers=n_inliers)

    # Move associations onto current-frame slots. Rows are one-to-one after
    # resolve_duplicates; invalid rows scatter out of bounds and are dropped.
    cur_mp = jnp.full_like(cur.mp, -1)
    cur_mp = cur_mp.at[jnp.where(ok, m.idx, N)].set(
        jnp.where(ok, q_mp, -1), mode="drop"
    )

    obs = make_obs_from_frame(cur.xy, cur.ur, cur.level, cur_mp, cur.kp_valid)
    Tcw, inlier_mask, n_inliers = ba.pose_optimization(
        T_pred, state.mp_pos, obs, K, bf
    )
    cur_mp = jnp.where(inlier_mask | (cur_mp < 0), cur_mp, -1)
    return Tcw, cur_mp, TrackStats(n_matches=n_matches, n_inliers=n_inliers)


@partial(jax.jit, static_argnames=())
def track_reference_keyframe(
    state: MapState,
    cur: FrameData,
    ref_kf: jax.Array,  # () i32
    T_init: jax.Array,
    K: jax.Array,
    bf: jax.Array,
    voc=None,
):
    """Match against the reference keyframe without a motion prior.

    Analog of Tracking::TrackReferenceKeyFrame (src/Tracking.cc:900-942),
    which uses SearchByBoW (src/ORBmatcher.cc:159-288): with a vocabulary,
    candidate pairs are pruned to those sharing a coarse vocabulary-tree
    node (the FeatureVector alignment, expressed as a mask on the dense
    match matrix); the TH_LOW + 0.7 ratio and rotation consistency are the
    BoW search's own thresholds.
    """
    N = cur.xy.shape[0]
    q_desc = hamming.unpack_pm1(state.kf_desc[ref_kf])
    q_mp = state.kf_mp[ref_kf]
    q_valid = (q_mp >= 0) & state.kf_kp_valid[ref_kf] & state.mp_valid[jnp.maximum(q_mp, 0)]

    mask = q_valid[:, None] & cur.kp_valid[None, :]
    if voc is not None:
        from ..ops import vocab as vocab_ops

        nq = vocab_ops.assign_nodes(voc, q_desc)
        nt = vocab_ops.assign_nodes(voc, cur.desc_pm1)
        mask = mask & (nq[:, None] == nt[None, :])
    m = matching.match_nn(q_desc, cur.desc_pm1, mask, max_dist=matching.TH_LOW, nn_ratio=0.7)
    dang = state.kf_angle[ref_kf] - cur.angle[m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    m = matching.resolve_duplicates(m.idx, m.dist, ok & m.ok, N)
    ok = m.ok

    cur_mp = jnp.full(N, -1, jnp.int32)
    cur_mp = cur_mp.at[jnp.where(ok, m.idx, N)].set(jnp.where(ok, q_mp, -1), mode="drop")
    n_matches = jnp.sum(ok.astype(jnp.int32))

    obs = make_obs_from_frame(cur.xy, cur.ur, cur.level, cur_mp, cur.kp_valid)
    Tcw, inlier_mask, n_inliers = ba.pose_optimization(T_init, state.mp_pos, obs, K, bf)
    cur_mp = jnp.where(inlier_mask | (cur_mp < 0), cur_mp, -1)
    return Tcw, cur_mp, TrackStats(n_matches=n_matches, n_inliers=n_inliers)


def _local_keyframes(state: MapState, cur_mp: jax.Array):
    """(K,) bool mask of local keyframes: every KF sharing a map point with
    the current frame, plus best covisible neighbors, capped at 80
    (UpdateLocalKeyFrames, src/Tracking.cc:1376-1484)."""
    K, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    cur_mask = jnp.zeros(M + 1, bool).at[jnp.where(cur_mp >= 0, cur_mp, M)].set(True)
    votes = jnp.sum(
        cur_mask[jnp.where(state.kf_kp_valid, state.kf_mp, M).clip(-1, M)]
        & (state.kf_mp >= 0),
        axis=1,
    )  # (K,)
    votes = votes * state.kf_valid
    k1 = votes > 0

    # Cached covisibility (refreshed once per mapping round): the neighbor
    # bonus is a selection heuristic, staleness of <= one insertion is
    # harmless, and it removes a (K,M)x(M,K) matmul from every frame.
    C = state.covis
    neigh_score = jnp.sum(jnp.where(k1[:, None], C, 0), axis=0)  # (K,)
    score = votes.astype(jnp.int32) * 1000 + neigh_score
    score = jnp.where(state.kf_valid, score, -1)
    # Cap at MAX_LOCAL_KFS via top_k.
    kk = min(MAX_LOCAL_KFS, K)
    top_vals, top_idx = jax.lax.top_k(score, kk)
    local = jnp.zeros(K, bool).at[top_idx].set(top_vals > 0)
    return local | k1


@partial(jax.jit, static_argnames=())
def track_local_map(
    state: MapState,
    cur: FrameData,
    Tcw: jax.Array,
    K: jax.Array,
    bf: jax.Array,
    view_cos_limit: jax.Array,  # 0.5 (Frame::isInFrustum)
    img_wh: jax.Array,  # (2,) image width/height for frustum bounds
):
    """SearchLocalPoints + pose optimization over the local map.

    Reference: Tracking::TrackLocalMap (src/Tracking.cc:1073-1117),
    SearchLocalPoints (:1288-1338), isInFrustum (src/Frame.cc:284-340),
    ORBmatcher::SearchByProjection local-map overload (src/ORBmatcher.cc:45-137).
    """
    M = state.mp_pos.shape[0]
    N = cur.xy.shape[0]

    local_kf = _local_keyframes(state, cur.mp)
    # Local points: observed by any local KF.
    mp_of_local = jnp.where(
        (state.kf_mp >= 0) & state.kf_kp_valid & local_kf[:, None], state.kf_mp, M
    )
    local_mp = jnp.zeros(M + 1, bool).at[mp_of_local.reshape(-1)].set(True)[:M]
    local_mp = local_mp & state.mp_valid

    # Fixed-capacity local map via top_k over the mask.
    sel_score = local_mp.astype(jnp.int32)
    _, mp_sel = jax.lax.top_k(sel_score, min(LOCAL_MP_CAP, M))
    sel_valid = local_mp[mp_sel]

    pw = state.mp_pos[mp_sel]
    # Frustum check (isInFrustum, src/Frame.cc:284-340).
    pc = (Tcw[:3, :3] @ pw.T).T + Tcw[:3, 3]
    z = pc[:, 2]
    uv = project(Tcw, pw, K)
    in_img = (
        (uv[:, 0] >= 0)
        & (uv[:, 0] < img_wh[0])
        & (uv[:, 1] >= 0)
        & (uv[:, 1] < img_wh[1])
    )
    cam_center = -Tcw[:3, :3].T @ Tcw[:3, 3]
    po = pw - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    in_band = (dist >= state.mp_min_dist[mp_sel]) & (dist <= state.mp_max_dist[mp_sel])
    view_cos = jnp.sum(po * state.mp_normal[mp_sel], axis=-1) / jnp.maximum(dist, 1e-9)
    visible = sel_valid & (z > 0) & in_img & in_band & (view_cos > view_cos_limit)

    # Predicted octave from distance (MapPoint::PredictScale, src/MapPoint.cc:397-412).
    ratio = state.mp_max_dist[mp_sel] / jnp.maximum(dist, 1e-9)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(SCALE)).astype(jnp.int32),
        0,
        N_LEVELS - 1,
    )
    # Window radius (RadiusByViewingCos x scale, src/ORBmatcher.cc:123-133).
    r = jnp.where(view_cos > 0.998, 2.5, 4.0) * SCALE ** pred_level.astype(jnp.float32)

    # Don't re-match points already associated to this frame.
    already = jnp.zeros(M + 1, bool).at[jnp.where(cur.mp >= 0, cur.mp, M)].set(True)
    q_valid = visible & ~already[mp_sel]
    # Exclude current slots that already have a point.
    t_free = cur.kp_valid & (cur.mp < 0)

    q_pm1 = hamming.unpack_pm1(state.mp_desc[mp_sel])
    m = matching.match_projection(
        q_desc=q_pm1,
        q_xy_pred=uv,
        q_level_pred=pred_level,
        q_valid=q_valid,
        t_desc=cur.desc_pm1,
        t_xy=cur.xy,
        t_level=cur.level,
        t_valid=t_free,
        radius=r,
        max_dist=matching.TH_HIGH,
        nn_ratio=0.8,
    )

    cur_mp = cur.mp
    cur_mp = cur_mp.at[jnp.where(m.ok, m.idx, N)].set(
        jnp.where(m.ok, mp_sel, -1), mode="drop"
    )

    obs = make_obs_from_frame(cur.xy, cur.ur, cur.level, cur_mp, cur.kp_valid)
    Tcw2, inlier_mask, n_inliers = ba.pose_optimization(Tcw, state.mp_pos, obs, K, bf)
    cur_mp_in = jnp.where(inlier_mask | (cur_mp < 0), cur_mp, -1)

    # Visibility bookkeeping (MapPoint::IncreaseVisible/Found,
    # src/MapPoint.cc:234-250) for the found/visible culling ratio.
    vis_ids = jnp.where(visible, mp_sel, M)
    mp_visible = jnp.concatenate([state.mp_visible, jnp.zeros(1, jnp.int32)])
    mp_visible = mp_visible.at[vis_ids].add(1)[:M]
    found_ids = jnp.where(cur_mp_in >= 0, cur_mp_in, M)
    mp_found = jnp.concatenate([state.mp_found, jnp.zeros(1, jnp.int32)])
    mp_found = mp_found.at[found_ids].add(1)[:M]
    state = state._replace(mp_visible=mp_visible, mp_found=mp_found)

    n_matches = jnp.sum((cur_mp >= 0).astype(jnp.int32))
    return state, Tcw2, cur_mp_in, TrackStats(n_matches=n_matches, n_inliers=n_inliers)
