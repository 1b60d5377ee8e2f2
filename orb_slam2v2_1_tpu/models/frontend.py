"""Fused per-frame device program: ONE dispatch per tracked frame.

Profiling the v1 host orchestration on real TPU hardware showed 609 ms/frame
with >60% of wall time in host-device round trips: eagerly dispatched ops in
frame construction, per-frame scalar pulls, and trajectory bookkeeping
transfers. This module fuses the whole hot path — ORB extraction,
undistortion, depth sampling, motion-model tracking (with wide-window retry),
reference-KF fallback, local-map tracking, keyframe-policy statistics and
relative-pose bookkeeping — into a single jitted program returning one small
stats vector. The host reads 48 floats per frame and decides only the state
machine transitions (the reference's per-frame thread logic,
src/Tracking.cc:376-649, with identical decision thresholds).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ba, lie, orb, undistort
from . import tracking
from .map_state import MapState, mp_observation_count
from .tracking import FrameData, TrackStats


class FrameResult(NamedTuple):
    state: MapState
    frame: FrameData  # pose/mp filled in; stays on device
    pose: jax.Array  # (4,4)
    T_rel: jax.Array  # (4,4) Tcw_frame @ Twc_refkf (trajectory bookkeeping)
    velocity: jax.Array  # (4,4) new velocity model
    stats: jax.Array  # (9,) f32: [tracked_ok, n_inliers, n_matches,
    #                 ref_matches, tracked_close, untracked_close,
    #                 used_fallback, n_assoc, stage1_inliers]


def _build_frame(img, depth, has_depth: bool, K, dist, bf, config: orb.OrbConfig,
                 frame_id, width: int, height: int) -> FrameData:
    """Frame construction (Frame ctor analog) fully on device."""
    feats = orb.extract_orb(img, config)
    xy_u = undistort.undistort_points(feats.xy, K, dist)
    n = feats.xy.shape[0]
    if has_depth:
        dmap = depth
        xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 1, width - 2)
        yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 1, height - 2)
        # 3x3 depth-edge filter (see system._make_frame rationale).
        patch = jnp.stack(
            [dmap[yi + dy, xi + dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
            axis=-1,
        )
        d = dmap[yi, xi]
        spread = jnp.max(patch, -1) - jnp.min(patch, -1)
        edge_ok = (jnp.min(patch, -1) > 0) & (spread < 0.1 * jnp.maximum(d, 1e-6))
        d = jnp.where(edge_ok, d, -1.0)
        ur = jnp.where(d > 0, xy_u[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    else:
        d = jnp.full(n, -1.0, jnp.float32)
        ur = jnp.full(n, -1.0, jnp.float32)
    return FrameData(
        xy=xy_u, level=feats.level, angle=feats.angle, desc=feats.desc,
        desc_pm1=feats.desc_pm1, kp_valid=feats.valid, ur=ur, depth=d,
        pose=jnp.eye(4), mp=jnp.full(n, -1, jnp.int32), frame_id=frame_id,
    )


def process_frame_impl(
    state: MapState,
    img: jax.Array,
    depth: jax.Array,  # dummy zeros if has_depth=False
    last: FrameData,
    velocity: jax.Array,  # (4,4)
    have_velocity: jax.Array,  # () bool
    ref_kf: jax.Array,  # () i32
    K: jax.Array,
    dist: jax.Array,
    bf: jax.Array,
    depth_limit: jax.Array,
    frame_id: jax.Array,
    config: orb.OrbConfig,
    has_depth: bool,
    width: int,
    height: int,
    mono: bool,
    voc=None,
    vo_points: bool = False,
) -> FrameResult:
    cur = _build_frame(img, depth, has_depth, K, dist, bf, config, frame_id, width, height)
    return track_frame_impl(
        state, cur, last, velocity, have_velocity, ref_kf, K, bf, depth_limit,
        width, height, mono, voc, vo_points,
    )


# Donating jit: the synchronous path owns `state` exclusively. The _shared
# variant is for the async runtime, where the input is a published MapBox
# snapshot also referenced by the mapping/loop workers and must survive.
process_frame = partial(
    jax.jit,
    static_argnames=("config", "has_depth", "width", "height", "mono", "vo_points"),
    donate_argnames=("state",),
)(process_frame_impl)
process_frame_shared = partial(
    jax.jit,
    static_argnames=("config", "has_depth", "width", "height", "mono", "vo_points"),
)(process_frame_impl)


@partial(
    jax.jit,
    static_argnames=("config", "width", "height"),
)
def build_frame_stereo(
    img_left: jax.Array,
    img_right: jax.Array,
    K: jax.Array,
    dist: jax.Array,
    bf: jax.Array,
    frame_id: jax.Array,
    config: orb.OrbConfig,
    width: int,
    height: int,
) -> FrameData:
    """Stereo frame: ORB on both images, rectified row matching + SAD
    subpixel disparity (Frame stereo ctor, src/Frame.cc:61-117 with the
    two-thread extraction replaced by two device programs)."""
    from ..ops import stereo as stereo_ops

    fl = orb.extract_orb(img_left, config)
    fr = orb.extract_orb(img_right, config)
    ur, depth, ok = stereo_ops.match_stereo(
        fl.xy, fl.level, fl.desc_pm1, fl.valid,
        fr.xy, fr.level, fr.desc_pm1, fr.valid,
        bf, K[0], bf / K[0],
    )
    ur, depth = stereo_ops.sad_subpixel_refine(img_left, img_right, fl.xy, ur, ok, bf)
    xy_u = undistort.undistort_points(fl.xy, K, dist)
    n = fl.xy.shape[0]
    return FrameData(
        xy=xy_u, level=fl.level, angle=fl.angle, desc=fl.desc,
        desc_pm1=fl.desc_pm1, kp_valid=fl.valid, ur=ur, depth=depth,
        pose=jnp.eye(4), mp=jnp.full(n, -1, jnp.int32), frame_id=frame_id,
    )


def track_frame_impl(
    state: MapState,
    cur: FrameData,
    last: FrameData,
    velocity: jax.Array,
    have_velocity: jax.Array,
    ref_kf: jax.Array,
    K: jax.Array,
    bf: jax.Array,
    depth_limit: jax.Array,
    width: int,
    height: int,
    mono: bool,
    voc=None,
    vo_points: bool = False,
) -> FrameResult:
    img_wh = jnp.asarray([width, height], jnp.float32)

    # --- stage 1: motion model (with wide retry) or reference-KF fallback ---
    r1 = jnp.float32(15.0 if mono else 7.0)
    T_pred = lie.orthonormalize(velocity @ last.pose)

    def run_mm(radius):
        return tracking.track_motion_model(
            state, cur, last, T_pred, K, bf, radius, vo_points
        )

    Tcw, cur_mp, st1 = run_mm(r1)
    need_retry = st1.n_inliers < 10

    def retry(_):
        return run_mm(r1 * 2.0)

    Tcw, cur_mp, st1 = jax.lax.cond(
        need_retry & have_velocity, retry, lambda _: (Tcw, cur_mp, st1), None
    )

    def ref_track(_):
        return tracking.track_reference_keyframe(
            state, cur, ref_kf, last.pose, K, bf, voc
        )

    use_fallback = (st1.n_inliers < 10) | ~have_velocity
    Tcw, cur_mp, st1 = jax.lax.cond(
        use_fallback, ref_track, lambda _: (Tcw, cur_mp, st1), None
    )
    stage1_ok = st1.n_inliers >= 10

    # --- stage 2: local map ---
    cur1 = cur._replace(pose=Tcw, mp=cur_mp)
    state, Tcw2, cur_mp2, st2 = tracking.track_local_map(
        state, cur1, Tcw, K, bf, jnp.float32(0.5), img_wh
    )
    tracked_ok = stage1_ok & (st2.n_inliers >= 30)
    cur2 = cur._replace(pose=Tcw2, mp=jnp.where(tracked_ok, cur_mp2, cur.mp))

    # --- keyframe-policy statistics (NeedNewKeyFrame inputs) ---
    obs = mp_observation_count(state)
    min_obs = jnp.where(state.n_kf > 2, 3, 2)
    ref_mp = state.kf_mp[ref_kf]
    ref_matches = jnp.sum(
        (ref_mp >= 0)
        & state.kf_kp_valid[ref_kf]
        & (obs[jnp.maximum(ref_mp, 0)] >= min_obs)
    )
    close = cur2.kp_valid & (cur2.depth > 0) & (cur2.depth < depth_limit)
    has_mp = cur2.mp >= 0
    tracked_close = jnp.sum(close & has_mp)
    untracked_close = jnp.sum(close & ~has_mp)

    # --- bookkeeping ---
    T_rel = Tcw2 @ lie.se3_inverse(state.kf_pose[ref_kf])
    new_velocity = lie.orthonormalize(Tcw2 @ lie.se3_inverse(last.pose))

    stats = jnp.stack(
        [
            tracked_ok.astype(jnp.float32),
            st2.n_inliers.astype(jnp.float32),
            st1.n_matches.astype(jnp.float32),
            ref_matches.astype(jnp.float32),
            tracked_close.astype(jnp.float32),
            untracked_close.astype(jnp.float32),
            use_fallback.astype(jnp.float32),
            jnp.sum((cur2.mp >= 0).astype(jnp.float32)),
            # Stage-1 (motion-model / ref-KF) inliers: the host's mbVO
            # localization fallback keys off this (src/Tracking.cc:434-501).
            st1.n_inliers.astype(jnp.float32),
        ]
    )
    return FrameResult(
        state=state, frame=cur2, pose=Tcw2, T_rel=T_rel,
        velocity=new_velocity, stats=stats,
    )


track_frame = partial(
    jax.jit,
    static_argnames=("width", "height", "mono", "vo_points"),
    donate_argnames=("state",),
)(track_frame_impl)
track_frame_shared = partial(
    jax.jit, static_argnames=("width", "height", "mono", "vo_points")
)(track_frame_impl)


@partial(jax.jit, static_argnames=("config", "has_depth", "width", "height"))
def build_frame_only(
    img, depth, K, dist, bf, frame_id, config: orb.OrbConfig,
    has_depth: bool, width: int, height: int,
) -> FrameData:
    """Frame construction alone (initialization phase)."""
    return _build_frame(img, depth, has_depth, K, dist, bf, config, frame_id, width, height)


def insert_keyframe_fused_impl(
    state: MapState,
    frame: FrameData,
    K: jax.Array,
    bf: jax.Array,
    depth_limit: jax.Array,  # <=0 disables depth densification (mono)
    key: jax.Array,
    voc=None,
):
    """Full keyframe-insertion pipeline in one dispatch: append, depth
    densification, point cull, triangulate, fuse, stats, local BA, keyframe
    cull (the LocalMapping::Run body order, src/LocalMapping.cc:47-120).

    Returns (state, kf_id, cost, victim, victim_parent, T_redirect): victim
    is the erased redundant keyframe's slot (-1 if none) so the host can
    rewrite trajectory references (see local_mapping.cull_keyframes).

    Raw traced body — callers embedding this in a larger program (the offline
    scan) MUST use this, not the jitted wrapper: a jit-wrapped call inside an
    outer trace becomes an XLA call boundary that blocks fusion and aliasing
    of the carried MapState (measured 2x on the whole scan)."""
    from . import local_mapping
    from .map_state import refresh_covis, update_mp_stats_window

    state, kf_id = _append_keyframe_body(state, frame, K, bf, depth_limit)
    state = local_mapping.cull_map_points(state, kf_id)
    state = local_mapping.create_map_points(state, kf_id, K, bf, key, voc)
    state = local_mapping.fuse_map_points(state, kf_id, K, bf)
    state = update_mp_stats_window(state, kf_id)
    state, cost = local_mapping.local_bundle_adjustment_impl(state, kf_id, K, bf)
    state, victim, vparent, T_redirect = local_mapping.cull_keyframes(state, kf_id)
    state = refresh_covis(state)
    return state, kf_id, cost, victim, vparent, T_redirect


insert_keyframe_fused = partial(jax.jit, donate_argnames=("state",))(
    insert_keyframe_fused_impl
)


# ---------------------------------------------------------------------------
# Split keyframe pipeline for the async runtime (runtime/pipeline.py):
# tracking appends the keyframe (cheap, CreateNewKeyFrame analog,
# src/Tracking.cc:1206-1286) and hands the heavy mapping work to the
# LocalMapping worker (LocalMapping::Run body, src/LocalMapping.cc:47-120).
# ---------------------------------------------------------------------------


def _append_keyframe_body(state, frame, K, bf, depth_limit):
    from . import local_mapping
    from .map_state import append_keyframe

    state, kf_id = append_keyframe(
        state, frame.pose, frame.frame_id, frame.xy, frame.level, frame.angle,
        frame.desc, frame.kp_valid, frame.ur, frame.mp,
    )
    state = jax.lax.cond(
        depth_limit > 0,
        lambda s: local_mapping.create_depth_points(s, kf_id, K, bf, depth_limit),
        lambda s: s,
        state,
    )
    return state, kf_id


@jax.jit
def append_keyframe_only(
    state: MapState, frame: FrameData, K: jax.Array, bf: jax.Array,
    depth_limit: jax.Array,
):
    """Append + stereo/depth densification only (non-donating: `state` is a
    shared MapBox snapshot)."""
    return _append_keyframe_body(state, frame, K, bf, depth_limit)


@jax.jit
def mapping_pre_ba(
    state: MapState, kf_id: jax.Array, K: jax.Array, bf: jax.Array,
    key: jax.Array, voc=None,
):
    """Mapping round up to (excluding) the BA solve — the split used when
    local BA routes through the sharded engine (SlamSystem(mesh=...)):
    window build/solve/write-back run as separate dispatches between this
    and mapping_post_ba, same stage order as the fused pipeline."""
    from . import local_mapping
    from .map_state import update_mp_stats_window

    state = local_mapping.cull_map_points(state, kf_id)
    state = local_mapping.create_map_points(state, kf_id, K, bf, key, voc)
    state = local_mapping.fuse_map_points(state, kf_id, K, bf)
    return update_mp_stats_window(state, kf_id)


@jax.jit
def mapping_post_ba(state: MapState, kf_id: jax.Array):
    """Keyframe culling + covisibility refresh after the (sharded) solve."""
    from . import local_mapping
    from .map_state import refresh_covis

    state, victim, vparent, T_redirect = local_mapping.cull_keyframes(state, kf_id)
    return refresh_covis(state), victim, vparent, T_redirect


def mapping_pipeline_dist(
    state: MapState, kf_id, K, bf, key, mesh, voc=None, allow_ba: bool = True,
):
    """Worker-side mapping round with the window BA sharded over `mesh`
    (parallel/dist_ba.py): the product route for multi-device local BA
    (reference hot solve, src/Optimizer.cc:453-780; SURVEY §2.3)."""
    from . import local_mapping

    state = mapping_pre_ba(state, jnp.int32(kf_id), K, bf, key, voc)
    if allow_ba:
        state, _ = local_mapping.local_bundle_adjustment_dist(
            state, kf_id, K, bf, mesh
        )
    return mapping_post_ba(state, jnp.int32(kf_id))


@partial(jax.jit, static_argnames=("allow_ba",))
def mapping_pipeline(
    state: MapState, kf_id: jax.Array, K: jax.Array, bf: jax.Array,
    key: jax.Array, allow_ba: bool = True, voc=None,
):
    """Worker-side mapping round on an already-appended keyframe: cull,
    triangulate, fuse, stats, and (unless interrupted) local BA. Non-donating.
    `allow_ba=False` is the mbAbortBA path (src/LocalMapping.cc:126): a newer
    keyframe is waiting, skip the expensive solve and catch up."""
    from . import local_mapping
    from .map_state import refresh_covis, update_mp_stats_window

    state = local_mapping.cull_map_points(state, kf_id)
    state = local_mapping.create_map_points(state, kf_id, K, bf, key, voc)
    state = local_mapping.fuse_map_points(state, kf_id, K, bf)
    state = update_mp_stats_window(state, kf_id)
    if allow_ba:
        state, _ = local_mapping.local_bundle_adjustment_impl(state, kf_id, K, bf)
    state, victim, vparent, T_redirect = local_mapping.cull_keyframes(state, kf_id)
    return refresh_covis(state), victim, vparent, T_redirect
