"""Whole-sequence SLAM as ONE device program (host-free inner loop).

The interactive API (`SlamSystem`) dispatches per frame; on hardware behind a
high-latency link every dispatch costs tens of ms. This module moves the
ENTIRE pipeline — frame construction, tracking, keyframe policy, map growth,
local BA — into a single `lax.scan` over the image batch: one upload, one
compile, one result pull. Data-dependent decisions (keyframe insertion,
tracking fallbacks) become `lax.cond` branches over the same fixed-shape
programs the online path uses, so both paths share one implementation.

This is the "compiler-friendly control flow" answer to the reference's
thread-per-subsystem design (SURVEY §2.3): the tracking/mapping interleaving
becomes explicit dataflow instead of mutexes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import orb
from . import frontend, initialization
from .map_state import MapState, empty_map
from .tracking import FrameData


class ScanCarry(NamedTuple):
    state: MapState
    last: FrameData
    velocity: jax.Array  # (4,4)
    have_velocity: jax.Array  # () bool
    ref_kf: jax.Array  # () i32
    last_kf_frame: jax.Array  # () i32
    frame_id: jax.Array  # () i32
    n_live: jax.Array  # () i32 live (non-culled) keyframe count
    lost: jax.Array  # () bool


def _need_kf(stats, carry: ScanCarry, mono: bool, max_frames: int, max_kf: int):
    """Device-side NeedNewKeyFrame (same thresholds as system.py)."""
    n_inliers = stats[1]
    ref_matches = stats[3]
    frames_since = carry.frame_id - carry.last_kf_frame
    ref_ratio = 0.9 if mono else 0.75
    c1a = frames_since >= max_frames
    c1b = frames_since >= 1
    c2 = (n_inliers < ref_matches * ref_ratio) & (n_inliers > 15)
    need_close = jnp.asarray(False) if mono else (stats[4] < 100) & (stats[5] > 70)
    # Culled slots are reused (map_state.append_keyframe), so capacity is
    # bounded by the LIVE count, not the high-water mark.
    room = carry.n_live < max_kf - 2
    return ((c1b & (c2 | need_close)) | c1a) & room


@partial(
    jax.jit,
    static_argnames=("config", "width", "height", "max_frames", "mono"),
    donate_argnames=(),
)
def run_sequence_rgbd(
    images: jax.Array,  # (N,H,W) f32
    depths: jax.Array,  # (N,H,W) f32
    state: MapState,  # pre-initialized map (first keyframe inserted)
    first: FrameData,  # frame 0 (already associated to the init map)
    K: jax.Array,
    dist: jax.Array,
    bf: jax.Array,
    depth_limit: jax.Array,
    config: orb.OrbConfig,
    width: int,
    height: int,
    max_frames: int,
    mono: bool = False,
):
    """Track frames 1..N-1 against the evolving map, on device.

    Returns (final_state, poses (N-1,4,4), ok (N-1,), T_rel (N-1,4,4),
    ref_kfs (N-1,), n_kf)."""
    max_kf = state.kf_pose.shape[0]

    def step(carry: ScanCarry, inputs):
        img, depth = inputs
        res = frontend.process_frame(
            carry.state, img, depth, carry.last, carry.velocity,
            carry.have_velocity, carry.ref_kf, K, dist, bf, depth_limit,
            carry.frame_id, config, True, width, height, mono,
        )
        tracked = res.stats[0] > 0

        need_kf = _need_kf(res.stats, carry, mono, max_frames, max_kf) & tracked

        def do_insert(args):
            st, fr = args
            st2, kf_id, _, victim, _, _ = frontend.insert_keyframe_fused(
                st, fr, K, bf,
                jnp.where(mono, jnp.float32(0.0), depth_limit),
                jax.random.fold_in(jax.random.key(0), carry.frame_id),
            )
            # +1 inserted, -1 if a redundant keyframe was culled/erased.
            return st2, kf_id, jnp.where(victim >= 0, 0, 1).astype(jnp.int32)

        state2, new_ref, d_live = jax.lax.cond(
            need_kf,
            do_insert,
            lambda args: (args[0], carry.ref_kf, jnp.int32(0)),
            (res.state, res.frame),
        )

        # After insertion, cull/fuse may have remapped point ids: re-read the
        # frame's associations from its keyframe row.
        frame_out = res.frame._replace(
            mp=jnp.where(need_kf, state2.kf_mp[new_ref], res.frame.mp)
        )

        new_carry = ScanCarry(
            state=state2,
            last=jax.tree.map(
                lambda a, b: jnp.where(tracked, a, b), frame_out, carry.last
            ),
            velocity=jnp.where(tracked, res.velocity, jnp.eye(4)),
            have_velocity=tracked,
            ref_kf=new_ref,
            last_kf_frame=jnp.where(need_kf, carry.frame_id, carry.last_kf_frame),
            frame_id=carry.frame_id + 1,
            n_live=carry.n_live + d_live,
            lost=~tracked,
        )
        return new_carry, (res.pose, tracked, res.T_rel, carry.ref_kf)

    carry0 = ScanCarry(
        state=state,
        last=first,
        velocity=jnp.eye(4),
        have_velocity=jnp.asarray(False),
        ref_kf=jnp.int32(0),
        last_kf_frame=jnp.int32(0),
        frame_id=jnp.int32(1),
        n_live=jnp.sum(state.kf_valid.astype(jnp.int32)),
        lost=jnp.asarray(False),
    )
    carry, (poses, ok, T_rel, ref_kfs) = jax.lax.scan(
        step, carry0, (images[1:], depths[1:])
    )
    return carry.state, poses, ok, T_rel, ref_kfs, carry.n_live


def track_sequence_rgbd(images, depths, cfg, sensor_bf=None):
    """Host convenience: init on frame 0, scan the rest. images/depths are
    numpy (N,H,W). Returns (poses (N,4,4) incl. frame 0, ok (N,), state)."""
    import numpy as np

    K = jnp.asarray(cfg.K, jnp.float32)
    dist = jnp.asarray(cfg.dist, jnp.float32)
    bf = jnp.float32(cfg.bf)
    depth_limit = jnp.float32(cfg.bf * cfg.th_depth / cfg.fx)
    ocfg = orb.OrbConfig(
        n_features=cfg.n_features, n_levels=cfg.n_levels, scale=cfg.scale_factor,
        fast_threshold=cfg.fast_threshold, fast_min_threshold=cfg.fast_min_threshold,
    )
    images = jnp.asarray(images, jnp.float32)
    depths = jnp.asarray(depths, jnp.float32)

    f0 = frontend.build_frame_only(
        images[0], depths[0], K, dist, bf, jnp.int32(0), ocfg, True,
        cfg.width, cfg.height,
    )
    state = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
    state, kf0, _ = initialization.create_initial_map_depth(state, f0, K)
    f0 = f0._replace(mp=state.kf_mp[0])

    state, poses, ok, T_rel, ref_kfs, n_kf = run_sequence_rgbd(
        images, depths, state, f0, K, dist, bf, depth_limit, ocfg,
        cfg.width, cfg.height, int(cfg.fps), False,
    )
    poses = jnp.concatenate([jnp.eye(4)[None], poses])
    ok = jnp.concatenate([jnp.ones(1, bool), ok])
    return np.asarray(poses), np.asarray(ok), state
