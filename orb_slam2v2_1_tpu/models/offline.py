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
    """Device-side NeedNewKeyFrame (same thresholds as system.py).

    Returns (need & room, need & ~room): the second output drives the
    cull-on-full path — a blocked insertion culls a redundant keyframe so
    the map keeps adapting on long revisits instead of freezing at
    capacity."""
    n_inliers = stats[1]
    ref_matches = stats[3]
    frames_since = carry.frame_id - carry.last_kf_frame
    ref_ratio = 0.9 if mono else 0.75
    c1a = frames_since >= max_frames
    c1b = frames_since >= 1
    c2 = (n_inliers < ref_matches * ref_ratio) & (n_inliers > 15)
    need_close = jnp.asarray(False) if mono else (stats[4] < 100) & (stats[5] > 70)
    need = (c1b & (c2 | need_close)) | c1a
    # Culled slots are reused (map_state.append_keyframe), so capacity is
    # bounded by the LIVE count, not the high-water mark.
    room = carry.n_live < max_kf - 2
    return need & room, need & ~room


def _nearest_kf(state: MapState, pose: jax.Array) -> jax.Array:
    """Live keyframe closest to `pose` in camera center AND viewing
    direction — the in-scan relocalization candidate (a pose-prior stand-in
    for the online path's BoW retrieval, Tracking::Relocalization
    src/Tracking.cc:1486). The direction term disambiguates pure-rotation
    trajectories where every keyframe shares one center."""
    R = state.kf_pose[:, :3, :3]
    t = state.kf_pose[:, :3, 3]
    centers = -jnp.einsum("kji,kj->ki", R, t)
    c_last = -pose[:3, :3].T @ pose[:3, 3]
    d = jnp.linalg.norm(centers - c_last, axis=-1)
    # World-frame optical axes: third ROW of Rcw is the camera z in world.
    z_kf = R[:, 2, :]
    z_last = pose[:3, :3][2, :]
    d = d + 2.0 * (1.0 - z_kf @ z_last)
    d = jnp.where(state.kf_valid, d, jnp.inf)
    return jnp.argmin(d).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("config", "width", "height", "max_frames", "mono"),
    donate_argnames=("carry",),
)
def run_sequence_carry(
    images: jax.Array,  # (F,H,W) f32
    depths: jax.Array,  # (F,H,W) f32
    carry: ScanCarry,
    K: jax.Array,
    dist: jax.Array,
    bf: jax.Array,
    depth_limit: jax.Array,
    config: orb.OrbConfig,
    width: int,
    height: int,
    max_frames: int,
    mono: bool = False,
    voc=None,
):
    """Track a chunk of frames against the evolving map, on device, from an
    explicit carry (so the host can interleave loop-closing rounds between
    chunks — the LoopClosing-thread cadence of the reference).

    Returns (carry, poses (F,4,4), ok (F,), T_rel (F,4,4), ref_kfs (F,))."""
    max_kf = carry.state.kf_pose.shape[0]

    def step(carry: ScanCarry, inputs):
        img, depth = inputs
        # In-scan relocalization (Tracking's LOST -> Relocalization branch):
        # after a lost frame, re-anchor on the nearest live keyframe instead
        # of retrying the stale reference forever.
        near = _nearest_kf(carry.state, carry.last.pose)
        ref_kf = jnp.where(carry.lost, near, carry.ref_kf)
        last = carry.last._replace(
            pose=jnp.where(
                carry.lost, carry.state.kf_pose[near], carry.last.pose
            )
        )
        res = frontend.process_frame(
            carry.state, img, depth, last, carry.velocity,
            carry.have_velocity & ~carry.lost, ref_kf, K, dist, bf,
            depth_limit, carry.frame_id, config, True, width, height, mono,
            voc,
        )
        tracked = res.stats[0] > 0

        need_kf, blocked = _need_kf(res.stats, carry, mono, max_frames, max_kf)
        need_kf = need_kf & tracked
        blocked = blocked & tracked

        def do_insert(args):
            st, fr = args
            # Raw impl, not the jitted wrapper: a nested jit call inside this
            # scan becomes an XLA call boundary that blocks fusion/aliasing of
            # the carried MapState (see insert_keyframe_fused_impl docstring).
            st2, kf_id, _, victim, _, _ = frontend.insert_keyframe_fused_impl(
                st, fr, K, bf,
                jnp.where(mono, jnp.float32(0.0), depth_limit),
                jax.random.fold_in(jax.random.key(0), carry.frame_id),
                voc,
            )
            # +1 inserted, -1 if a redundant keyframe was culled/erased.
            return st2, kf_id, jnp.where(victim >= 0, 0, 1).astype(jnp.int32)

        state2, new_ref, d_live = jax.lax.cond(
            need_kf,
            do_insert,
            lambda args: (args[0], ref_kf, jnp.int32(0)),
            (res.state, res.frame),
        )

        # Cull-on-full: a capacity-blocked insertion erases one redundant
        # keyframe (KeyFrameCulling semantics) so the NEXT insertion has a
        # free slot — bounded memory without a frozen map.
        def do_cull(st):
            from . import local_mapping

            st2, victim, _, _ = local_mapping.cull_keyframes(
                st, new_ref, force=True
            )
            return st2, jnp.where(victim >= 0, jnp.int32(-1), jnp.int32(0))

        state2, d_live2 = jax.lax.cond(
            blocked, do_cull, lambda st: (st, jnp.int32(0)), state2
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
            n_live=carry.n_live + d_live + d_live2,
            lost=~tracked,
        )
        return new_carry, (res.pose, tracked, res.T_rel, ref_kf)

    carry, (poses, ok, T_rel, ref_kfs) = jax.lax.scan(step, carry, (images, depths))
    return carry, poses, ok, T_rel, ref_kfs


class _CellBox:
    """Single-threaded MapBox stand-in for the chunked driver: the detached
    GBA service interface (read/mutate) over a plain cell."""

    def __init__(self, state):
        self.state = state

    def read(self):
        return self.state, 0

    def mutate(self, fn):
        self.state = fn(self.state)
        return self.state


def make_carry0(state: MapState, first: FrameData) -> ScanCarry:
    return ScanCarry(
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


def run_sequence_rgbd(
    images, depths, state, first, K, dist, bf, depth_limit, config,
    width: int, height: int, max_frames: int, mono: bool = False,
):
    """Track frames 1..N-1 against the evolving map, on device (one chunk).

    Returns (final_state, poses (N-1,4,4), ok (N-1,), T_rel (N-1,4,4),
    ref_kfs (N-1,), n_kf)."""
    carry = make_carry0(state, first)
    carry, poses, ok, T_rel, ref_kfs = run_sequence_carry(
        images[1:], depths[1:], carry, K, dist, bf, depth_limit, config,
        width, height, max_frames, mono,
    )
    return carry.state, poses, ok, T_rel, ref_kfs, carry.n_live


def track_sequence_rgbd(images, depths, cfg, sensor_bf=None, loop_closer=None,
                        chunk: int | None = None, voc=None):
    """Host convenience: init on frame 0, scan the rest. images/depths are
    numpy (N,H,W). Returns (poses (N,4,4) incl. frame 0, ok (N,), state).

    With `loop_closer` and `chunk`, the scan runs in chunks with a host-side
    LoopClosing round between them (BoW update + detect + Sim3 + correction +
    GBA for every keyframe the chunk inserted) — the reference's LoopClosing
    thread cadence expressed as a pipeline stage. Loop closing latency is
    then bounded by the chunk length instead of one frame, which is the same
    asynchrony the reference's queue introduces."""
    import numpy as np

    K = jnp.asarray(cfg.K, jnp.float32)
    dist = jnp.asarray(cfg.dist, jnp.float32)
    bf = jnp.float32(cfg.bf)
    depth_limit = jnp.float32(cfg.bf * cfg.th_depth / cfg.fx)
    ocfg = orb.OrbConfig(
        n_features=cfg.n_features, n_levels=cfg.n_levels, scale=cfg.scale_factor,
        fast_threshold=cfg.fast_threshold, fast_min_threshold=cfg.fast_min_threshold,
    )
    f0 = frontend.build_frame_only(
        jnp.asarray(images[0], jnp.float32), jnp.asarray(depths[0], jnp.float32),
        K, dist, bf, jnp.int32(0), ocfg, True,
        cfg.width, cfg.height,
    )
    state = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
    state, kf0, _ = initialization.create_initial_map_depth(state, f0, K)
    f0 = f0._replace(mp=state.kf_mp[0])

    if voc is None and loop_closer is not None:
        voc = loop_closer.vocab
    scan_args = (K, dist, bf, depth_limit, ocfg, cfg.width, cfg.height,
                 int(cfg.fps), False, voc)
    carry = make_carry0(state, f0)

    if chunk is None:
        carry, poses, ok, _, _ = run_sequence_carry(
            jnp.asarray(images[1:], jnp.float32),
            jnp.asarray(depths[1:], jnp.float32), carry, *scan_args
        )
        state = carry.state
    elif loop_closer is None:
        # Chunked scan without loop closing: frames staged per chunk (keeps
        # host/device memory bounded on long sequences).
        pieces_p, pieces_ok = [], []
        n = images.shape[0]
        s = 1
        while s < n:
            e = min(s + chunk, n)
            carry, poses_c, ok_c, _, _ = run_sequence_carry(
                jnp.asarray(images[s:e], jnp.float32),
                jnp.asarray(depths[s:e], jnp.float32), carry, *scan_args
            )
            pieces_p.append(np.asarray(poses_c))
            pieces_ok.append(np.asarray(ok_c))
            s = e
        poses = np.concatenate(pieces_p)
        ok = np.concatenate(pieces_ok)
        state = carry.state
        poses = np.concatenate([np.eye(4, dtype=np.float32)[None], poses])
        ok = np.concatenate([np.ones(1, bool), ok])
        return poses, ok, state
    else:
        if loop_closer.kf_counter == 0:
            # Register the initial keyframe with the BoW database.
            from . import keyframe_database as kdb

            loop_closer.db = kdb.add_keyframe(
                loop_closer.db, loop_closer.vocab, jnp.int32(0),
                state.kf_desc[0], state.kf_kp_valid[0],
            )
            loop_closer.kf_counter = 1
        pieces_p, pieces_ok = [], []
        last_seq = int(jnp.max(jnp.where(state.kf_valid, state.kf_seq, -1)))
        n = images.shape[0]
        s = 1
        while s < n:
            e = min(s + chunk, n)
            carry, poses_c, ok_c, _, _ = run_sequence_carry(
                jnp.asarray(images[s:e], jnp.float32),
                jnp.asarray(depths[s:e], jnp.float32), carry, *scan_args
            )
            # One batched device_get per chunk (each pull is a full tunnel
            # round-trip on remote-attached chips).
            poses_np, ok_np, kf_seq, kf_valid = jax.device_get(
                (poses_c, ok_c, carry.state.kf_seq, carry.state.kf_valid)
            )
            pieces_p.append(poses_np)
            pieces_ok.append(ok_np)
            new = sorted(
                (int(kf_seq[i]), i)
                for i in range(len(kf_seq))
                if kf_valid[i] and kf_seq[i] > last_seq
            )
            if new:
                last_seq = max(seqv for seqv, _ in new)
            state_l = carry.state
            any_closed = False

            # Loop stage: ONE batched add+detect dispatch for the chunk's
            # keyframes (see kdb.add_and_detect_batch), then any accepted
            # closure is applied to the live map.
            triggers = loop_closer.detect_batch(
                state_l, [slot for _, slot in new], int(kf_valid.sum())
            )
            for slot, cand, S12 in triggers:
                state_l = loop_closer.apply_closure(state_l, slot, cand, S12)
                any_closed = True

            if loop_closer.detached_gba:
                # Start/abort/merge the detached GBA (runs overlapped with
                # the next chunk's tracking; merged results re-anchor
                # keyframes born during the solve — see merge_gba_into_live).
                box = _CellBox(state_l)
                merged = loop_closer.service_gba(box)
                state_l = box.state
                any_closed |= merged

            carry = carry._replace(
                state=state_l,
                # The map moved under the motion model after a closure.
                have_velocity=carry.have_velocity & jnp.asarray(not any_closed),
            )
            s = e

        if loop_closer.detached_gba:
            box = _CellBox(carry.state)
            loop_closer.service_gba(box)
            loop_closer.finalize_gba(box)
            carry = carry._replace(state=box.state)
        poses = np.concatenate(pieces_p)
        ok = np.concatenate(pieces_ok)
        state = carry.state
        poses = np.concatenate([np.eye(4, dtype=np.float32)[None], poses])
        ok = np.concatenate([np.ones(1, bool), ok])
        return poses, ok, state

    poses = jnp.concatenate([jnp.eye(4)[None], poses])
    ok = jnp.concatenate([jnp.ones(1, bool), ok])
    return np.asarray(poses), np.asarray(ok), state
