"""SLAM system facade: the host-side state machine + scheduler.

TPU-native replacement for the reference `System` + `Tracking` state machine
(src/System.cc:38-537, src/Tracking.cc:376-649). The host decides *which*
jitted device program runs next (frame-level control flow: initialization vs
motion-model vs reference-KF tracking, keyframe policy); all per-frame math
runs on device with fixed shapes. Local mapping runs synchronously after
keyframe insertion (same semantics as the reference's queue without its
thread races; async dispatch is a planned optimization).

Sensor modes: MONOCULAR, RGBD, STEREO (System eSensor, include/System.h:63-67).
"""

from __future__ import annotations

import enum
import time as _time
from collections import deque
from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, orb, undistort
from ..utils.config import SlamConfig
from ..utils.trajectory import Trajectory
from . import initialization, local_mapping, tracking
from .map_state import MapState, empty_map, update_mp_stats


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class TrackState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


class _Pending(NamedTuple):
    """A dispatched-but-undecided frame on the pipelined online path."""

    res: object  # frontend.FrameResult (device arrays)
    timestamp: float
    frame_id: int
    ref_kf: int  # reference KF the program was dispatched against
    version: int  # MapBox version read at dispatch


@dataclass
class SlamSystem:
    config: SlamConfig
    sensor: Sensor = Sensor.MONOCULAR
    # Async pipeline: local mapping + loop closing run in native worker
    # threads on published map snapshots (the reference's LocalMapping /
    # LoopClosing std::threads, src/System.cc:124-143); tracking never waits
    # for BA. False = synchronous (deterministic; same math).
    async_mapping: bool = False
    # Pipelined tracking (requires async_mapping): per-frame programs are
    # dispatched without waiting for their statistics; the state-machine
    # decision for frame k (keyframe policy, loss handling) is taken when
    # its stats arrive — at most `pipeline_depth` frames later. This removes
    # every per-frame device->host round trip from the hot path (a full
    # tunnel RTT each, ~25 ms measured on the bench host) and matches the
    # reference's own decision latency: its LocalMapping/LoopClosing act on
    # a keyframe thread-asynchronously too (src/System.cc:124-143). In
    # pipelined mode `track_*` returns the CURRENT frame's pose as a device
    # array (np.asarray(it) to materialize — that is where the RTT went).
    pipelined: bool = False
    pipeline_depth: int = 4
    # Pipelining engages only while tracking is HEALTHY (established map +
    # this inlier margin over the reference's 30-inlier OK threshold,
    # src/Tracking.cc:1110-1113): the reference's keyframe decision has zero
    # lag (NeedNewKeyFrame runs in its tracking thread), so during marginal
    # stretches — young map, low inliers — we match that by falling back to
    # synchronous per-frame decisions, and only pipeline when a 2-3 frame
    # decision lag provably cannot cost the track.
    pipeline_min_inliers: int = 60
    # Device mesh for the sharded optimization routes (SURVEY §2.3): when
    # set (or "auto" -> all local devices), the per-keyframe local BA and
    # the loop closer's global BA solve through parallel/dist_ba's
    # psum-sharded LM engine, observations sharded over the mesh, camera
    # system all-reduced over ICI. None = single-device fused solves (the
    # right default on one chip; the GBA route still auto-shards on its
    # own when >1 device is visible, loop_closing.run_global_bundle_adjustment).
    mesh: object = None

    state: TrackState = TrackState.NO_IMAGES_YET
    map: MapState = None
    trajectory: Trajectory = field(default_factory=Trajectory)

    # Tracking context
    last_frame: tracking.FrameData = None
    velocity: np.ndarray = None  # (4,4) Tcw_cur @ Twc_last
    ref_kf: int = 0
    last_kf_frame: int = -1
    frame_id: int = 0
    init_ref: tracking.FrameData = None
    n_kf_host: int = 0

    def __post_init__(self):
        c = self.config
        if self.mesh == "auto":
            from jax.sharding import Mesh as _Mesh

            self.mesh = (
                _Mesh(np.array(jax.devices()), ("obs",))
                if jax.device_count() > 1
                else None
            )
        if self.mesh is not None and getattr(self.mesh, "size", 1) <= 1:
            self.mesh = None
        self.map = empty_map(c.max_keyframes, c.max_map_points, c.n_features)
        self._K = jnp.asarray(c.K, jnp.float32)
        self._dist = jnp.asarray(c.dist, jnp.float32)
        self._bf = jnp.float32(c.bf)
        self._img_wh = jnp.asarray([c.width, c.height], jnp.float32)
        self._orb_cfg = orb.OrbConfig(
            n_features=c.n_features,
            n_levels=c.n_levels,
            scale=c.scale_factor,
            fast_threshold=c.fast_threshold,
            fast_min_threshold=c.fast_min_threshold,
        )
        self._min_frames = 0
        self._max_frames = int(c.fps)
        self._zero_depth = jnp.zeros((c.height, c.width), jnp.float32)
        self._depth_limit = c.bf * c.th_depth / c.fx if c.bf > 0 else 0.0
        self._velocity_dev = jnp.eye(4)
        self._have_velocity = False
        self._init_recognition()
        self._box = None
        self._mapper = None
        self._loops_seen = 0
        self._stream = None
        self._odom_Tcw = None
        self._last_Tcw = None
        self._pending_redirects = []
        self._vo_mode = False  # mbVO analog (src/Tracking.cc:434-501)
        self.n_resets = 0
        # Live pose publication (the TF / nav_msgs::Odometry / PoseStamped
        # surface, src/ros_rgbd.cc:140-198): callbacks invoked once per
        # processed frame with the current pose sample.
        self._pose_listeners = []
        # Pipelined-tracking state (see class docstring fields).
        if self.pipelined and not self.async_mapping:
            raise ValueError("pipelined=True requires async_mapping=True")
        self._pending: deque[_Pending] = deque()
        self._odom_dev = None  # device-side odom chain (pipelined path)
        self._odom_skip_next = False
        self._pipeline_healthy = False
        # EMA of per-frame decay of the tracked-close count, used to
        # anticipate the keyframe trigger by the decision lag (see
        # _need_new_keyframe_stats).
        self._close_decay = 0.0
        self._prev_close = None
        # Transient-dip grace budget (pipelined drain only): frames already
        # in flight when a keyframe trigger lands can dip below the
        # 30-inlier OK bar before the densified keyframe reaches them; up to
        # 2 consecutive such frames ride their stage-2 pose instead of
        # declaring loss (their 15+ gated inliers still pin the pose).
        self._grace_left = 0
        # Rolling per-stage latency metrics (ms) — the FrameDrawer status-bar
        # analog (src/FrameDrawer.cc:132-168); see stats().
        self._metrics = {
            "track": deque(maxlen=512),
            "map": deque(maxlen=128),
            "loop": deque(maxlen=128),
        }
        if self.async_mapping:
            self._start_async()

    def _init_recognition(self):
        """Vocabulary + keyframe database + loop closer (System ctor loads
        the vocabulary and wires LoopClosing, src/System.cc:76-130)."""
        import os

        from ..ops import vocab as vocab_ops
        from . import keyframe_database as kdb
        from .loop_closing import LoopCloser

        path = os.path.join(os.path.dirname(__file__), "..", "data", "vocab.npz")
        if os.path.exists(path):
            self.vocab = vocab_ops.load_vocabulary(np.load(path))
            self.kf_db = kdb.empty_database(
                self.config.max_keyframes, self.config.n_features, self.vocab.n_words
            )
            self.loop_closer = LoopCloser(
                self.vocab, self.kf_db,
                fix_scale=self.sensor != Sensor.MONOCULAR,
                K=self._K, bf=self._bf, mesh=self.mesh,
            )
        else:  # pragma: no cover — vocabulary artifact missing
            self.vocab = None
            self.kf_db = None
            self.loop_closer = None
        self.n_loops_closed = 0
        self.localization_only = False

    def _start_async(self):
        """Spawn the LocalMapping/LoopClosing workers (System ctor thread
        spawns, src/System.cc:124-143)."""
        from . import frontend
        from ..runtime.pipeline import AsyncMapper, MapBox

        self._box = MapBox(self.map)

        def mapping_fn(state, kf_id, allow_ba):
            t0 = _time.perf_counter()
            if self.mesh is not None:
                state, victim, vparent, T_red = frontend.mapping_pipeline_dist(
                    state, jnp.int32(kf_id), self._K, self._bf,
                    jax.random.key(kf_id), self.mesh, voc=self.vocab,
                    allow_ba=allow_ba,
                )
            else:
                state, victim, vparent, T_red = frontend.mapping_pipeline(
                    state, jnp.int32(kf_id), self._K, self._bf,
                    jax.random.key(kf_id), allow_ba, voc=self.vocab,
                )
            v = int(victim)  # blocking fetch: also makes the timing honest
            if v >= 0:
                # Worker thread: queue the trajectory rewrite for the
                # tracking thread (list.append is atomic under the GIL).
                self._pending_redirects.append(
                    (v, int(vparent), np.asarray(T_red))
                )
            self._metrics["map"].append((_time.perf_counter() - t0) * 1e3)
            return state

        loop_fn = None
        loop_service_fn = None
        if self.loop_closer is not None:
            # Async mode detaches GBA from the loop worker's structural lock:
            # the solve runs on its own thread in abortable chunks and merges
            # when done (the reference's detached GBA thread,
            # src/LoopClosing.cc:588).
            self.loop_closer.enable_detached_gba()

            def loop_fn(snapshot, kf_id):
                # Detection on the snapshot, lock-free; returns the closure
                # application (run under the structural lock) or None.
                t0 = _time.perf_counter()
                trig = self.loop_closer.detect_loop(
                    snapshot, int(kf_id), self.n_kf_host
                )
                self._metrics["loop"].append((_time.perf_counter() - t0) * 1e3)
                if trig is None:
                    return None
                cand, S12 = trig

                def apply(state):
                    return self.loop_closer.apply_closure(
                        state, int(kf_id), cand, S12
                    )

                return apply

            def loop_service_fn():
                self.loop_closer.service_gba(self._box)

        self._mapper = AsyncMapper(
            self._box, mapping_fn, loop_fn=loop_fn,
            loop_service_fn=loop_service_fn,
        )

    def _refresh_from_box(self):
        if self._box is not None:
            self.map, self._map_version = self._box.read()

    def flush(self):
        """Resolve every in-flight pipelined frame (blocking). Called
        automatically by shutdown/save/export APIs."""
        if self._pending:
            self._drain_pending(force=True)

    def shutdown(self, drain: bool = True):
        """Stop workers after draining their queues (System::Shutdown
        barrier, src/System.cc:570-596) and adopt the final map."""
        if self._pending:
            self._drain_pending(force=True)
        if self._mapper is not None:
            self._mapper.shutdown(drain=drain)
            if self.loop_closer is not None:
                # Let a detached GBA finish and fold in (System::Shutdown
                # waits for the GBA thread, src/System.cc:570-596).
                self.loop_closer.finalize_gba(self._box)
            self.map, _ = self._box.read()
            self.n_loops_closed = self._mapper.n_loops
            self._mapper = None
            self._box = None
        if self._stream is not None:
            self._stream.close()
            self._stream = None

    # ------------------------------------------------------------------
    # Multi-session server connection (StreamThread / ReceiveMapCallback)
    # ------------------------------------------------------------------
    def connect_server(self, host: str, port: int, client_id: int):
        """Stream this session's keyframes/points to a MapServerNode
        (SendClassToServer hookup, src/System.cc:141-143)."""
        from ..parallel.stream import StreamClient

        self._stream = StreamClient(host, port, client_id)

    def fetch_server_map(self, merge_with: int | None = None):
        """Pull the server's (optionally merged) map and hot-swap it in —
        the CLIENT_MAP<cid> / ReceiveMapCallback path (src/System.cc:
        1003-1066). Starts tracking in LOST state for relocalization."""
        self._adopt_map_bytes(self._stream.request_map(merge_with=merge_with))

    def poll_server_push(self) -> bool:
        """Check for an operator-initiated map push and hot-swap it in
        (the CREATE_MAP_REQUEST/SendMap/ReceiveMapCallback path triggered by
        the server operator's Send, src/ServerViewer.cc:132-137). Called
        automatically at keyframe cadence while connected; returns True if a
        map was adopted."""
        if self._stream is None:
            return False
        payload = self._stream.poll_push()
        if payload is None:
            return False
        self._adopt_map_bytes(payload)
        return True

    def _adopt_map_bytes(self, payload: bytes):
        import io as _io

        from ..utils import serialization

        self.map, meta = serialization.load_map(_io.BytesIO(payload))
        self.ref_kf = int(meta.get("ref_kf", 0))
        self.n_kf_host = int(meta.get("n_kf_host", int(self.map.n_kf)))
        self.state = TrackState.LOST
        self._have_velocity = False
        self._last_Tcw = None
        self.last_frame = None
        if self.vocab is not None:
            self.loop_closer.db = serialization.rebuild_database(
                self.map, self.vocab, self.config.max_keyframes,
                self.config.n_features,
            )
        self._publish_fresh_map()

    # ------------------------------------------------------------------
    # Frame construction
    # ------------------------------------------------------------------
    def _make_frame(self, gray, depth=None) -> tracking.FrameData:
        """Extract ORB + undistort + (RGB-D) depth lookup — the Frame ctor
        analog (src/Frame.cc:61-228)."""
        feats = orb.extract_orb(jnp.asarray(gray, jnp.float32), self._orb_cfg)
        xy_u = undistort.undistort_points(feats.xy, self._K, self._dist)
        if depth is not None:
            dmap = jnp.asarray(depth, jnp.float32)
            xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 1, self.config.width - 2)
            yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 1, self.config.height - 2)
            # 3x3 neighborhood: reject depth at occlusion edges. Corners
            # cluster on object silhouettes where a 1px localization error
            # flips the sample to the background surface — measured to bias
            # the stereo residuals enough to run the pose away. (The
            # reference samples the center pixel only, src/Frame.cc:658-679.)
            patch = jnp.stack(
                [dmap[yi + dy, xi + dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                axis=-1,
            )
            d = dmap[yi, xi]
            spread = jnp.max(patch, -1) - jnp.min(patch, -1)
            edge_ok = (jnp.min(patch, -1) > 0) & (spread < 0.1 * jnp.maximum(d, 1e-6))
            d = jnp.where(edge_ok, d, -1.0)
            ur = jnp.where(d > 0, xy_u[:, 0] - self._bf / jnp.maximum(d, 1e-6), -1.0)
        else:
            d = jnp.full(feats.xy.shape[0], -1.0, jnp.float32)
            ur = jnp.full(feats.xy.shape[0], -1.0, jnp.float32)
        return tracking.FrameData(
            xy=xy_u,
            level=feats.level,
            angle=feats.angle,
            desc=feats.desc,
            desc_pm1=feats.desc_pm1,
            kp_valid=feats.valid,
            ur=ur,
            depth=d,
            pose=jnp.eye(4),
            mp=jnp.full(feats.xy.shape[0], -1, jnp.int32),
            frame_id=jnp.int32(self.frame_id),
        )

    # ------------------------------------------------------------------
    # Public per-frame entry points (System::TrackMonocular/TrackRGBD)
    # ------------------------------------------------------------------
    def track_monocular(self, img, timestamp: float):
        t0 = _time.perf_counter()
        out = self._step(img, None, timestamp)
        self._metrics["track"].append((_time.perf_counter() - t0) * 1e3)
        return out

    def track_rgbd(self, img, depth, timestamp: float):
        t0 = _time.perf_counter()
        out = self._step(img, depth, timestamp)
        self._metrics["track"].append((_time.perf_counter() - t0) * 1e3)
        return out

    def track_stereo(self, img_left, img_right, timestamp: float):
        """Stereo entry point (System::TrackStereo, src/System.cc:365-423):
        builds the frame from the rectified pair, then shares the RGB-D
        tracking path (ur/depth filled from disparity)."""
        from . import frontend

        t0 = _time.perf_counter()
        c = self.config
        frame = frontend.build_frame_stereo(
            jnp.asarray(img_left, jnp.float32), jnp.asarray(img_right, jnp.float32),
            self._K, self._dist, self._bf, jnp.int32(self.frame_id),
            self._orb_cfg, c.width, c.height,
        )
        out = self._step_built(frame, timestamp)
        self._metrics["track"].append((_time.perf_counter() - t0) * 1e3)
        return out

    def _step(self, img, depth, timestamp: float):
        """Fused per-frame path: one device dispatch per tracked frame (see
        frontend.py) + one batched stats pull (sync mode) or a deferred
        async pull (pipelined mode)."""
        from . import frontend

        if self._pending:
            self._drain_pending()
            if self._pending and not self._pipelining_active():
                # Health dropped (or loss): resolve everything in flight so
                # the synchronous path below sees ordered, settled state.
                self._drain_pending(force=True)
        c = self.config
        has_depth = depth is not None
        img_j = jnp.asarray(img, jnp.float32)
        depth_j = (
            jnp.asarray(depth, jnp.float32) if has_depth else self._zero_depth
        )

        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            frame = frontend.build_frame_only(
                img_j, depth_j, self._K, self._dist, self._bf,
                jnp.int32(self.frame_id), self._orb_cfg, has_depth, c.width, c.height,
            )
            self.state = TrackState.NOT_INITIALIZED
            ok = self._initialize(frame)
            self.frame_id += 1
            if not ok:
                return None
            self.state = TrackState.OK
            self._velocity_dev = jnp.eye(4)
            self._have_velocity = False
            self._record(timestamp, self.last_frame.pose)
            out = np.asarray(self.last_frame.pose)
            self._publish_pose(timestamp, out)
            return out

        if self.last_frame is None:
            # Fresh map load: no prior frame; seed with an empty one so the
            # fused program can run (it will fall through to relocalization).
            self.last_frame = frontend.build_frame_only(
                img_j, depth_j, self._K, self._dist, self._bf,
                jnp.int32(self.frame_id), self._orb_cfg, has_depth,
                c.width, c.height,
            )

        self._refresh_from_box()
        fn = frontend.process_frame_shared if self.async_mapping else frontend.process_frame
        res = fn(
            self.map, img_j, depth_j, self.last_frame,
            self._velocity_dev, jnp.asarray(self._have_velocity),
            jnp.int32(self.ref_kf), self._K, self._dist, self._bf,
            jnp.float32(self._depth_limit), jnp.int32(self.frame_id),
            self._orb_cfg, has_depth, c.width, c.height,
            self.sensor == Sensor.MONOCULAR, self.vocab,
            vo_points=self._vo_points_enabled(),
        )
        if self._pipelining_active():
            return self._enqueue_pending(res, timestamp)
        return self._handle_result(res, timestamp)

    def _vo_points_enabled(self) -> bool:
        """Temporal VO points (mbVO, src/Tracking.cc:434-501): localization
        mode on a depth-capable sensor."""
        return self.localization_only and self.sensor != Sensor.MONOCULAR

    def _step_built(self, frame, timestamp: float):
        """Shared tracking for a pre-built frame (stereo path)."""
        from . import frontend

        if self._pending:
            self._drain_pending()
            if self._pending and not self._pipelining_active():
                self._drain_pending(force=True)
        c = self.config
        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            self.state = TrackState.NOT_INITIALIZED
            ok = self._initialize(frame)
            self.frame_id += 1
            if not ok:
                return None
            self.state = TrackState.OK
            self._velocity_dev = jnp.eye(4)
            self._have_velocity = False
            self._record(timestamp, self.last_frame.pose)
            out = np.asarray(self.last_frame.pose)
            self._publish_pose(timestamp, out)
            return out
        if self.last_frame is None:
            self.last_frame = frame
        self._refresh_from_box()
        fn = frontend.track_frame_shared if self.async_mapping else frontend.track_frame
        res = fn(
            self.map, frame, self.last_frame,
            self._velocity_dev, jnp.asarray(self._have_velocity),
            jnp.int32(self.ref_kf), self._K, self._bf,
            jnp.float32(self._depth_limit), c.width, c.height,
            self.sensor == Sensor.MONOCULAR, self.vocab,
            vo_points=self._vo_points_enabled(),
        )
        if self._pipelining_active():
            return self._enqueue_pending(res, timestamp)
        return self._handle_result(res, timestamp)

    # ------------------------------------------------------------------
    # Pipelined online tracking (the zero-round-trip hot path)
    # ------------------------------------------------------------------
    def _pipelining_active(self) -> bool:
        return (
            self.pipelined
            and self._box is not None
            and self.state == TrackState.OK
            and not self.localization_only
            and self._pipeline_healthy
        )

    def _update_health(self, tracked_ok: bool, stats):
        self._pipeline_healthy = (
            bool(tracked_ok)
            and stats[1] >= self.pipeline_min_inliers
            and self.n_kf_host >= 5
        )

    def _enqueue_pending(self, res, timestamp: float):
        """Dispatch accounting for a pipelined frame: start the async stats
        copy, chain the device-side tracking context, defer all decisions."""
        res.stats.copy_to_host_async()
        self._pending.append(
            _Pending(res, timestamp, self.frame_id, self.ref_kf, self._map_version)
        )
        self.last_frame = res.frame
        self._velocity_dev = res.velocity
        self._have_velocity = True
        self.frame_id += 1
        return res.pose

    def _drain_pending(self, force: bool = False):
        """Resolve decisions for dispatched frames whose stats have arrived;
        block only when the in-flight window is full (or force=True)."""
        while self._pending:
            must = force or len(self._pending) > self.pipeline_depth
            if not must and not self._pending[0].res.stats.is_ready():
                break
            e = self._pending.popleft()
            if not self._process_pending(e):
                # Loss/reset: every later in-flight frame tracked against a
                # broken chain — record them lost and flush.
                for later in self._pending:
                    self.trajectory.append_rel(
                        later.timestamp, later.ref_kf, np.eye(4), lost=True
                    )
                    self._publish_pose(later.timestamp, None)
                self._pending.clear()
                break

    def _process_pending(self, e: _Pending) -> bool:
        """Deferred decision half of the per-frame step (the sync path's
        _handle_result_impl, minus everything already chained at dispatch).
        Returns False when the pipeline must flush (loss or reset)."""
        stats = np.asarray(e.res.stats)  # ready (or blocks the tail of RTT)
        while self._pending_redirects:
            self._apply_cull(*self._pending_redirects.pop(0))
        # Advisory visibility-stats publish: only meaningful if nothing
        # (including our own later publishes) landed since dispatch.
        self._box.publish(e.res.state, expected_version=e.version)
        self.map, self._map_version = self._box.read()
        if self._mapper.n_loops != self._loops_seen:
            # A loop closed in the background: frames in flight straddle the
            # map jump; invalidate the motion model and keep the odom chain
            # from absorbing the discontinuity.
            self._loops_seen = self.n_loops_closed = self._mapper.n_loops
            self._have_velocity = False
            self._odom_skip_next = True
        self._mapper.raise_worker_errors()

        tracked_ok = stats[0] > 0
        self._update_health(tracked_ok, stats)
        # Tracked-close decay estimate (for keyframe-trigger anticipation).
        if tracked_ok:
            if self._prev_close is not None:
                self._close_decay = 0.7 * self._close_decay + 0.3 * max(
                    0.0, self._prev_close - float(stats[4])
                )
            self._prev_close = float(stats[4])
        else:
            self._prev_close = None
        if tracked_ok:
            self._grace_left = 2
        elif stats[1] >= 15 and self._grace_left > 0:
            # Transient dip: bridge on the stage-2 pose (see _grace_left).
            self._grace_left -= 1
            self.trajectory.append_rel(e.timestamp, e.ref_kf, e.res.T_rel)
            if self._odom_dev is None and self._odom_Tcw is not None:
                self._odom_dev = jnp.asarray(self._odom_Tcw, jnp.float32)
            if self._odom_dev is None:
                self._odom_dev = e.res.pose
            elif self._odom_skip_next:
                self._odom_skip_next = False
            else:
                self._odom_dev = _odom_step(self._odom_dev, e.res.velocity)
            self._publish_pose(e.timestamp, e.res.pose)
            return True
        if not tracked_ok:
            self.trajectory.append_rel(
                e.timestamp, e.ref_kf, np.eye(4), lost=True
            )
            self._publish_pose(e.timestamp, None)
            # Mirror the sync loss policy: immediate relocalization attempt
            # on this frame's features, else auto-reset / LOST.
            if self.loop_closer is not None:
                from . import relocalization

                ok_r, Tcw_r, frame_mp, ref = relocalization.relocalize(
                    self.map, self.loop_closer.db, self.vocab, e.res.frame,
                    self._K, self._bf, e.frame_id,
                )
                if ok_r:
                    self.ref_kf = ref
                    self.last_frame = e.res.frame._replace(pose=Tcw_r, mp=frame_mp)
                    self._have_velocity = False
                    self._odom_skip_next = True
                    self._record(e.timestamp, Tcw_r)
                    return False  # flush in-flight frames; chain re-anchored
            self._sync_odom_from_device()
            if self.n_kf_host <= 5:
                self.reset()
            else:
                self.state = TrackState.LOST
                self._have_velocity = False
                self._last_Tcw = None
            return False

        self.trajectory.append_rel(e.timestamp, e.ref_kf, e.res.T_rel)
        # Device-side odom chain (no host fetch; see _update_odom).
        if self._odom_dev is None and self._odom_Tcw is not None:
            self._odom_dev = jnp.asarray(self._odom_Tcw, jnp.float32)
        if self._odom_dev is None:
            self._odom_dev = e.res.pose
        elif self._odom_skip_next:
            self._odom_skip_next = False
        else:
            self._odom_dev = _odom_step(self._odom_dev, e.res.velocity)
        self._publish_pose(e.timestamp, e.res.pose)

        if self._need_new_keyframe_stats(
            stats, frame_id=e.frame_id, lag=len(self._pending) + 1
        ):
            # Insert the NEWEST tracked frame, not the decided (stale) one:
            # the reference's CreateNewKeyFrame uses mCurrentFrame
            # (src/Tracking.cc:1206) — under decision lag the newest frame's
            # view is what the map must cover to keep the next frames fed.
            newest = (
                self._pending[-1].res.frame if self._pending else self.last_frame
            )
            self._insert_keyframe_async(newest)
        return True

    def _handle_result(self, res, timestamp: float):
        out = self._handle_result_impl(res, timestamp)
        self._publish_pose(timestamp, out)
        return out

    def _handle_result_impl(self, res, timestamp: float):
        # The single per-frame sync point: ONE batched transfer for every
        # host-needed output (a second/third np.asarray later in this method
        # would each pay a full tunnel round trip, ~25 ms measured).
        stats, pose_np, T_rel_np = jax.device_get(
            (res.stats, res.pose, res.T_rel)
        )
        while self._pending_redirects:
            self._apply_cull(*self._pending_redirects.pop(0))
        if self._box is not None:
            # Advisory: visibility stats lose the race against structural
            # (mapping/loop) updates; next frame re-reads the box.
            self._box.publish(res.state, expected_version=self._map_version)
            self.map, self._map_version = self._box.read()
            if self._mapper.n_loops != self._loops_seen:
                # A loop closed in the background: the map moved under the
                # motion model (CorrectLoop's map-update mutex analog).
                self._loops_seen = self.n_loops_closed = self._mapper.n_loops
                self._have_velocity = False
                self._last_Tcw = None  # odom frame must not absorb the jump
            self._mapper.raise_worker_errors()
        else:
            self.map = res.state
        tracked_ok = stats[0] > 0
        n_inliers = int(stats[1])
        self._update_health(tracked_ok, stats)

        # mbVO localization fallback (src/Tracking.cc:434-501): in
        # localization-only mode, when the local map no longer supports the
        # pose but frame-to-frame odometry still does, keep emitting the
        # odometry pose ("visual odometry" mode) and try to re-anchor via
        # relocalization every frame; a successful reloc ends VO mode.
        if self.localization_only and not tracked_ok and stats[8] >= 20:
            self._vo_mode = True
            if self.loop_closer is not None:
                from . import relocalization

                ok_r, Tcw_r, frame_mp, ref = relocalization.relocalize(
                    self.map, self.loop_closer.db, self.vocab, res.frame,
                    self._K, self._bf, self.frame_id,
                )
                if ok_r:
                    self._vo_mode = False
                    self.state = TrackState.OK
                    self.ref_kf = ref
                    self.last_frame = res.frame._replace(pose=Tcw_r, mp=frame_mp)
                    self._have_velocity = False
                    self._last_Tcw = None
                    self.frame_id += 1
                    self._record(timestamp, Tcw_r)
                    self._update_odom(np.asarray(Tcw_r))
                    return np.asarray(Tcw_r)
            # Ride the motion model (the reference's mbVO=true branch).
            self.state = TrackState.OK
            self._velocity_dev = res.velocity
            self._have_velocity = True
            self.last_frame = res.frame
            self.trajectory.append_rel(timestamp, self.ref_kf, T_rel_np)
            self._update_odom(pose_np)
            self.frame_id += 1
            return pose_np
        if tracked_ok:
            self._vo_mode = False

        if not tracked_ok:
            # Relocalization attempt (Tracking::Relocalization on LOST,
            # src/Tracking.cc:429,1486).
            if self.loop_closer is not None:
                from . import relocalization

                ok_r, Tcw_r, frame_mp, ref = relocalization.relocalize(
                    self.map, self.loop_closer.db, self.vocab, res.frame,
                    self._K, self._bf, self.frame_id,
                )
                if ok_r:
                    self.state = TrackState.OK
                    self.ref_kf = ref
                    self.last_frame = res.frame._replace(pose=Tcw_r, mp=frame_mp)
                    self._have_velocity = False
                    # Re-seed the odom chain: the relocalization pose is
                    # discontinuous with the pre-loss pose, so the first
                    # post-reloc frame must not apply a diff (the reference
                    # skips the diff when mLastFrame.mTcw is empty,
                    # src/Tracking.cc:548).
                    self._last_Tcw = None
                    self.frame_id += 1
                    self._record(timestamp, Tcw_r)
                    self._update_odom(np.asarray(Tcw_r))
                    return np.asarray(Tcw_r)
            # Early-loss auto-reset (src/Tracking.cc:614-622): losing track
            # right after initialization means the young map is bad — wipe
            # it and re-initialize instead of relocalizing against garbage.
            if (
                not self.localization_only
                and self.n_kf_host <= 5
                and self.state == TrackState.OK
            ):
                self.reset()
                return None
            self.state = TrackState.LOST
            self._have_velocity = False
            self._last_Tcw = None  # odom chain must not bridge the gap
            self.frame_id += 1
            self.trajectory.append_rel(
                timestamp, self.ref_kf, np.eye(4), lost=True
            )
            return None

        self.state = TrackState.OK
        self._velocity_dev = res.velocity
        self._have_velocity = True
        self.trajectory.append_rel(timestamp, self.ref_kf, T_rel_np)
        self.last_frame = res.frame
        self._update_odom(pose_np)

        if not self.localization_only and self._need_new_keyframe_stats(stats):
            if self.async_mapping:
                self._insert_keyframe_async(res.frame)
                self.last_frame = res.frame._replace(
                    mp=self.map.kf_mp[jnp.int32(self.ref_kf)]
                )
            else:
                self._insert_keyframe_fused(res.frame)
                # Mapping (cull/fuse) may have merged or killed points: re-read
                # this frame's associations from its own keyframe row (the
                # reference's shared-pointer MapPoint::Replace semantics).
                self.last_frame = res.frame._replace(
                    mp=self.map.kf_mp[jnp.int32(self.ref_kf)]
                )
                # Loop pipeline (the LoopClosing thread body) after insertion.
                if self.loop_closer is not None:
                    self.map, closed = self.loop_closer.on_keyframe(
                        self.map, self.ref_kf, self.n_kf_host
                    )
                    if closed:
                        self.n_loops_closed += 1
                        # The map moved under us: invalidate the motion model.
                        self._have_velocity = False
                        self._last_Tcw = None  # odom frame must not absorb the jump
        self.frame_id += 1
        return pose_np

    # ------------------------------------------------------------------
    # Live pose publication (ROS TF/Odometry/PoseArray analog,
    # src/ros_rgbd.cc:140-198,444-513).
    def add_pose_listener(self, fn):
        """Register fn(sample: dict) called after EVERY processed frame with
        {"timestamp", "Tcw" (4,4) | None, "odom" (4,4) | None,
        "state": TrackState, "n_kf", "n_loops"} — the per-frame publication
        the reference pushes on /tf, /VisualOdometry and the stamped pose
        topics."""
        self._pose_listeners.append(fn)

    def _publish_pose(self, timestamp, Tcw):
        if not self._pose_listeners:
            return
        sample = {
            "timestamp": timestamp,
            "Tcw": None if Tcw is None else np.asarray(Tcw),
            "odom": self.odom_pose,
            "state": self.state,
            "n_kf": self.n_kf_host,
            "n_loops": self.n_loops_closed,
        }
        for fn in self._pose_listeners:
            fn(sample)

    # ------------------------------------------------------------------
    # Per-stage runtime metrics (the FrameDrawer status-bar analog,
    # src/FrameDrawer.cc:132-168: state + KFs + MPs + matches surface).
    def stats(self) -> dict:
        """Rolling runtime/health snapshot: per-stage latency percentiles
        (ms) over recent windows, map/loop counters and the track state.
        Cheap (no device fetch); printed at interval by run_slam.py."""

        def pct(xs, q):
            return float(np.percentile(np.asarray(xs), q)) if xs else None

        gba = (
            list(self.loop_closer.gba_runner.solve_ms)
            if self.loop_closer is not None
            and self.loop_closer.gba_runner is not None
            else []
        )
        return {
            "state": self.state.name,
            "track_ms_p50": pct(self._metrics["track"], 50),
            "track_ms_p90": pct(self._metrics["track"], 90),
            "map_ms_p50": pct(self._metrics["map"], 50),
            "loop_ms_p50": pct(self._metrics["loop"], 50),
            "gba_ms_last": gba[-1] if gba else None,
            "n_kf": self.n_kf_host,
            "n_loops": self.n_loops_closed,
            "n_frames": self.frame_id,
            "n_resets": self.n_resets,
            "in_flight": len(self._pending),
            "ba_skipped": self._mapper.n_ba_skipped if self._mapper else 0,
        }

    # ------------------------------------------------------------------
    def warmup(self, gba_buckets=(16, 32, 64), fuse_buckets=((16, 4096),),
               verbose: bool = False):
        """Pre-compile every device program an online run can reach, on
        dummy inputs of the production shapes, so no frame ever pays an XLA
        compile mid-sequence (compiles measured at 5-35 s each; an unwarmed
        keyframe/loop/GBA shape bucket shows up as a multi-second latency
        spike — the reference has no analog because C++ has no JIT, so
        real-time parity REQUIRES this).

        `gba_buckets`: live-keyframe compile buckets the detached GBA may
        reach (powers of two up to max_keyframes). `fuse_buckets`:
        (fuse_kfs, mp_cap) ladder for the post-loop SearchAndFuse. Walk more
        rungs for long runs; each rung is one extra compile."""
        import time as _t

        from ..ops import ba as ba_ops
        from . import frontend, initialization as init_mod
        from . import keyframe_database as kdb
        from . import local_mapping
        from . import loop_closing as lc_mod
        from .map_state import refresh_covis

        c = self.config
        K, dist, bf = self._K, self._dist, self._bf
        depth_limit = jnp.float32(
            self._depth_limit if self.sensor != Sensor.MONOCULAR else 0.0
        )
        mono = self.sensor == Sensor.MONOCULAR
        has_depth = self.sensor == Sensor.RGBD
        img = jnp.zeros((c.height, c.width), jnp.float32)
        depth = jnp.ones((c.height, c.width), jnp.float32)
        eye = jnp.eye(4)

        def fresh():
            return empty_map(c.max_keyframes, c.max_map_points, c.n_features)

        steps: list[tuple[str, object]] = []

        # -- frame build + fused tracking (both dispatch variants) ---------
        if self.sensor == Sensor.STEREO:
            steps.append((
                "build_frame_stereo",
                lambda: frontend.build_frame_stereo(
                    img, img, K, dist, bf, jnp.int32(0), self._orb_cfg,
                    c.width, c.height,
                ),
            ))
        steps.append((
            "build_frame_only",
            lambda: frontend.build_frame_only(
                img, depth, K, dist, bf, jnp.int32(0), self._orb_cfg,
                has_depth, c.width, c.height,
            ),
        ))

        def frame_dummy():
            # Use the SENSOR'S OWN frame builder: a frame from a different
            # builder can differ in weak-typing and miss the jit cache,
            # recompiling every downstream program on the first real frame.
            if self.sensor == Sensor.STEREO:
                return frontend.build_frame_stereo(
                    img, img, K, dist, bf, jnp.int32(0), self._orb_cfg,
                    c.width, c.height,
                )
            return frontend.build_frame_only(
                img, depth, K, dist, bf, jnp.int32(0), self._orb_cfg,
                has_depth, c.width, c.height,
            )

        def warm_track():
            frame = frame_dummy()
            if self.sensor == Sensor.STEREO:
                fn = (
                    frontend.track_frame_shared
                    if self.async_mapping
                    else frontend.track_frame
                )
                return fn(
                    fresh(), frame, frame, eye, jnp.asarray(True), jnp.int32(0),
                    K, bf, depth_limit, c.width, c.height, mono, self.vocab,
                    vo_points=False,
                )
            fn = (
                frontend.process_frame_shared
                if self.async_mapping
                else frontend.process_frame
            )
            return fn(
                fresh(), img, depth, frame, eye, jnp.asarray(True),
                jnp.int32(0), K, dist, bf, depth_limit, jnp.int32(1),
                self._orb_cfg, has_depth, c.width, c.height, mono,
                self.vocab, vo_points=False,
            )

        steps.append(("fused_tracking", warm_track))

        # -- initialization (depth sensors) --------------------------------
        if self.sensor != Sensor.MONOCULAR:
            steps.append((
                "init_map_depth",
                lambda: init_mod.create_initial_map_depth(fresh(), frame_dummy(), K),
            ))

        # -- keyframe insertion + mapping round ----------------------------
        if self.async_mapping:
            steps.append((
                "append_keyframe",
                lambda: frontend.append_keyframe_only(
                    fresh(), frame_dummy(), K, bf, depth_limit
                ),
            ))
        else:
            steps.append((
                "insert_keyframe_fused",
                lambda: frontend.insert_keyframe_fused(
                    fresh(), frame_dummy(), K, bf, depth_limit,
                    jax.random.key(0), self.vocab,
                ),
            ))
        for allow_ba in (True, False):
            steps.append((
                f"mapping_pipeline(ba={allow_ba})",
                lambda allow_ba=allow_ba: frontend.mapping_pipeline(
                    fresh(), jnp.int32(0), K, bf, jax.random.key(0),
                    allow_ba, voc=self.vocab,
                ),
            ))
        steps.append((
            "cull_force",
            lambda: local_mapping.cull_keyframes(fresh(), jnp.int32(0), force=True),
        ))

        # -- loop pipeline -------------------------------------------------
        if self.loop_closer is not None:
            dummy_db = kdb.empty_database(
                c.max_keyframes, c.n_features, self.vocab.n_words
            )
            s0 = fresh()
            steps.append((
                "db_add",
                lambda: kdb.add_keyframe_from_state(
                    dummy_db, self.vocab, s0, jnp.int32(0)
                ),
            ))
            steps.append((
                "db_add_and_detect",
                lambda: kdb.add_and_detect(dummy_db, self.vocab, s0, jnp.int32(0)),
            ))
            steps.append((
                "compute_sim3",
                lambda: lc_mod.compute_sim3(
                    s0, jnp.int32(0), jnp.int32(1), K, jax.random.key(0),
                    fix_scale=self.sensor != Sensor.MONOCULAR, voc=self.vocab,
                ),
            ))
            steps.append((
                "correct_loop",
                lambda: lc_mod.correct_loop(fresh(), jnp.int32(1), jnp.int32(0), eye),
            ))
            steps.append(("fuse_sizes", lambda: lc_mod._fuse_sizes(
                s0, jnp.int32(0), jnp.int32(1))))
            for fk, mc in fuse_buckets:
                steps.append((
                    f"search_and_fuse({fk},{mc})",
                    lambda fk=fk, mc=mc: lc_mod.search_and_fuse(
                        fresh(), jnp.int32(1), jnp.int32(0), K,
                        fuse_kfs=fk, mp_cap=mc,
                    ),
                ))
            steps.append(("refresh_covis", lambda: refresh_covis(fresh())))

            chunk = (
                self.loop_closer.gba_runner.chunk_iters
                if self.loop_closer.gba_runner is not None
                else 3
            )
            cg = (
                self.loop_closer.gba_runner.cg_iters
                if self.loop_closer.gba_runner is not None
                else 32
            )

            def warm_gba(kb):
                prob, slots, used = lc_mod.build_global_ba_problem_compact(
                    s0, K, bf, kb
                )
                outs = []
                for robust in (True, False):
                    outs.append(ba_ops.ba_step_count_lam(
                        prob, jnp.float32(1e-4), iters=chunk, cg_iters=cg,
                        robust=robust,
                    ))
                prob2 = ba_ops.classify_outliers(prob)
                poses_full, fixed_full = lc_mod.expand_gba_result(
                    s0.kf_pose, prob2.poses, prob2.cam_fixed, slots, used
                )
                merged = lc_mod.merge_gba_into_live(
                    fresh(), s0.kf_seq, s0.kf_valid, s0.mp_first_seq,
                    s0.mp_valid, poses_full, prob2.points, fixed_full,
                )
                return outs, merged

            for kb in gba_buckets:
                if kb <= c.max_keyframes:
                    steps.append((f"gba_chunk(kb={kb})", lambda kb=kb: warm_gba(kb)))

            # Relocalization solvers (fire on any marginal frame; unwarmed
            # they cost a multi-second compile exactly when the track is
            # struggling).
            from ..ops import vocab as vocab_ops
            from . import relocalization as reloc_mod

            def warm_reloc():
                fr = frame_dummy()
                words = vocab_ops.assign_words(self.vocab, fr.desc_pm1)
                out1 = kdb.detect_reloc_candidates(
                    dummy_db, s0, words, fr.kp_valid, self.vocab.word_weight
                )
                out2 = reloc_mod._match_and_pnp(
                    s0, fr, jnp.int32(0), K, bf, jax.random.key(0)
                )
                return out1, out2

            steps.append(("relocalize", warm_reloc))

        steps.append(("odom_step", lambda: _odom_step(eye, eye)))

        # Tiny eager programs the host path touches (each first use is a
        # fresh XLA compile + tunnel round trip): keypoint-count reduce,
        # dynamic keyframe-row gathers, bool/scalar constants.
        def warm_eager():
            fr = frame_dummy()
            int(fr.kp_valid.sum())
            s = fresh()
            jax.block_until_ready(s.kf_mp[jnp.int32(0)])
            jax.block_until_ready(s.kf_pose[jnp.int32(0)])
            return jnp.asarray(True), jnp.asarray(False)

        steps.append(("eager_bits", warm_eager))

        def force(out):
            # block_until_ready is advisory on tunnel-attached backends
            # (returns at enqueue); a real element fetch is the only barrier
            # that guarantees the dummy execution finished — without it the
            # first real frame queues behind the whole warmup backlog.
            # Fetch from the LAST leaf: the device executes programs in
            # order, so one element of the last dispatched output is a
            # barrier for the whole thunk.
            for leaf in reversed(jax.tree.leaves(out)):
                if hasattr(leaf, "ravel") and leaf.size:
                    np.asarray(jax.device_get(leaf.ravel()[:1]))
                    return

        for name, thunk in steps:
            t0 = _t.perf_counter()
            try:
                force(thunk())
            except Exception as exc:  # pragma: no cover — warmup best-effort
                if verbose:
                    print(f"warmup {name}: FAILED {exc!r}")
                continue
            if verbose:
                print(f"warmup {name}: {_t.perf_counter() - t0:.1f}s", flush=True)

    def activate_localization_mode(self):
        """Tracking-only mode: no new keyframes or map mutation
        (System::ActivateLocalizationMode, src/System.cc:539-547)."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """Clear the map and restart (System::Reset -> Tracking::Reset,
        src/Tracking.cc:1650-1698)."""
        c = self.config
        self.map = empty_map(c.max_keyframes, c.max_map_points, c.n_features)
        self.state = TrackState.NO_IMAGES_YET
        self.last_frame = None
        self.init_ref = None
        self.ref_kf = 0
        self.n_kf_host = 0
        self.last_kf_frame = -1
        self._have_velocity = False
        self._last_Tcw = None
        self._pending_redirects = []
        self._pending.clear()
        self._odom_dev = None
        self._odom_skip_next = False
        self._vo_mode = False
        self.n_resets += 1
        self.trajectory = Trajectory()
        if (
            self.loop_closer is not None
            and self.loop_closer.gba_runner is not None
        ):
            # Abort any detached solve before discarding the old closer.
            self.loop_closer.gba_runner.abort()
            self.loop_closer.gba_runner.join()
        self._init_recognition()
        if self._mapper is not None:
            self._mapper.shutdown(drain=False)
            self._mapper = None
            self._box = None
        self._loops_seen = 0
        if self.async_mapping:
            self._start_async()

    def _need_new_keyframe_stats(
        self, stats, frame_id: int | None = None, lag: int = 0
    ) -> bool:
        """NeedNewKeyFrame on the fused stats vector (same thresholds as
        src/Tracking.cc:1120-1204). `frame_id` defaults to the current frame
        (sync path); the pipelined path passes the decided frame's own id
        and the decision `lag` (frames dispatched since this one). The
        tracked-close trigger is anticipated by lag x the measured per-frame
        decay: by the time a lagged decision lands, the view has rotated
        `lag` frames further — without the anticipation a fast sweep decays
        through the <100 threshold to zero inliers before the densified
        keyframe can help (observed on the orbit bench)."""
        n_inliers = stats[1]
        ref_matches = stats[3]
        frames_since = (
            self.frame_id if frame_id is None else frame_id
        ) - self.last_kf_frame
        ref_ratio = 0.9 if self.sensor == Sensor.MONOCULAR else 0.75
        c1a = frames_since >= self._max_frames
        c1b = frames_since >= max(self._min_frames, 1)
        c2 = (n_inliers < ref_matches * ref_ratio) and n_inliers > 15
        anticipate = lag * self._close_decay
        need_close = (
            self.sensor != Sensor.MONOCULAR
            and self.config.bf > 0
            and stats[4] - anticipate < 100
            and stats[5] > 70
        )
        need = (c1b and (c2 or need_close)) or c1a
        if need and self.n_kf_host >= self.config.max_keyframes - 2:
            # Cull-on-full: erase one redundant keyframe so the map keeps
            # adapting on revisits instead of freezing at capacity; the
            # freed slot serves the next insertion.
            self._cull_one()
            return False
        return need

    def _cull_one(self):
        """One KeyFrameCulling round outside the insertion pipeline
        (bounded-memory analog of src/LocalMapping.cc:640-704 on a full map)."""
        if self.async_mapping:
            victim_cell = [None]

            def step(state):
                s2, victim, vparent, T_red = local_mapping.cull_keyframes(
                    state, jnp.int32(self.ref_kf), force=True
                )
                victim_cell[0] = (int(victim), int(vparent), np.asarray(T_red))
                return s2

            self.map = self._box.mutate(step)
            self._map_version = self._box.version
            v, p, T = victim_cell[0]
            self._apply_cull(v, p, T)
        else:
            self.map, victim, vparent, T_red = local_mapping.cull_keyframes(
                self.map, jnp.int32(self.ref_kf), force=True
            )
            self._apply_cull(int(victim), int(vparent), T_red)

    def _insert_keyframe_fused(self, frame):
        from . import frontend

        depth_limit = jnp.float32(
            self._depth_limit if self.sensor != Sensor.MONOCULAR else 0.0
        )
        if self.mesh is not None:
            # Sharded local BA (SlamSystem(mesh=...)): append + split
            # mapping round with the window solved on the mesh.
            self.map, kf_id = frontend.append_keyframe_only(
                self.map, frame, self._K, self._bf, depth_limit
            )
            self.map, victim, vparent, T_redirect = (
                frontend.mapping_pipeline_dist(
                    self.map, kf_id, self._K, self._bf,
                    jax.random.key(self.frame_id), self.mesh, voc=self.vocab,
                )
            )
        else:
            self.map, kf_id, _, victim, vparent, T_redirect = (
                frontend.insert_keyframe_fused(
                    self.map, frame, self._K, self._bf, depth_limit,
                    jax.random.key(self.frame_id),
                    self.vocab,
                )
            )
        self.ref_kf = int(kf_id)
        self.n_kf_host += 1
        self.last_kf_frame = self.frame_id
        self._apply_cull(int(victim), int(vparent), T_redirect)
        self._stream_keyframe()

    def _apply_cull(self, victim: int, parent: int, T_redirect):
        """Host bookkeeping for an erased redundant keyframe: rewrite
        trajectory references onto the spanning-tree parent and release the
        slot from the live count (the SetBadFlag + SaveTrajectory chain,
        src/KeyFrame.cc:432-546, src/System.cc:610-629)."""
        if victim < 0:
            return
        self.trajectory.redirect_kf(victim, parent, np.asarray(T_redirect))
        self.n_kf_host -= 1

    def _stream_keyframe(self):
        """Push the new keyframe + refined poses to the map server (the
        Map::Add/UpdateKeyFrame forwarding, src/Map.cc:35-98)."""
        if self._stream is not None:
            self._stream.send_keyframe(self.map, self.ref_kf)
            live = np.where(np.asarray(self.map.kf_valid))[0]
            self._stream.send_pose_update(self.map, live)
            # Operator pushes arrive at keyframe cadence (poll transport for
            # the CLIENT_MAP<cid> subscription).
            self.poll_server_push()

    def _insert_keyframe_async(self, frame):
        """Tracking-side keyframe creation: structural append, then hand the
        heavy mapping round to the worker (CreateNewKeyFrame +
        LocalMapping::InsertKeyFrame, src/Tracking.cc:1206-1286)."""
        from . import frontend

        depth_limit = jnp.float32(
            self._depth_limit if self.sensor != Sensor.MONOCULAR else 0.0
        )

        kf_cell = [None]

        def step(state):
            state, kf_cell[0] = frontend.append_keyframe_only(
                state, frame, self._K, self._bf, depth_limit
            )
            return state

        self.map = self._box.mutate(step)
        self._map_version = self._box.version
        self.ref_kf = int(kf_cell[0])
        self.n_kf_host += 1
        self.last_kf_frame = self.frame_id
        self._mapper.submit_keyframe(self.ref_kf)
        self._stream_keyframe()

    # ------------------------------------------------------------------
    def _initialize(self, frame: tracking.FrameData) -> bool:
        if self.sensor in (Sensor.RGBD, Sensor.STEREO):
            n_kp = int(frame.kp_valid.sum())
            if n_kp < 500:
                return False
            self.map, kf0, n_mp = initialization.create_initial_map_depth(
                self.map, frame, self._K
            )
            frame = frame._replace(mp=self.map.kf_mp[kf0])  # dynamic index
            self.ref_kf = int(kf0)
            self.n_kf_host = 1
            self.last_kf_frame = self.frame_id
            self.last_frame = frame
            self._publish_fresh_map()
            return True

        # Monocular: need a reference frame with >100 keypoints.
        if self.init_ref is None:
            if int(frame.kp_valid.sum()) > 100:
                self.init_ref = frame
            return False
        m = initialization.match_for_initialization(self.init_ref, frame)
        n_matches = int(m.ok.sum())
        # Reference demands 100 matches (src/Tracking.cc:741); we accept 70
        # because the parallax gate (twoview.py) already rejects degenerate
        # small-baseline pairs, and waiting for a wider baseline costs
        # matches under descriptor viewpoint drift.
        if n_matches < 70:
            self.init_ref = frame if int(frame.kp_valid.sum()) > 100 else None
            return False
        res = jax.jit(lambda *a: initialization.twoview.initialize_two_view(*a))(
            self.init_ref.xy,
            frame.xy[m.idx],
            m.ok,
            self._K,
            jax.random.key(self.frame_id),
        )
        if not bool(res.success):
            return False
        self.map, T1, kf0, kf1, n_pts = initialization.create_initial_map_mono(
            self.map, self.init_ref, frame, m.idx, res, self._K
        )
        # Joint BA over the 2-KF map + renormalize (the reference runs
        # GlobalBundleAdjustemnt(20) then median-depth rescales).
        self.map, _ = local_mapping.local_bundle_adjustment(
            self.map, jnp.int32(1), self._K, self._bf
        )
        self.map = _renormalize_scale(self.map)
        frame = frame._replace(pose=self.map.kf_pose[1], mp=self.map.kf_mp[1])
        self.ref_kf = 1
        self.n_kf_host = 2
        self.last_kf_frame = self.frame_id
        self.last_frame = frame
        self.init_ref = None
        self._publish_fresh_map()
        return True

    def _publish_fresh_map(self):
        """Replace the box content wholesale (initialization / map load /
        reset build their map privately with donating programs; the box's
        previous snapshot may hold donated-away buffers)."""
        if self._box is not None:
            self._box.publish(self.map)
            self._map_version = self._box.version

    # ------------------------------------------------------------------
    def _record(self, timestamp, Tcw, lost=False):
        self.trajectory.append(
            timestamp,
            self.ref_kf,
            np.asarray(Tcw),
            # Dynamic index: a Python-int index would bake the slot id into
            # a throwaway gather compile per distinct value.
            np.asarray(self.map.kf_pose[jnp.int32(self.ref_kf)]),
            lost=lost,
        )

    def save_map(self, path):
        """Persist the map (System::SaveMap analog, src/System.cc:807-848)."""
        from ..utils import serialization

        self.flush()
        self._refresh_from_box()
        serialization.save_map(
            self.map, path,
            metadata={"ref_kf": self.ref_kf, "n_kf_host": self.n_kf_host,
                      "frame_id": self.frame_id},
        )

    def load_map(self, path):
        """Load a map and start in LOST state for relocalization-based reuse
        (System::LoadMap, src/System.cc:849-994; Tracking starts LOST,
        src/Tracking.cc:148-149)."""
        from ..utils import serialization

        self.map, meta = serialization.load_map(path)
        self.ref_kf = int(meta.get("ref_kf", 0))
        self.n_kf_host = int(meta.get("n_kf_host", int(self.map.n_kf)))
        self.frame_id = int(meta.get("frame_id", 0))
        self.state = TrackState.LOST
        self._have_velocity = False
        self._last_Tcw = None
        self.last_frame = None
        if self.vocab is not None:
            self.loop_closer.db = serialization.rebuild_database(
                self.map, self.vocab, self.config.max_keyframes,
                self.config.n_features,
            )
        self._publish_fresh_map()

    def save_trajectory_tum(self, path):
        self.flush()
        self._refresh_from_box()
        self.trajectory.save_tum(path, np.asarray(self.map.kf_pose))

    def save_trajectory_kitti(self, path):
        self.flush()
        self._refresh_from_box()
        self.trajectory.save_kitti(path, np.asarray(self.map.kf_pose))

    # ------------------------------------------------------------------
    # Pose/graph export API (the reference's ROS-facing surface).
    def get_pose_array(self) -> list[np.ndarray]:
        """Tcw of every live keyframe, id order (System::GetPoseArray,
        src/System.cc:751-785; published as /PoseGraph PoseArray,
        src/ros_rgbd.cc:177,444-506)."""
        self.flush()
        self._refresh_from_box()
        valid = np.asarray(self.map.kf_valid)
        poses = np.asarray(self.map.kf_pose)
        return [poses[i] for i in range(len(valid)) if valid[i]]

    def get_graph(self) -> dict:
        """Pose-graph snapshot (the `get_graph` service, src/ros_rgbd.cc:67-108,
        srv/MapGraph.srv -> PoseGraph.msg {posesId, poses, links}). The
        reference links consecutive ids; we also expose the true covisibility
        edges (weight >= 15) the reference keeps in KeyFrame::UpdateConnections
        (src/KeyFrame.cc:290-380) since our map stores them as an array."""
        self.flush()
        self._refresh_from_box()
        valid = np.asarray(self.map.kf_valid)
        poses = np.asarray(self.map.kf_pose)
        ids = [i for i in range(len(valid)) if valid[i]]
        links = [
            {"fromId": a, "toId": b} for a, b in zip(ids[:-1], ids[1:])
        ]
        from .map_state import covisibility

        cov = np.asarray(covisibility(self.map))
        ii, jj = np.nonzero(np.triu(cov, 1) >= 15)
        covis_edges = [
            {"fromId": int(a), "toId": int(b), "weight": int(cov[a, b])}
            for a, b in zip(ii, jj)
        ]
        return {
            "posesId": ids,
            "poses": [poses[i] for i in ids],
            "links": links,
            "covisibility": covis_edges,
        }

    # Odometry-frame pose chain (fork addition, src/Tracking.cc:528-557):
    # accumulates frame-to-frame motion into a drift-continuous odom frame
    # that never jumps on loop closure/relocalization — the /odom->base_link
    # TF analog (src/ros_rgbd.cc:140-198).
    def _update_odom(self, Tcw: np.ndarray):
        if self._odom_Tcw is None:
            self._odom_Tcw = Tcw.copy()
        elif self._last_Tcw is not None:
            diff_twc = Tcw @ np.linalg.inv(self._last_Tcw)  # mPoseDiff.mTwc
            self._odom_Tcw = diff_twc @ self._odom_Tcw
        self._last_Tcw = Tcw.copy()

    def _sync_odom_from_device(self):
        """Fold the device-side odom chain back into the host chain (used on
        pipeline flush, so the sync path resumes from the right frame)."""
        if self._odom_dev is not None:
            self._odom_Tcw = np.asarray(self._odom_dev, np.float64)
            self._odom_dev = None
            self._last_Tcw = None

    @property
    def odom_pose(self) -> np.ndarray | None:
        """T_cam_odom (4,4) in the odometry frame, or None before tracking.
        On the pipelined path this materializes the device-side chain (one
        transfer, paid by the caller who asked)."""
        if self._odom_dev is not None:
            return np.asarray(self._odom_dev, np.float64)
        return None if self._odom_Tcw is None else self._odom_Tcw.copy()


@jax.jit
def _odom_step(odom: jax.Array, diff_twc: jax.Array) -> jax.Array:
    """One odometry-chain update entirely on device (the mPoseDiff.mTwc
    accumulation, src/Tracking.cc:528-557, without the per-frame host
    fetch): odom' = diff @ odom."""
    return lie.orthonormalize(diff_twc @ odom)


@jax.jit
def _renormalize_scale(state: MapState):
    """Scale map so KF0's median scene depth is 1 (mono gauge fixing after
    init BA, src/Tracking.cc:832-856)."""
    pose0 = state.kf_pose[0]
    mp0 = state.kf_mp[0]
    has = (mp0 >= 0) & state.kf_kp_valid[0]
    z = (pose0[2, :3] @ state.mp_pos[jnp.maximum(mp0, 0)].T) + pose0[2, 3]
    med = jnp.nanmedian(jnp.where(has, z, jnp.nan))
    s = 1.0 / jnp.maximum(med, 1e-6)
    kf_pose = state.kf_pose.at[:, :3, 3].multiply(s)
    mp_pos = state.mp_pos * s
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos)
