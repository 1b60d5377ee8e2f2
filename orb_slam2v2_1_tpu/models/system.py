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
from dataclasses import dataclass, field

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


@dataclass
class SlamSystem:
    config: SlamConfig
    sensor: Sensor = Sensor.MONOCULAR

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
            d = jnp.full(feats.xy.shape[0], -1.0)
            ur = jnp.full(feats.xy.shape[0], -1.0)
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
        frame = self._make_frame(img)
        return self._track(frame, timestamp)

    def track_rgbd(self, img, depth, timestamp: float):
        frame = self._make_frame(img, depth=depth)
        return self._track(frame, timestamp)

    # ------------------------------------------------------------------
    def _track(self, frame: tracking.FrameData, timestamp: float):
        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            self.state = TrackState.NOT_INITIALIZED
            ok = self._initialize(frame)
            self.frame_id += 1
            if not ok:
                return None
            self.state = TrackState.OK
            # _initialize stored the (BA-refined) pose on last_frame.
            self._record(timestamp, self.last_frame.pose)
            return np.asarray(self.last_frame.pose)

        # --- normal tracking ---
        ok = False
        if self.state == TrackState.OK and self.velocity is not None:
            T_pred = jnp.asarray(self.velocity) @ self.last_frame.pose
            Tcw, cur_mp, stats = tracking.track_motion_model(
                self.map, frame, self.last_frame, T_pred, self._K, self._bf,
                jnp.float32(15.0 if self.sensor == Sensor.MONOCULAR else 7.0),
            )
            ok = int(stats.n_inliers) >= 10
            if not ok:
                # Wider window retry (src/Tracking.cc:1047-1052 doubles th).
                Tcw, cur_mp, stats = tracking.track_motion_model(
                    self.map, frame, self.last_frame, T_pred, self._K, self._bf,
                    jnp.float32(30.0 if self.sensor == Sensor.MONOCULAR else 14.0),
                )
                ok = int(stats.n_inliers) >= 10
        if not ok:
            # Reference-KF fallback (TrackReferenceKeyFrame).
            T_init = self.last_frame.pose if self.last_frame is not None else jnp.eye(4)
            Tcw, cur_mp, stats = tracking.track_reference_keyframe(
                self.map, frame, jnp.int32(self.ref_kf), T_init, self._K, self._bf
            )
            ok = int(stats.n_inliers) >= 10

        if ok:
            frame = frame._replace(pose=Tcw, mp=cur_mp)
            self.map, Tcw, cur_mp, stats = tracking.track_local_map(
                self.map, frame, Tcw, self._K, self._bf, jnp.float32(0.5), self._img_wh
            )
            n_inliers = int(stats.n_inliers)
            ok = n_inliers >= 30
            frame = frame._replace(pose=Tcw, mp=cur_mp)

        if not ok:
            self.state = TrackState.LOST
            self.frame_id += 1
            self._record(timestamp, self.last_frame.pose, lost=True)
            return None

        self.state = TrackState.OK
        # Velocity model update (src/Tracking.cc:571-579). Orthonormalized:
        # f32 pose-product scale error otherwise compounds geometrically
        # through the prediction feedback (see lie.project_so3).
        if self.last_frame is not None:
            self.velocity = np.asarray(
                lie.orthonormalize(frame.pose @ lie.se3_inverse(self.last_frame.pose))
            )

        # Keyframe policy + insertion (NeedNewKeyFrame/CreateNewKeyFrame).
        if self._need_new_keyframe(frame, n_inliers):
            self._insert_keyframe(frame)

        self.last_frame = frame
        self.frame_id += 1
        self._record(timestamp, frame.pose)
        return np.asarray(frame.pose)

    # ------------------------------------------------------------------
    def _initialize(self, frame: tracking.FrameData) -> bool:
        if self.sensor in (Sensor.RGBD, Sensor.STEREO):
            n_kp = int(frame.kp_valid.sum())
            if n_kp < 500:
                return False
            self.map, kf0, n_mp = initialization.create_initial_map_depth(
                self.map, frame, self._K
            )
            self.ref_kf = int(kf0)
            self.n_kf_host = 1
            self.last_kf_frame = self.frame_id
            frame = frame._replace(mp=self.map.kf_mp[int(kf0)])
            self.last_frame = frame
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
        return True

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame: tracking.FrameData, n_inliers: int) -> bool:
        """NeedNewKeyFrame (src/Tracking.cc:1120-1204), synchronous variant:
        local mapping is always 'idle'."""
        if self.n_kf_host >= self.config.max_keyframes - 2:
            return False
        frames_since = self.frame_id - self.last_kf_frame
        # Reference match count vs current (thRefRatio=0.9 mono, 0.75 rgbd);
        # nRefMatches counts ref-KF points with >=minObs observations
        # (KeyFrame::TrackedMapPoints, src/Tracking.cc:1147-1152).
        from .map_state import mp_observation_count

        min_obs = 3 if self.n_kf_host > 2 else 2
        obs = mp_observation_count(self.map)
        ref_mp = self.map.kf_mp[self.ref_kf]
        ref_matches = int(
            (
                (ref_mp >= 0)
                & self.map.kf_kp_valid[self.ref_kf]
                & (obs[np.maximum(np.asarray(ref_mp), 0)] >= min_obs)
            ).sum()
        )
        ref_ratio = 0.9 if self.sensor == Sensor.MONOCULAR else 0.75
        c1a = frames_since >= self._max_frames
        c1b = frames_since >= max(self._min_frames, 1)
        c2 = (n_inliers < ref_matches * ref_ratio) and n_inliers > 15
        # RGB-D/stereo close-point trigger (src/Tracking.cc:1158-1176):
        # insert when tracked close points run low but fresh close depth is
        # available — the mechanism that keeps depth maps dense.
        need_close = False
        if self.sensor != Sensor.MONOCULAR and self.config.bf > 0:
            depth_limit = self.config.bf * self.config.th_depth / self.config.fx
            d = np.asarray(frame.depth)
            kp_ok = np.asarray(frame.kp_valid)
            has_mp = np.asarray(frame.mp) >= 0
            close = kp_ok & (d > 0) & (d < depth_limit)
            tracked_close = int((close & has_mp).sum())
            untracked_close = int((close & ~has_mp).sum())
            need_close = tracked_close < 100 and untracked_close > 70
        return (c1b and (c2 or need_close)) or c1a

    def _insert_keyframe(self, frame: tracking.FrameData):
        from .map_state import append_keyframe

        self.map, kf_id = append_keyframe(
            self.map, frame.pose, frame.frame_id, frame.xy, frame.level,
            frame.angle, frame.desc, frame.kp_valid, frame.ur, frame.mp,
        )
        kid = int(kf_id)
        self.ref_kf = kid
        self.n_kf_host += 1
        self.last_kf_frame = self.frame_id
        # Stereo/RGB-D: densify from depth before triangulation
        # (CreateNewKeyFrame, src/Tracking.cc:1206-1286).
        if self.sensor != Sensor.MONOCULAR and self.config.bf > 0:
            depth_limit = self.config.bf * self.config.th_depth / self.config.fx
            self.map = local_mapping.create_depth_points(
                self.map, jnp.int32(kid), self._K, self._bf, jnp.float32(depth_limit)
            )
        # Synchronous local mapping (LocalMapping::Run body).
        self.map = local_mapping.cull_map_points(self.map, jnp.int32(kid))
        self.map = local_mapping.create_map_points(
            self.map, jnp.int32(kid), self._K, self._bf, jax.random.key(kid)
        )
        self.map = local_mapping.fuse_map_points(
            self.map, jnp.int32(kid), self._K, self._bf
        )
        self.map = update_mp_stats(self.map)
        self.map, _ = local_mapping.local_bundle_adjustment(
            self.map, jnp.int32(kid), self._K, self._bf
        )

    # ------------------------------------------------------------------
    def _record(self, timestamp, Tcw, lost=False):
        self.trajectory.append(
            timestamp,
            self.ref_kf,
            np.asarray(Tcw),
            np.asarray(self.map.kf_pose[self.ref_kf]),
            lost=lost,
        )

    def save_trajectory_tum(self, path):
        self.trajectory.save_tum(path, np.asarray(self.map.kf_pose))

    def save_trajectory_kitti(self, path):
        self.trajectory.save_kitti(path, np.asarray(self.map.kf_pose))


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
