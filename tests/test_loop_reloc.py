"""Loop closing + relocalization integration tests (SURVEY §4: mono
init->track->loop on synthetic circular trajectories)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor, TrackState
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.ops import lie

# th_depth=100 (depth-point limit = bf*th/fx = 8 m): the room's walls are
# 3-8 m away; the TUM-style 3.2 m limit would starve the map of depth points
# whenever only far walls are in view.
CFG = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=96, max_map_points=16384, fps=10.0,
    bf=44.0, th_depth=100.0,
)


def spin_poses(n, revolutions=2.0):
    """In-place yaw at the room center. Two revolutions: during the second
    pass the camera re-enters territory mapped >10 keyframes earlier without
    covisible connection — the canonical loop-closure trigger. (A single
    smooth revolution correctly needs NO loop closure: tracking reconnects
    through covisibility first.)

    NOTE: built from R and a FIXED camera center (se3_exp of a combined
    tangent would move the center through the left Jacobian)."""
    poses = []
    center = np.array([0.0, 0.0, 3.0], np.float32)
    for k in range(n):
        th = revolutions * 2 * np.pi * k / n
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, th, 0.0], jnp.float32)))
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = R
        Twc[:3, 3] = center
        poses.append(np.linalg.inv(Twc).astype(np.float32))
    return poses


@pytest.fixture(scope="module")
def loop_seq():
    rng = np.random.default_rng(11)
    room = synthetic.make_room(rng)
    # Walls only (first 6 planes): boxes would collide with the camera path.
    scene = synthetic.PlaneScene(
        room.origin[:6], room.ux[:6], room.vy[:6], room.tex[:6]
    )
    poses = spin_poses(216, revolutions=2.0)
    K = jnp.asarray(CFG.K)
    frames = []
    for Tcw in poses:
        img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, CFG.width, CFG.height)
        frames.append((np.asarray(img), np.asarray(depth)))
    return frames, poses


class TestLoopClosing:
    def test_loop_detected_and_map_intact(self, loop_seq):
        frames, gt = loop_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.RGBD)
        tracked = 0
        for i, (img, depth) in enumerate(frames):
            if slam.track_rgbd(img, depth, timestamp=i * 0.1) is not None:
                tracked += 1
        assert tracked >= len(frames) * 0.75, f"tracked {tracked}/{len(frames)}"
        # The orbit revisits its start: the loop pipeline must have fired at
        # least one closure, and the map must survive it (still tracking at
        # the end).
        assert slam.n_loops_closed >= 1
        assert slam.state == TrackState.OK


class TestRelocalization:
    def test_recovers_after_blackout(self, loop_seq):
        frames, _ = loop_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.RGBD)
        # Track the first 12 frames normally.
        for i in range(12):
            slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
        assert slam.state == TrackState.OK
        # Blackout: tracking must fail.
        black = np.zeros_like(frames[0][0])
        nod = np.zeros_like(frames[0][1])
        for j in range(3):
            out = slam.track_rgbd(black, nod, timestamp=1.2 + j * 0.1)
            assert out is None
        assert slam.state == TrackState.LOST
        # Show a previously seen view: relocalization must recover the pose.
        out = slam.track_rgbd(frames[5][0], frames[5][1], timestamp=2.0)
        assert out is not None, "relocalization failed"
        assert slam.state == TrackState.OK


class TestLocalizationMode:
    def test_no_new_keyframes(self, loop_seq):
        frames, _ = loop_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.RGBD)
        for i in range(10):
            slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
        n_kf = slam.n_kf_host
        slam.activate_localization_mode()
        for i in range(10, 14):
            slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
        assert slam.n_kf_host == n_kf  # map frozen
        assert slam.state == TrackState.OK
