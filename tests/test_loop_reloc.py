"""Loop closing + relocalization integration tests (SURVEY §4: mono
init->track->loop on synthetic circular trajectories)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor, TrackState
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.ops import lie

pytestmark = pytest.mark.slow

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
        # Build a mature map first (>5 keyframes, else the early-loss
        # auto-reset fires instead of relocalization — see below).
        n_warm = 70
        for i in range(n_warm):
            slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
        assert slam.state == TrackState.OK
        assert slam.n_kf_host > 5
        # Blackout: tracking must fail.
        black = np.zeros_like(frames[0][0])
        nod = np.zeros_like(frames[0][1])
        for j in range(3):
            out = slam.track_rgbd(black, nod, timestamp=n_warm * 0.1 + j * 0.1)
            assert out is None
        assert slam.state == TrackState.LOST
        # Show a previously seen view: relocalization must recover the pose.
        out = slam.track_rgbd(frames[n_warm - 4][0], frames[n_warm - 4][1], timestamp=9.0)
        assert out is not None, "relocalization failed"
        assert slam.state == TrackState.OK
        assert slam.n_resets == 0

    def test_early_loss_auto_reset(self, loop_seq):
        """Losing track right after initialization wipes the young map and
        re-initializes (src/Tracking.cc:614-622)."""
        frames, _ = loop_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.RGBD)
        for i in range(5):
            slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
        assert slam.state == TrackState.OK
        assert slam.n_kf_host <= 5
        black = np.zeros_like(frames[0][0])
        out = slam.track_rgbd(black, np.zeros_like(frames[0][1]), timestamp=0.6)
        assert out is None
        assert slam.n_resets == 1
        # The next good frame re-initializes a fresh map.
        out = slam.track_rgbd(frames[6][0], frames[6][1], timestamp=0.7)
        assert out is not None
        assert slam.state == TrackState.OK
        assert slam.n_kf_host == 1


class TestOfflineScan:
    """Chunked offline scan: loop-closing cadence between chunks + in-scan
    relocalization (VERDICT r3 items 3b/4d)."""

    def test_chunked_scan_with_loop_closer(self, loop_seq):
        from orb_slam2v2_1_tpu.models import keyframe_database as kdb
        from orb_slam2v2_1_tpu.models import offline
        from orb_slam2v2_1_tpu.models.loop_closing import LoopCloser
        from orb_slam2v2_1_tpu.ops import vocab as vocab_ops
        import os

        frames, _ = loop_seq
        n = 100  # one half-revolution+: machinery coverage, loop not required
        imgs = np.stack([f[0] for f in frames[:n]])
        deps = np.stack([f[1] for f in frames[:n]])
        K = jnp.asarray(CFG.K)
        path = os.path.join(
            os.path.dirname(__file__), "..", "orb_slam2v2_1_tpu", "data",
            "vocab.npz",
        )
        vocab = vocab_ops.load_vocabulary(np.load(path))
        db = kdb.empty_database(CFG.max_keyframes, CFG.n_features, vocab.n_words)
        lc = LoopCloser(vocab, db, fix_scale=True, K=K, bf=jnp.float32(CFG.bf))
        lc.enable_detached_gba()
        poses, ok, state = offline.track_sequence_rgbd(
            imgs, deps, CFG, loop_closer=lc, chunk=20
        )
        assert int(ok.sum()) >= n * 0.9
        assert lc.kf_counter > 3  # the loop stage actually saw the keyframes

    def test_in_scan_relocalization(self, loop_seq):
        """Blackout mid-scan, then the camera RETURNS to a mapped view:
        tracking goes lost and recovers (offline.py re-anchors on the
        nearest keyframe by center+viewing direction). Recovery requires a
        mapped view — the same precondition as the reference's BoW
        relocalization."""
        from orb_slam2v2_1_tpu.models import offline

        frames, _ = loop_seq
        black = np.zeros_like(frames[0][0])
        seq = frames[:41] + [(black, black)] * 3 + frames[34:46]
        imgs = np.stack([f[0] for f in seq])
        deps = np.stack([f[1] for f in seq])
        poses, ok, state = offline.track_sequence_rgbd(imgs, deps, CFG)
        assert not ok[41] and not ok[42]  # blackout frames lost
        # Back on mapped territory (frames 34-45 replayed): must recover.
        assert ok[46:].sum() >= 8, f"no recovery: {ok[44:]}"


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

    def test_vo_fallback_through_unmapped_stretch(self, loop_seq):
        """mbVO analog (src/Tracking.cc:434-501): in localization mode the
        system keeps emitting odometry poses through UNMAPPED territory via
        temporal VO points, then re-anchors by relocalization when a mapped
        view returns."""
        frames, _ = loop_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.RGBD)
        for i in range(40):
            slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
        assert slam.state == TrackState.OK
        slam.activate_localization_mode()
        # Frames 40-70 rotate into territory the frozen map never saw.
        emitted = 0
        vo_seen = False
        for i in range(40, 70):
            out = slam.track_rgbd(frames[i][0], frames[i][1], timestamp=i * 0.1)
            emitted += out is not None
            vo_seen |= slam._vo_mode
        assert emitted >= 25, f"VO fallback kept only {emitted}/30 frames"
        assert vo_seen, "never entered VO mode on the unmapped stretch"
        # Back to a well-mapped view (near the last, richest keyframe):
        # relocalization re-anchors to the map.
        for i in range(28, 34):
            out = slam.track_rgbd(frames[i][0], frames[i][1], timestamp=20 + i * 0.1)
        assert slam.state == TrackState.OK
        assert not slam._vo_mode
