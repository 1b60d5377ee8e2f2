"""End-to-end SLAM integration tests on synthetic rendered scenes
(SURVEY §4: integration — init -> track -> map on synthetic trajectories).

The desk scene mirrors the TUM fr1 benchmark character (cluttered close-range
structure); see utils/synthetic.py for why an empty room is degenerate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor, TrackState
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.utils.trajectory import ate_rmse

CFG = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=64, max_map_points=16384, fps=10.0,
)
CFG_RGBD = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=64, max_map_points=16384, fps=10.0,
    bf=44.0, th_depth=40.0,
)


@pytest.fixture(scope="module")
def desk_seq():
    rng = np.random.default_rng(7)
    scene = synthetic.make_desk(rng)
    poses = synthetic.desk_trajectory(30)
    poses = [p @ np.linalg.inv(poses[0]) for p in poses]  # world = first cam
    K = jnp.asarray(CFG.K)
    frames = []
    for Tcw in poses:
        img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, CFG.width, CFG.height)
        frames.append((np.asarray(img), np.asarray(depth)))
    return frames, poses


class TestMonocularE2E:
    def test_tracks_and_maps(self, desk_seq):
        frames, gt_poses = desk_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.MONOCULAR)
        est = [slam.track_monocular(img, timestamp=i * 0.1) for i, (img, _) in enumerate(frames)]
        assert slam.state == TrackState.OK
        assert slam.n_kf_host >= 2
        n_tracked = sum(p is not None for p in est)
        assert n_tracked >= len(frames) * 0.8, f"only {n_tracked} tracked"

        gt = {i * 0.1: np.linalg.inv(gt_poses[i]) for i in range(len(gt_poses))}
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        err = ate_rmse(abs_poses, gt, max_dt=0.01)
        # Reference-grade accuracy: fr1-class scene, <1 cm (measured ~1.5 mm).
        assert err < 0.01, f"ATE {err:.4f} m"

    def test_trajectory_export(self, desk_seq, tmp_path):
        frames, _ = desk_seq
        slam = SlamSystem(config=CFG, sensor=Sensor.MONOCULAR)
        for i, (img, _) in enumerate(frames[:12]):
            slam.track_monocular(img, timestamp=i * 0.1)
        slam.save_trajectory_tum(tmp_path / "traj.txt")
        lines = (tmp_path / "traj.txt").read_text().strip().splitlines()
        assert len(lines) >= 5
        assert len(lines[0].split()) == 8  # t x y z qx qy qz qw


class TestStereoE2E:
    def test_tracks_and_maps(self, desk_seq):
        frames, gt_poses = desk_seq
        baseline = CFG_RGBD.bf / CFG_RGBD.fx  # 8 cm
        rng = np.random.default_rng(7)
        scene = synthetic.make_desk(rng)
        K = jnp.asarray(CFG.K)
        Tb = np.eye(4, dtype=np.float32)
        Tb[0, 3] = -baseline
        slam = SlamSystem(config=CFG_RGBD, sensor=Sensor.STEREO)
        est = []
        for i, Tcw in enumerate(gt_poses[:20]):
            left, _ = synthetic.render(scene, jnp.asarray(Tcw), K, CFG.width, CFG.height)
            right, _ = synthetic.render(
                scene, jnp.asarray(Tb @ Tcw), K, CFG.width, CFG.height
            )
            est.append(slam.track_stereo(np.asarray(left), np.asarray(right), i * 0.1))
        assert slam.state == TrackState.OK
        n_tracked = sum(p is not None for p in est)
        assert n_tracked >= 18

        gt = {i * 0.1: np.linalg.inv(gt_poses[i]) for i in range(20)}
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        err = ate_rmse(abs_poses, gt, max_dt=0.01, align_scale=False)
        # Metric stereo accuracy (disparity-derived depth is noisier than
        # the RGB-D oracle depth).
        assert err < 0.02, f"ATE {err:.4f} m"


class TestRgbdE2E:
    def test_tracks_and_maps(self, desk_seq):
        frames, gt_poses = desk_seq
        slam = SlamSystem(config=CFG_RGBD, sensor=Sensor.RGBD)
        est = [
            slam.track_rgbd(img, depth, timestamp=i * 0.1)
            for i, (img, depth) in enumerate(frames)
        ]
        assert slam.state == TrackState.OK
        n_tracked = sum(p is not None for p in est)
        assert n_tracked >= len(frames) * 0.9

        gt = {i * 0.1: np.linalg.inv(gt_poses[i]) for i in range(len(gt_poses))}
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        err = ate_rmse(abs_poses, gt, max_dt=0.01, align_scale=False)
        # Metric (unaligned-scale) accuracy: <1 cm (measured ~1.0 mm).
        assert err < 0.01, f"ATE {err:.4f} m"


class TestAsyncPipelineE2E:
    """Threaded runtime (runtime/pipeline.py): mapping + loop closing in
    native workers on map snapshots — the reference's LocalMapping/LoopClosing
    std::threads (src/System.cc:124-143). Must match the synchronous path's
    accuracy on the same sequence."""

    def test_tracks_and_maps_async(self, desk_seq):
        frames, gt_poses = desk_seq
        slam = SlamSystem(config=CFG_RGBD, sensor=Sensor.RGBD, async_mapping=True)
        est = [
            slam.track_rgbd(img, depth, timestamp=i * 0.1)
            for i, (img, depth) in enumerate(frames)
        ]
        slam.shutdown()  # drain workers, adopt final map
        assert slam.state == TrackState.OK
        n_tracked = sum(p is not None for p in est)
        assert n_tracked >= len(frames) * 0.9
        assert slam.n_kf_host >= 2

        gt = {i * 0.1: np.linalg.inv(gt_poses[i]) for i in range(len(gt_poses))}
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        err = ate_rmse(abs_poses, gt, max_dt=0.01, align_scale=False)
        assert err < 0.01, f"ATE {err:.4f} m"

    def test_reset_restarts_workers(self, desk_seq):
        frames, _ = desk_seq
        slam = SlamSystem(config=CFG_RGBD, sensor=Sensor.RGBD, async_mapping=True)
        for i, (img, depth) in enumerate(frames[:6]):
            slam.track_rgbd(img, depth, timestamp=i * 0.1)
        slam.reset()
        assert slam.state == TrackState.NO_IMAGES_YET
        for i, (img, depth) in enumerate(frames[:6]):
            slam.track_rgbd(img, depth, timestamp=i * 0.1)
        slam.shutdown()
        assert slam.state == TrackState.OK
        assert slam.n_kf_host >= 1
