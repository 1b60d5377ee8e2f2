"""Diagnostic harness for the synthetic end-to-end run: per-frame state,
inliers, keyframes, map size, and ATE breakdown."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
from orb_slam2v2_1_tpu.models import tracking, map_state as ms
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.utils.trajectory import ate_rmse

CFG = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=64, max_map_points=16384, fps=10.0,
)


def main(sensor=Sensor.MONOCULAR, n_frames=30):
    rng = np.random.default_rng(7)
    scene = synthetic.make_desk(rng)
    poses = synthetic.desk_trajectory(n_frames)
    # SLAM world = first camera frame; normalize gt accordingly.
    poses = [p @ np.linalg.inv(poses[0]) for p in poses]
    cfg = CFG
    if sensor != Sensor.MONOCULAR:
        import dataclasses

        cfg = dataclasses.replace(CFG, bf=550.0 * 0.08, th_depth=40.0)
    K = jnp.asarray(cfg.K)
    slam = SlamSystem(config=cfg, sensor=sensor)

    frames = []
    for Tcw in poses:
        img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, CFG.width, CFG.height)
        frames.append((np.asarray(img), np.asarray(depth)))

    for i, (img, depth) in enumerate(frames):
        if sensor == Sensor.MONOCULAR:
            pose = slam.track_monocular(img, timestamp=i * 0.1)
        else:
            pose = slam.track_rgbd(img, depth, timestamp=i * 0.1)
        n_mp = int(slam.map.mp_valid.sum())
        n_assoc = int((slam.last_frame.mp >= 0).sum()) if slam.last_frame is not None else 0
        status = "OK " if pose is not None else "FAIL"
        # Pose error vs gt (mono scale not aligned here; relative check)
        msg = (
            f"f{i:02d} {status} state={slam.state.name:15s} kf={slam.n_kf_host:2d} "
            f"mp={n_mp:5d} assoc={n_assoc:4d}"
        )
        if pose is not None:
            gt = poses[i]
            # relative rotation error to gt
            Rerr = pose[:3, :3] @ gt[:3, :3].T
            ang = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
            msg += f" rot_err={ang:5.2f}deg t_est={np.round(pose[:3,3],2)} t_gt={np.round(gt[:3,3],2)}"
        print(msg)

    gt = {i * 0.1: np.linalg.inv(poses[i]) for i in range(len(poses))}
    abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
    err = ate_rmse(abs_poses, gt, max_dt=0.01, align_scale=sensor == Sensor.MONOCULAR)
    print(f"\nATE RMSE: {err:.4f} m   keyframes: {slam.n_kf_host}  map points: {int(slam.map.mp_valid.sum())}")
    obs = ms.mp_observation_count(slam.map)
    print("obs histogram (1,2,3,>=4):", [int((obs == k).sum()) for k in (1, 2, 3)], int((obs >= 4).sum()))


if __name__ == "__main__":
    import sys

    sensor = Sensor.RGBD if "rgbd" in sys.argv else Sensor.MONOCULAR
    main(sensor)
