"""Accuracy hardening (VERDICT r3 item 7): photometric perturbations on the
e2e ATE gates, a KITTI-geometry stereo run, and a long-sequence capacity run
at realistic scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.utils.trajectory import ate_rmse
from orb_slam2v2_1_tpu.ops import lie

CFG = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=64, max_map_points=16384, fps=30.0,
    bf=44.0, th_depth=40.0,
)


def _perturb(rng, img, i, n):
    """Sensor noise + exposure drift + mild blur — the photometric insults a
    real rolling recording carries."""
    img = np.asarray(img, np.float32)
    # Exposure drift: +-20% gain ramp across the sequence.
    gain = 1.0 + 0.2 * np.sin(2 * np.pi * i / max(n - 1, 1))
    img = img * gain
    # 3x3 box blur (separable).
    b = (img[:-2] + img[1:-1] + img[2:]) / 3.0
    img = np.pad(b, ((1, 1), (0, 0)), mode="edge")
    b = (img[:, :-2] + img[:, 1:-1] + img[:, 2:]) / 3.0
    img = np.pad(b, ((0, 0), (1, 1)), mode="edge")
    # Gaussian sensor noise, sigma=3 gray levels.
    img = img + rng.normal(0, 3.0, img.shape).astype(np.float32)
    return np.clip(img, 0, 255)


class TestPhotometricRobustness:
    def test_rgbd_ate_under_perturbation(self, rng):
        scene = synthetic.make_desk(rng)
        n = 30
        gt = synthetic.desk_trajectory(n)
        gt = [p @ np.linalg.inv(gt[0]) for p in gt]
        K = jnp.asarray(CFG.K)
        slam = SlamSystem(config=CFG, sensor=Sensor.RGBD)
        # Live pose publication surface (the TF/Odometry analog).
        samples = []
        slam.add_pose_listener(samples.append)
        n_tracked = 0
        for i, Tcw in enumerate(gt):
            img, depth = synthetic.render(
                scene, jnp.asarray(Tcw), K, CFG.width, CFG.height
            )
            img = _perturb(rng, img, i, n)
            out = slam.track_rgbd(img, np.asarray(depth), timestamp=i / 10.0)
            n_tracked += out is not None
        assert n_tracked >= n * 0.9, f"tracked {n_tracked}/{n} under perturbation"
        # One publication per processed frame, carrying pose + odom chain.
        assert len(samples) == n
        assert sum(s["Tcw"] is not None for s in samples) == n_tracked
        assert samples[-1]["odom"] is not None
        gt_d = {i / 10.0: np.linalg.inv(gt[i]) for i in range(n)}
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        ate = ate_rmse(abs_poses, gt_d, max_dt=0.01, align_scale=False)
        # Clean-render gates are mm-level; under noise+blur+exposure we allow
        # 2 cm (TUM fr1/desk reference ATE is ~1.6 cm on real imagery).
        assert ate < 0.02, f"ATE {ate:.4f} m under photometric perturbation"


class TestKittiGeometry:
    def test_stereo_kitti_shape_tracks(self, rng):
        """KITTI-configuration stereo (1241x376, 2000 features, KITTI00 K):
        dolly through the room, end-to-end through the stereo frontend."""
        cfg = SlamConfig(
            fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
            width=1241, height=376, n_features=2000, max_keyframes=32,
            max_map_points=16384, fps=10.0, bf=386.1448, th_depth=35.0,
        )
        room = synthetic.make_room(rng)
        K = jnp.asarray(cfg.K)
        baseline = cfg.bf / cfg.fx
        n = 20
        gt = []
        for i in range(n):
            xi = np.array([0.12 * i, 0.0, 0.08 * i, 0.0, 0.01 * i, 0.0], np.float32)
            Twc = np.asarray(lie.se3_exp(jnp.asarray(xi)))
            gt.append(np.linalg.inv(Twc).astype(np.float32))
        slam = SlamSystem(config=cfg, sensor=Sensor.STEREO)
        n_tracked = 0
        for i, Tcw in enumerate(gt):
            Tr = Tcw.copy()
            # Right camera: shifted by -baseline along the camera x axis.
            Tr[0, 3] -= baseline
            img_l, _ = synthetic.render(room, jnp.asarray(Tcw), K, cfg.width, cfg.height)
            img_r, _ = synthetic.render(room, jnp.asarray(Tr), K, cfg.width, cfg.height)
            out = slam.track_stereo(img_l, img_r, timestamp=i * 0.1)
            n_tracked += out is not None
        assert n_tracked >= n * 0.9, f"tracked {n_tracked}/{n} at KITTI geometry"
        gt_d = {i * 0.1: np.linalg.inv(gt[i]) for i in range(n)}
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        ate = ate_rmse(abs_poses, gt_d, max_dt=0.01, align_scale=False)
        # ~2.3 m travelled; reference KITTI00 ATE is ~1.3 m over 3.7 km.
        assert ate < 0.05, f"KITTI-geometry ATE {ate:.4f} m"


_LONG_RUN_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import json
import dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import offline
from orb_slam2v2_1_tpu.utils import synthetic
from tests.test_loop_reloc import CFG as LCFG, spin_poses

cfg = dataclasses.replace(LCFG, max_keyframes=48, fps=5.0)
room = synthetic.make_room(np.random.default_rng(0))
scene = synthetic.PlaneScene(room.origin[:6], room.ux[:6], room.vy[:6], room.tex[:6])
K = jnp.asarray(cfg.K)
poses = spin_poses(500, revolutions=4.0)
imgs, deps = [], []
for Tcw in poses:
    img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
    imgs.append(np.asarray(img).astype(np.uint8))
    deps.append(np.asarray(depth).astype(np.float16))
p, ok, state = offline.track_sequence_rgbd(
    np.stack(imgs), np.stack(deps), cfg, chunk=100
)
print(json.dumps({
    "tracked": int(ok.sum()),
    "n_live": int(np.asarray(state.kf_valid).sum()),
    "n_ever": int(state.n_seq),
    "max_kf": cfg.max_keyframes,
}))
"""


class TestLongRun:
    @pytest.mark.slow
    def test_500_frame_capacity_bounded(self):
        """500-frame orbit at realistic capacity: keyframe count stays
        bounded by culling + slot reuse, tracking survives to the end
        (the r2/r3 'LongRunCapacity' bar at real scale).

        Runs in a FRESH subprocess: the 500-frame scan on top of a full
        suite's worth of resident XLA executables trips an XLA CPU-compiler
        segfault (memory pressure); isolation keeps the measurement honest
        and the suite stable."""
        import json
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-c", _LONG_RUN_SCRIPT],
            capture_output=True, text=True, timeout=1100,
            cwd=str(__import__("pathlib").Path(__file__).parent.parent),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["tracked"] >= 450, f"tracked {res['tracked']}/500"
        assert res["n_live"] <= res["max_kf"]
        # Culling must have actually erased keyframes (slot reuse + the
        # bounded-memory forced eviction exercised).
        assert res["n_ever"] > res["n_live"], res
        assert res["n_ever"] >= 60, res
