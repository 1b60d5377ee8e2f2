"""CLI runner: the ros_mono/ros_stereo/ros_rgbd node analog.

Usage:
  python -m orb_slam2v2_1_tpu.run_slam --dataset synthetic [--sensor rgbd]
  python -m orb_slam2v2_1_tpu.run_slam --dataset /path/to/tum_dir --sensor rgbd \
      --settings config.yaml --out traj.txt

Prints per-frame tracking state; writes the TUM-format trajectory and (if
ground truth is available) reports ATE RMSE — the file-based equivalent of
the reference's ROS nodes + offline evaluation workflow.
"""

from __future__ import annotations

import argparse
import sys
import time


def _fmt_stats(st: dict) -> str:
    """One-line render of SlamSystem.stats() — the FrameDrawer status-bar
    analog (src/FrameDrawer.cc:132-168): per-stage rolling latency + map
    counters, printed at interval."""

    def ms(v):
        return "-" if v is None else f"{v:.1f}"

    return (f"{st['state']} track p50/p90={ms(st['track_ms_p50'])}/"
            f"{ms(st['track_ms_p90'])}ms map p50={ms(st['map_ms_p50'])}ms "
            f"loop p50={ms(st['loop_ms_p50'])}ms gba={ms(st['gba_ms_last'])}ms "
            f"kf={st['n_kf']} loops={st['n_loops']} resets={st['n_resets']} "
            f"inflight={st['in_flight']} ba_skip={st['ba_skipped']}")


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native ORB-SLAM")
    p.add_argument("--dataset", default="synthetic",
                   help="'synthetic' or a TUM RGB-D directory")
    p.add_argument("--sensor", default="rgbd", choices=["mono", "rgbd", "stereo"])
    p.add_argument("--settings", default=None, help="settings file (reference YAML style)")
    p.add_argument("--out", default="trajectory_tum.txt")
    p.add_argument("--save-map", default=None)
    p.add_argument("--ply", default=None, help="export sparse map PLY")
    p.add_argument("--viz-dir", default=None,
                   help="record frame/map PNGs (the Pangolin viewer analog)")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--stats-every", type=int, default=30,
                   help="print SlamSystem.stats() every N frames "
                        "(per-stage latency + map counters)")
    p.add_argument("--sync", action="store_true",
                   help="synchronous mapping (default: threaded LocalMapping/"
                        "LoopClosing workers, the reference's architecture)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from .models.system import SlamSystem, Sensor, TrackState
    from .utils.config import SlamConfig, load_settings, TUM_FR1
    from .utils.trajectory import ate_rmse

    sensor = {"mono": Sensor.MONOCULAR, "rgbd": Sensor.RGBD,
              "stereo": Sensor.STEREO}[args.sensor]

    if args.dataset == "synthetic":
        from .utils import synthetic

        cfg = SlamConfig(
            fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
            n_features=1000, max_keyframes=128, max_map_points=16384, fps=10.0,
            bf=44.0 if sensor != Sensor.MONOCULAR else 0.0, th_depth=40.0,
        )
        rng = np.random.default_rng(7)
        scene = synthetic.make_desk(rng)
        poses = synthetic.desk_trajectory(args.frames)
        poses = [q @ np.linalg.inv(poses[0]) for q in poses]
        K = jnp.asarray(cfg.K)
        frames = []
        for Tcw in poses:
            img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
            frames.append((np.asarray(img), np.asarray(depth)))
        gt = {i * 0.1: np.linalg.inv(poses[i]) for i in range(len(poses))}

        slam = SlamSystem(config=cfg, sensor=sensor, async_mapping=not args.sync)
        rec = None
        if args.viz_dir:
            from .utils.viz import FrameRecorder

            rec = FrameRecorder(args.viz_dir)
        t0 = time.time()
        for i, (img, depth) in enumerate(frames):
            if sensor == Sensor.RGBD:
                pose = slam.track_rgbd(img, depth, i * 0.1)
            else:
                pose = slam.track_monocular(img, i * 0.1)
            if rec is not None and slam.last_frame is not None:
                rec.record(img, slam.last_frame, slam.map, slam.state.name)
            print(f"frame {i:04d}: {slam.state.name:16s} kf={slam.n_kf_host:3d} "
                  f"mp={int(slam.map.mp_valid.sum()):5d} loops={slam.n_loops_closed}")
            if i and i % args.stats_every == 0:
                print("  stats:", _fmt_stats(slam.stats()))
        wall = time.time() - t0
    else:
        from .utils import datasets

        cfg = load_settings(args.settings) if args.settings else TUM_FR1
        pairs, gt = datasets.load_tum_rgbd(args.dataset)
        slam = SlamSystem(config=cfg, sensor=sensor, async_mapping=not args.sync)
        t0 = time.time()
        for i, fr in enumerate(pairs):
            img = datasets.read_image_gray(fr["rgb"])
            depth = datasets.read_depth_tum(fr["depth"], cfg.depth_map_factor)
            if sensor == Sensor.RGBD:
                slam.track_rgbd(img, depth, fr["t"])
            else:
                slam.track_monocular(img, fr["t"])
            if i % 10 == 0:
                print(f"frame {i:04d}/{len(pairs)}: {slam.state.name:16s} "
                      f"kf={slam.n_kf_host:3d} loops={slam.n_loops_closed}")
            if i and i % args.stats_every == 0:
                print("  stats:", _fmt_stats(slam.stats()))
        wall = time.time() - t0

    slam.shutdown()  # drain mapping/loop workers (no-op in --sync mode)
    print("final stats:", _fmt_stats(slam.stats()))
    slam.save_trajectory_tum(args.out)
    n = len(slam.trajectory.entries)
    print(f"\n{n} frames in {wall:.1f}s ({n/wall:.1f} fps) -> {args.out}")
    if args.save_map:
        slam.save_map(args.save_map)
        print(f"map saved -> {args.save_map}")
    if args.ply:
        from .utils.pointcloud import export_sparse_map_ply

        export_sparse_map_ply(slam.map, args.ply)
        print(f"sparse cloud -> {args.ply}")
    if gt:
        abs_poses = slam.trajectory.absolute_poses(np.asarray(slam.map.kf_pose))
        err = ate_rmse(abs_poses, gt, align_scale=sensor == Sensor.MONOCULAR)
        print(f"ATE RMSE: {err:.4f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
