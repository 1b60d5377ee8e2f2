"""Headline benchmark: end-to-end RGB-D SLAM throughput WITH loop closing.

Primary metric (the JSON line): steady-state frames/s over a 321-frame orbit
sequence that revisits mapped territory — the full pipeline: ORB extraction,
motion-model + local-map tracking, keyframe policy, local mapping/BA, BoW
loop detection, Sim3 + essential-graph correction, loop fusion, and global BA
(detached + abortable, overlapped with tracking — the reference's GBA-thread
semantics, src/LoopClosing.cc:588). Baseline: the reference's real-time claim
of 30 Hz on a desktop i7 (README.md:61,125; BASELINE.md).

Also printed (stderr, before the JSON line):
  - online per-frame latency percentiles through the SlamSystem API,
  - a KITTI-geometry stereo leg (1241x376, 2000 features).

Frames are staged in HBM before timing: the compute pipeline is the metric
(the reference's 30 Hz is tracking on frames already in RAM); a deployment
double-buffers camera H2D (~9 MB/s for 30 Hz uint8 VGA) concurrently with
tracking, while this dev box reaches the TPU through a tunnel whose bulk copy
would dominate the measurement.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_loop_closer(cfg, K, bf, detached=True):
    import os

    from orb_slam2v2_1_tpu.models import keyframe_database as kdb
    from orb_slam2v2_1_tpu.models.loop_closing import LoopCloser
    from orb_slam2v2_1_tpu.ops import vocab as vocab_ops

    path = os.path.join(
        os.path.dirname(__file__), "orb_slam2v2_1_tpu", "data", "vocab.npz"
    )
    vocab = vocab_ops.load_vocabulary(np.load(path))
    db = kdb.empty_database(cfg.max_keyframes, cfg.n_features, vocab.n_words)
    lc = LoopCloser(vocab, db, fix_scale=True, K=K, bf=bf)
    if detached:
        lc.enable_detached_gba()
    return lc


def orbit_frames(cfg, n_frames):
    """Two-revolution in-place orbit in a textured room: the second pass
    re-enters territory mapped >10 keyframes earlier — the canonical
    loop-closure trigger."""
    from orb_slam2v2_1_tpu.ops import lie
    from orb_slam2v2_1_tpu.utils import synthetic

    rng = np.random.default_rng(11)
    room = synthetic.make_room(rng)
    scene = synthetic.PlaneScene(
        room.origin[:6], room.ux[:6], room.vy[:6], room.tex[:6]
    )
    K = jnp.asarray(cfg.K)
    center = np.array([0.0, 0.0, 3.0], np.float32)
    imgs, deps = [], []
    for k in range(n_frames):
        th = 2.0 * 2 * np.pi * k / n_frames
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, th, 0.0], jnp.float32)))
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = R
        Twc[:3, 3] = center
        Tcw = np.linalg.inv(Twc).astype(np.float32)
        img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
        imgs.append(np.asarray(img))
        deps.append(np.asarray(depth))
    return np.stack(imgs), np.stack(deps)


def headline(cfg, imgs, deps):
    from orb_slam2v2_1_tpu.models import offline

    N, CHUNK = imgs.shape[0], 32
    K = jnp.asarray(cfg.K)
    bf = jnp.float32(cfg.bf)

    def run():
        lc = make_loop_closer(cfg, K, bf)
        t0 = time.time()
        poses, ok, state = offline.track_sequence_rgbd(
            imgs, deps, cfg, loop_closer=lc, chunk=CHUNK
        )
        wall = time.time() - t0
        return wall, int(ok.sum()), lc

    # Warm-up twice: the loop/GBA pipeline compiles lazily across the first
    # runs (chunked solves at map-sized buckets reach new shapes as the map
    # grows), and the first timed run after a cold tunnel is unstable.
    run()
    run()
    walls = []
    for _ in range(3):
        wall, n_ok, lc = run()
        walls.append(wall)
        assert n_ok >= N * 0.9, f"tracking failed: {n_ok}/{N}"
        assert lc.n_loops_closed >= 1, "no loop closed on the orbit"
    walls = np.array(walls)
    spread = (walls.max() - walls.min()) / walls.min()
    wall = np.median(walls)  # robust central estimate; spread reported
    log(
        f"loop-enabled scan: median {wall:.2f}s of "
        f"{[f'{w:.2f}' for w in walls]} (spread {spread * 100:.0f}%) "
        f"for {N} frames, {lc.n_loops_closed} loops closed, {n_ok}/{N} tracked, "
        f"GBA merged={lc.n_gba_merged} aborted={lc.gba_runner.n_aborted if lc.gba_runner else 0}"
    )
    return N / wall, spread


def online_leg(cfg, frames):
    """Per-frame latency through the ONLINE SlamSystem API in its production
    configuration: async mapping workers + detached GBA + pipelined tracking
    (the reference's per-frame TrackRGBD with LocalMapping/LoopClosing
    threads, src/System.cc:124-143,424). Same orbit sequence as the
    headline, so the run includes keyframes, mapping rounds, loop detection
    and at least one full closure."""
    from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor

    slam = SlamSystem(
        config=cfg, sensor=Sensor.RGBD, async_mapping=True, pipelined=True
    )
    t0 = time.time()
    slam.warmup()
    log(f"online warmup (compile walk) in {time.time() - t0:.1f}s")
    lat = []
    t_run = time.time()
    for i, (img, depth) in enumerate(frames):
        t0 = time.perf_counter()
        slam.track_rgbd(img, depth, timestamp=i / 30.0)
        lat.append(time.perf_counter() - t0)
    wall = time.time() - t_run
    slam.flush()
    n = len(frames)
    fps = n / wall
    lat = np.array(lat) * 1e3
    out = {
        "online_fps": round(fps, 2),
        "online_p50_ms": round(float(np.percentile(lat, 50)), 1),
        "online_p90_ms": round(float(np.percentile(lat, 90)), 1),
        "online_p99_ms": round(float(np.percentile(lat, 99)), 1),
        "online_max_ms": round(float(lat.max()), 1),
        "online_loops": slam.n_loops_closed,
        "online_kf": slam.n_kf_host,
        "online_resets": slam.n_resets,
    }
    log(
        f"online pipelined: {fps:.1f} fps | p50={out['online_p50_ms']} "
        f"p90={out['online_p90_ms']} p99={out['online_p99_ms']} "
        f"max={out['online_max_ms']} ms | kf={slam.n_kf_host} "
        f"loops={slam.n_loops_closed} resets={slam.n_resets}"
    )
    log(f"online stage metrics: {slam.stats()}")
    slam.shutdown()
    return out


def kitti_leg():
    """KITTI-geometry stereo: 1241x376, 2000 features, stereo pair tracking
    in the online pipelined configuration (the reference's KITTI real-time
    setup; camera rate is 10 fps)."""
    from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
    from orb_slam2v2_1_tpu.utils import synthetic
    from orb_slam2v2_1_tpu.utils.config import SlamConfig

    cfg = SlamConfig(
        fx=718.856, fy=718.856, cx=607.19, cy=185.22, width=1241, height=376,
        n_features=2000, max_keyframes=64, max_map_points=16384, fps=10.0,
        bf=386.14, th_depth=35.0,
    )
    rng = np.random.default_rng(3)
    room = synthetic.make_room(rng)
    K = jnp.asarray(cfg.K)
    baseline = cfg.bf / cfg.fx
    n = 60
    frames = []
    for i in range(n):
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[0, 3] = -0.08 * i  # forward-lateral dolly
        Tcw[2, 3] = -0.05 * i
        Tr = Tcw.copy()
        Tr[0, 3] -= baseline
        img_l, _ = synthetic.render(room, jnp.asarray(Tcw), K, cfg.width, cfg.height)
        img_r, _ = synthetic.render(room, jnp.asarray(Tr), K, cfg.width, cfg.height)
        frames.append((jax.device_put(img_l), jax.device_put(img_r)))
    slam = SlamSystem(
        config=cfg, sensor=Sensor.STEREO, async_mapping=True, pipelined=True
    )
    t0 = time.time()
    slam.warmup(gba_buckets=(16, 32))
    log(f"KITTI warmup in {time.time() - t0:.1f}s")
    lat = []
    t_run = time.time()
    for i, (l, r) in enumerate(frames):
        t0 = time.perf_counter()
        slam.track_stereo(l, r, timestamp=i * 0.1)
        lat.append(time.perf_counter() - t0)
    wall = time.time() - t_run
    slam.flush()
    tracked = sum(
        1 for e in slam.trajectory.entries if not e.lost
    )
    lat = np.array(lat) * 1e3
    p50 = float(np.percentile(lat, 50))
    out = {
        "kitti_fps": round(n / wall, 2),
        "kitti_p50_ms": round(p50, 1),
        "kitti_p99_ms": round(float(np.percentile(lat, 99)), 1),
    }
    log(
        f"KITTI-geometry stereo (1241x376, 2000 feats, pipelined): "
        f"{out['kitti_fps']} fps, p50={out['kitti_p50_ms']} ms, "
        f"p99={out['kitti_p99_ms']} ms, tracked {tracked}/{n}"
    )
    slam.shutdown()
    return out


def main():
    import dataclasses

    from orb_slam2v2_1_tpu.utils.config import SlamConfig

    cfg = SlamConfig(
        fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
        n_features=1000, max_keyframes=128, max_map_points=16384, fps=10.0,
        bf=44.0, th_depth=100.0,
    )
    N = 321
    t0 = time.time()
    imgs, deps = orbit_frames(cfg, N)
    log(f"rendered {N} frames in {time.time() - t0:.1f}s")
    imgs_d = jax.device_put(jnp.asarray(imgs, jnp.float32))
    deps_d = jax.device_put(jnp.asarray(deps, jnp.float32))
    jax.block_until_ready((imgs_d, deps_d))

    fps, spread = headline(cfg, imgs_d, deps_d)
    extra = {}
    try:
        frames = [
            (jax.device_put(jnp.asarray(imgs[i])), jax.device_put(jnp.asarray(deps[i])))
            for i in range(N)
        ]
        extra.update(online_leg(dataclasses.replace(cfg, fps=30.0), frames))
    except Exception as e:  # detail legs must not kill the headline
        log(f"online leg failed: {e!r}")
    try:
        extra.update(kitti_leg())
    except Exception as e:
        log(f"KITTI leg failed: {e!r}")
    print(
        json.dumps(
            {
                "metric": "rgbd_slam_fps_with_loop_closing",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
                "spread_pct": round(spread * 100, 1),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
