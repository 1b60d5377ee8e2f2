"""Online pipelined-tracking latency on the real TPU: per-frame wall-time
percentiles over an orbit sequence with loop closure, after warmup."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
from orb_slam2v2_1_tpu.ops import lie
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def orbit(cfg, n_frames):
    import os

    cache = f"/tmp/orbit_cache_{cfg.width}x{cfg.height}_{n_frames}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        imgs, deps = z["imgs"], z["deps"]
        return [
            (jax.device_put(jnp.asarray(imgs[i])), jax.device_put(jnp.asarray(deps[i])))
            for i in range(n_frames)
        ]
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
    np.savez(cache, imgs=np.stack(imgs), deps=np.stack(deps))
    return [
        (jax.device_put(jnp.asarray(imgs[i])), jax.device_put(jnp.asarray(deps[i])))
        for i in range(n_frames)
    ]


def main(n=200):
    cfg = SlamConfig(
        fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
        n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
        bf=44.0, th_depth=100.0,
    )
    t0 = time.time()
    frames = orbit(cfg, n)
    log(f"rendered {n} frames in {time.time() - t0:.1f}s")

    slam = SlamSystem(
        config=cfg, sensor=Sensor.RGBD, async_mapping=True, pipelined=True
    )
    t0 = time.time()
    slam.warmup(verbose=True)
    log(f"warmup in {time.time() - t0:.1f}s")

    # Instrument: split each call into drain / rest.
    drain_t = []
    orig_drain = slam._drain_pending

    def timed_drain(*a, **k):
        t0 = time.perf_counter()
        r = orig_drain(*a, **k)
        drain_t.append(time.perf_counter() - t0)
        return r

    slam._drain_pending = timed_drain
    inliers = []
    orig_health = slam._update_health

    def spy_health(tracked_ok, stats):
        inliers.append(int(stats[1]))
        return orig_health(tracked_ok, stats)

    slam._update_health = spy_health
    kf_before = []

    lat = []
    active = []
    t_run = time.time()
    for i, (im, d) in enumerate(frames):
        kf_before.append(slam.n_kf_host)
        active.append(slam._pipelining_active())
        t0 = time.perf_counter()
        slam.track_rgbd(im, d, timestamp=i / 30.0)
        lat.append(time.perf_counter() - t0)
    wall = time.time() - t_run
    log(f"pipelining active on {sum(active)}/{len(active)} frames")
    iq = np.array(inliers)
    log(
        f"stage2 inliers: p10={np.percentile(iq, 10):.0f} "
        f"p50={np.percentile(iq, 50):.0f} min={iq.min()} "
        f"frac>=60: {(iq >= 60).mean():.2f}"
    )
    bad = np.where(iq < 30)[0]
    log(f"frames with <30 inliers (decision order): {bad}")
    la_ = np.array(lat) * 1e3
    kfb = np.array(kf_before)
    for b in bad[:20]:
        if b < len(la_):
            log(
                f"  decision#{b}: inliers={iq[b]} lat_ms={la_[b]:.0f} "
                f"kf_at_dispatch={kfb[b] if b < len(kfb) else '?'} "
                f"active={active[b] if b < len(active) else '?'}"
            )
    slam.flush()
    drain_t = np.array(drain_t) * 1e3
    log(
        f"drain ms: p50={np.percentile(drain_t, 50):.1f} "
        f"p90={np.percentile(drain_t, 90):.1f} max={drain_t.max():.1f} "
        f"n={len(drain_t)}"
    )
    kfb = np.array(kf_before)
    la = np.array(lat) * 1e3
    kf_frames = np.where(np.diff(kfb) > 0)[0]
    log(f"kf inserted before frames: {kf_frames}")
    log(f"latency at those frames: {la[kf_frames + 1].round(1)}")
    lat = np.array(lat) * 1e3
    log(
        f"{n} frames in {wall:.2f}s ({n / wall:.1f} fps) | per-frame ms: "
        f"p50={np.percentile(lat, 50):.1f} p90={np.percentile(lat, 90):.1f} "
        f"p99={np.percentile(lat, 99):.1f} max={lat.max():.1f}"
    )
    log(f"worst 8 frames: {np.sort(lat)[-8:].round(1)} at {np.argsort(lat)[-8:]}")
    log(
        f"kf={slam.n_kf_host} loops={slam.n_loops_closed} "
        f"resets={slam.n_resets} state={slam.state}"
    )
    log("stats:", {k: (round(v, 1) if isinstance(v, float) else v)
                   for k, v in slam.stats().items() if v is not None})
    slam.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
