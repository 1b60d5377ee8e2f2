"""Isolate the sustained 0-inlier collapse on the online orbit: compare
sync (no async mapping), async (no pipelining), and async+pipelined."""

import sys
import time

import numpy as np
import jax

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from profile_online import orbit, log


def run(mode, frames, cfg):
    kw = dict(
        sync=dict(),
        asyncm=dict(async_mapping=True),
        pipe=dict(async_mapping=True, pipelined=True),
    )[mode]
    slam = SlamSystem(config=cfg, sensor=Sensor.RGBD, **kw)
    inl = []
    orig = slam._update_health

    def spy(tracked_ok, stats):
        inl.append(int(stats[1]))
        return orig(tracked_ok, stats)

    slam._update_health = spy
    dec = []
    orig_need = slam._need_new_keyframe_stats

    def spy_need(stats, frame_id=None, lag=0):
        need = orig_need(stats, frame_id=frame_id, lag=lag)
        dec.append(
            (
                frame_id if frame_id is not None else slam.frame_id,
                int(stats[1]), int(stats[3]), int(stats[4]), int(stats[5]),
                slam.last_kf_frame, bool(need),
            )
        )
        return need

    slam._need_new_keyframe_stats = spy_need
    reloc_calls = [0]
    from orb_slam2v2_1_tpu.models import relocalization as rl

    orig_rl = rl.relocalize

    def spy_rl(*a, **k):
        reloc_calls[0] += 1
        return orig_rl(*a, **k)

    rl.relocalize = spy_rl
    t0 = time.time()
    n_ok = 0
    for i, (im, d) in enumerate(frames):
        out = slam.track_rgbd(im, d, timestamp=i / 30.0)
        n_ok += out is not None
    slam.flush()
    rl.relocalize = orig_rl
    iq = np.array(inl)
    log(
        f"{mode}: ok={n_ok}/{len(frames)} kf={slam.n_kf_host} "
        f"loops={slam.n_loops_closed} resets={slam.n_resets} "
        f"relocs={reloc_calls[0]} zero_inl={(iq == 0).sum()} "
        f"<30_inl={(iq < 30).sum()} wall={time.time() - t0:.1f}s"
    )
    bad = np.where(iq < 30)[0]
    log(f"  bad decisions: {bad[:40]}")
    log("  fid inl refm trckd untrckd lastkf need")
    for d in dec:
        if d[0] < 100:
            log(f"  {d[0]:4d} {d[1]:4d} {d[2]:4d} {d[3]:4d} {d[4]:4d} {d[5]:4d} {d[6]}")
    slam.shutdown()


def main():
    cfg = SlamConfig(
        fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
        n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
        bf=44.0, th_depth=100.0,
    )
    frames = orbit(cfg, 200)
    log("frames ready")
    for mode in sys.argv[1:] or ["sync", "asyncm", "pipe"]:
        run(mode, frames, cfg)


if __name__ == "__main__":
    main()
