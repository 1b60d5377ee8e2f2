"""Judge repro: the BENCH_r05 online-leg TPU failure, with full traceback."""
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
import bench


def main():
    cfg = SlamConfig(
        fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
        n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
        bf=44.0, th_depth=100.0,
    )
    N = 321
    t0 = time.time()
    imgs, deps = bench.orbit_frames(cfg, N)
    print(f"rendered {N} frames in {time.time()-t0:.1f}s", flush=True)
    frames = [
        (jax.device_put(jnp.asarray(imgs[i])), jax.device_put(jnp.asarray(deps[i])))
        for i in range(N)
    ]
    slam = SlamSystem(config=cfg, sensor=Sensor.RGBD, async_mapping=True, pipelined=True)
    t0 = time.time()
    slam.warmup()
    print(f"warmup in {time.time()-t0:.1f}s", flush=True)
    try:
        for i, (img, depth) in enumerate(frames):
            slam.track_rgbd(img, depth, timestamp=i / 30.0)
            if i % 20 == 0:
                print(f"frame {i} ok", flush=True)
        slam.flush()
        print("DONE no failure; stats:", slam.stats(), flush=True)
    except Exception:
        traceback.print_exc()
        print("FAILED at frame", i, flush=True)
    slam.shutdown()


if __name__ == "__main__":
    sys.exit(main())
