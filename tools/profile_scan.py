"""Bisect the offline scan: tracking-only vs full pipeline, insertion count."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, offline
from orb_slam2v2_1_tpu.models.map_state import empty_map
from orb_slam2v2_1_tpu.ops import orb
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig

print("backend:", jax.default_backend())

cfg = SlamConfig(
    fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
    n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
    bf=44.0, th_depth=40.0,
)
rng = np.random.default_rng(7)
scene = synthetic.make_desk(rng)
poses = synthetic.desk_trajectory(40)
poses = [p @ np.linalg.inv(poses[0]) for p in poses]
K = jnp.asarray(cfg.K)
frames = []
for Tcw in poses:
    img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
    frames.append((np.asarray(img), np.asarray(depth)))
imgs = np.stack([f[0] for f in frames])
deps = np.stack([f[1] for f in frames])


def run_full():
    t0 = time.time()
    poses_est, ok, state = offline.track_sequence_rgbd(imgs, deps, cfg)
    return time.time() - t0, state


run_full()
wall, state = run_full()
n_kf = int(jnp.sum(state.kf_valid.astype(jnp.int32)))
print(f"full scan: {wall*1e3/len(frames):.1f} ms/frame ({len(frames)/wall:.2f} fps), live KFs: {n_kf}, hw mark n_kf: {int(state.n_kf)}")

# tracking-only: monkeypatch _need_kf to always False
orig = offline._need_kf
offline._need_kf = lambda *a, **k: jnp.asarray(False)
offline.run_sequence_rgbd._clear_cache()


def run_track():
    t0 = time.time()
    poses_est, ok, state = offline.track_sequence_rgbd(imgs, deps, cfg)
    return time.time() - t0, int(ok.sum())


run_track()
wall2, n_ok = run_track()
print(f"track-only scan: {wall2*1e3/len(frames):.1f} ms/frame ({len(frames)/wall2:.2f} fps), ok={n_ok}/40")
offline._need_kf = orig
