"""Time the REAL offline.run_sequence_rgbd scan on device-resident inputs."""
import os, sys, time
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
cfg = SlamConfig(fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
                 n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
                 bf=44.0, th_depth=40.0)
rng = np.random.default_rng(7)
scene = synthetic.make_desk(rng)
poses = synthetic.desk_trajectory(40)
poses = [p @ np.linalg.inv(poses[0]) for p in poses]
K = jnp.asarray(cfg.K)
dist = jnp.asarray(cfg.dist, jnp.float32)
bf = jnp.float32(cfg.bf)
depth_limit = jnp.float32(cfg.bf * cfg.th_depth / cfg.fx)
ocfg = orb.OrbConfig(n_features=cfg.n_features)
frames = [tuple(map(np.asarray, synthetic.render(scene, jnp.asarray(T), K, cfg.width, cfg.height))) for T in poses]
imgs = jnp.asarray(np.stack([f[0] for f in frames]))
deps = jnp.asarray(np.stack([f[1] for f in frames]))
jax.block_until_ready((imgs, deps))

f0 = frontend.build_frame_only(imgs[0], deps[0], K, dist, bf, jnp.int32(0), ocfg, True, cfg.width, cfg.height)
state = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
state, kf0, _ = initialization.create_initial_map_depth(state, f0, K)
f0 = f0._replace(mp=state.kf_mp[0])
jax.block_until_ready(state)

def run():
    t0 = time.perf_counter()
    out = offline.run_sequence_rgbd(imgs, deps, state, f0, K, dist, bf, depth_limit,
                                    ocfg, cfg.width, cfg.height, int(cfg.fps), False)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3

run()
for _ in range(3):
    print(f"run_sequence_rgbd: {run()/39:.2f} ms/frame")
