"""Isolate which pallas kernel slows the scan: FAST vs match."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2v2_1_tpu.models import frontend, initialization, tracking as trk
from orb_slam2v2_1_tpu.models.map_state import empty_map
from orb_slam2v2_1_tpu.ops import ba, lie, matching, hamming, orb, pallas_kernels as pk
from orb_slam2v2_1_tpu.ops.projection import project
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig

print("backend:", jax.default_backend(), "pallas:", pk.enabled())
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
ocfg = orb.OrbConfig(n_features=cfg.n_features)
frames = []
for Tcw in poses:
    img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
    frames.append((np.asarray(img), np.asarray(depth)))
imgs = jnp.asarray(np.stack([f[0] for f in frames]))
deps = jnp.asarray(np.stack([f[1] for f in frames]))
f0 = frontend.build_frame_only(imgs[0], deps[0], K, dist, bf, jnp.int32(0), ocfg, True, cfg.width, cfg.height)
state0 = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
state0, kf0, _ = initialization.create_initial_map_depth(state0, f0, K)
f0 = f0._replace(mp=state0.kf_mp[0])
jax.block_until_ready((imgs, deps, state0))

def timeit(f, *a, n=3):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

NF = 39

def make_scan(use_pallas_match):
    @jax.jit
    def run(state, imgs, deps, first):
        def step(carry, inputs):
            st, last, vel = carry
            img, depth = inputs
            cur = frontend._build_frame(img, depth, True, K, dist, bf, ocfg, jnp.int32(1), 640, 480)
            T_pred = lie.orthonormalize(vel @ last.pose)
            q_mp = last.mp
            q_has = (q_mp >= 0) & last.kp_valid
            pw = st.mp_pos[jnp.maximum(q_mp, 0)]
            pred_xy = project(T_pred, pw, K)
            pc_z = (T_pred[2, :3] @ pw.T) + T_pred[2, 3]
            q_has = q_has & (pc_z > 0) & st.mp_valid[jnp.maximum(q_mp, 0)]
            radius = 7.0 * trk.SCALE ** last.level.astype(jnp.float32)
            if use_pallas_match:
                bi, b, s = pk.masked_best_two(
                    last.desc_pm1, pred_xy, last.level, q_has, radius,
                    cur.desc_pm1, cur.xy, cur.level, cur.kp_valid,
                )
                ok = (b <= matching.TH_HIGH) & (b.astype(jnp.float32) <= 0.9 * s.astype(jnp.float32))
                m = matching.resolve_duplicates(bi, b, ok, cur.desc_pm1.shape[0])
            else:
                mask = (matching.window_mask(pred_xy, cur.xy, radius)
                        & matching.level_mask(last.level, cur.level)
                        & q_has[:, None] & cur.kp_valid[None, :])
                mm = matching.match_nn(last.desc_pm1, cur.desc_pm1, mask, matching.TH_HIGH, 0.9)
                m = matching.resolve_duplicates(mm.idx, mm.dist, mm.ok, cur.desc_pm1.shape[0])
            N = cur.mp.shape[0]
            cur_mp = jnp.full_like(cur.mp, -1)
            cur_mp = cur_mp.at[jnp.where(m.ok, m.idx, N)].set(jnp.where(m.ok, q_mp, -1), mode="drop")
            out_frame = cur._replace(pose=T_pred, mp=cur_mp)
            tracked = jnp.sum((cur_mp >= 0).astype(jnp.int32)) > 10
            new_last = jax.tree.map(lambda a, b: jnp.where(tracked, a, b), out_frame, last)
            return (st, new_last, vel), jnp.sum(cur_mp >= 0)
        carry, outs = jax.lax.scan(step, (state, first, jnp.eye(4)), (imgs[1:], deps[1:]))
        return outs
    return run

t = timeit(make_scan(False), state0, imgs, deps, f0)
print(f"scan mm-match XLA:    {t/NF:6.2f} ms/frame")
t = timeit(make_scan(True), state0, imgs, deps, f0)
print(f"scan mm-match pallas: {t/NF:6.2f} ms/frame")
