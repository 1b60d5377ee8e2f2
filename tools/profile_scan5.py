"""Cumulative in-scan bisect of the tracking stages."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, tracking as trk
from orb_slam2v2_1_tpu.models.map_state import empty_map, mp_observation_count
from orb_slam2v2_1_tpu.ops import ba, lie, matching, orb
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
dist = jnp.asarray(cfg.dist, jnp.float32)
bf = jnp.float32(cfg.bf)
depth_limit = jnp.float32(cfg.bf * cfg.th_depth / cfg.fx)
ocfg = orb.OrbConfig(n_features=cfg.n_features)
frames = []
for Tcw in poses:
    img, depth = synthetic.render(scene, jnp.asarray(Tcw), K, cfg.width, cfg.height)
    frames.append((np.asarray(img), np.asarray(depth)))
imgs = jnp.asarray(np.stack([f[0] for f in frames]))
deps = jnp.asarray(np.stack([f[1] for f in frames]))

f0 = frontend.build_frame_only(
    imgs[0], deps[0], K, dist, bf, jnp.int32(0), ocfg, True, cfg.width, cfg.height
)
state0 = empty_map(cfg.max_keyframes, cfg.max_map_points, cfg.n_features)
state0, kf0, _ = initialization.create_initial_map_depth(state0, f0, K)
f0 = f0._replace(mp=state0.kf_mp[0])
jax.block_until_ready((imgs, deps, state0))


def timeit(f, *a, n=3):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


NF = 39
img_wh = jnp.asarray([cfg.width, cfg.height], jnp.float32)


def make_scan(stage):
    @jax.jit
    def run(state, imgs, deps, first):
        def step(carry, inputs):
            st, last, vel, havev = carry
            img, depth = inputs
            cur = frontend._build_frame(
                img, depth, True, K, dist, bf, ocfg, jnp.int32(1), 640, 480
            )
            T_pred = lie.orthonormalize(vel @ last.pose)

            # motion-model matching only
            q_mp = last.mp
            q_has = (q_mp >= 0) & last.kp_valid
            pw = st.mp_pos[jnp.maximum(q_mp, 0)]
            from orb_slam2v2_1_tpu.ops.projection import project

            pred_xy = project(T_pred, pw, K)
            pc_z = (T_pred[2, :3] @ pw.T) + T_pred[2, 3]
            q_has = q_has & (pc_z > 0) & st.mp_valid[jnp.maximum(q_mp, 0)]
            radius = 7.0 * trk.SCALE ** last.level.astype(jnp.float32)
            m = matching.match_projection(
                q_desc=last.desc_pm1, q_xy_pred=pred_xy, q_level_pred=last.level,
                q_valid=q_has, t_desc=cur.desc_pm1, t_xy=cur.xy, t_level=cur.level,
                t_valid=cur.kp_valid, radius=radius, max_dist=matching.TH_HIGH,
                nn_ratio=0.9,
            )
            dang = last.angle - cur.angle[m.idx]
            ok = matching.rotation_consistency(dang, m.ok)
            N = cur.mp.shape[0]
            cur_mp = jnp.full_like(cur.mp, -1)
            cur_mp = cur_mp.at[jnp.where(ok, m.idx, N)].set(
                jnp.where(ok, q_mp, -1), mode="drop"
            )
            Tcw = T_pred
            if stage >= 2:  # + pose optimization
                obs = trk.make_obs_from_frame(cur.xy, cur.ur, cur.level, cur_mp, cur.kp_valid)
                Tcw, inlier_mask, n_in = ba.pose_optimization(T_pred, st.mp_pos, obs, K, bf)
                cur_mp = jnp.where(inlier_mask | (cur_mp < 0), cur_mp, -1)
            if stage >= 3:  # + local map track
                cur1 = cur._replace(pose=Tcw, mp=cur_mp)
                st, Tcw, cur_mp, st2 = trk.track_local_map(
                    st, cur1, Tcw, K, bf, jnp.float32(0.5), img_wh
                )
            out_frame = cur._replace(pose=Tcw, mp=cur_mp)
            tracked = jnp.sum((cur_mp >= 0).astype(jnp.int32)) > 10
            new_last = jax.tree.map(lambda a, b: jnp.where(tracked, a, b), out_frame, last)
            vel_new = lie.orthonormalize(Tcw @ lie.se3_inverse(last.pose))
            return (st, new_last, vel_new, tracked), jnp.sum(cur_mp >= 0)

        carry, outs = jax.lax.scan(
            step, (state, first, jnp.eye(4), jnp.asarray(False)), (imgs[1:], deps[1:])
        )
        return outs

    return run

for stage, name in ((1, "build+mm-match"), (2, "+pose_opt"), (3, "+local_map")):
    t = timeit(make_scan(stage), state0, imgs, deps, f0)
    print(f"scan stage {name:14s}: {t/NF:6.2f} ms/frame")
