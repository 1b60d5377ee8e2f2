"""Bisect WHICH stage balloons inside lax.scan vs standalone."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import frontend, initialization, tracking as trk
from orb_slam2v2_1_tpu.models.map_state import empty_map
from orb_slam2v2_1_tpu.ops import orb, undistort, lie
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


def timeit(f, *a, n=3):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


NF = 39


@jax.jit
def scan_build_only(imgs, deps):
    def step(carry, inputs):
        img, depth = inputs
        fr = frontend._build_frame(img, depth, True, K, dist, bf, ocfg, jnp.int32(0), 640, 480)
        return carry + fr.xy[0, 0] * 1e-20, fr.xy[0]

    return jax.lax.scan(step, jnp.float32(0), (imgs[1:], deps[1:]))[0]


t = timeit(scan_build_only, imgs, deps)
print(f"scan build_frame only:     {t/NF:6.2f} ms/frame")


@jax.jit
def scan_extract_only(imgs):
    def step(carry, img):
        feats = orb.extract_orb(img, ocfg)
        return carry + feats.xy[0, 0] * 1e-20, feats.xy[0]

    return jax.lax.scan(step, jnp.float32(0), imgs[1:])[0]


t = timeit(scan_extract_only, imgs)
print(f"scan extract_orb only:     {t/NF:6.2f} ms/frame")


@jax.jit
def scan_track(state, imgs, deps, first):
    def step(carry, inputs):
        st, last, vel, havev = carry
        img, depth = inputs
        res = frontend.process_frame_impl(
            st, img, depth, last, vel, havev, jnp.int32(0), K, dist, bf,
            depth_limit, jnp.int32(1), ocfg, True, 640, 480, False,
        )
        tracked = res.stats[0] > 0
        new_last = jax.tree.map(lambda a, b: jnp.where(tracked, a, b), res.frame, last)
        return (res.state, new_last, res.velocity, tracked), res.stats[1]

    carry, outs = jax.lax.scan(step, (state, first, jnp.eye(4), jnp.asarray(False)), (imgs[1:], deps[1:]))
    return outs


t = timeit(scan_track, state0, imgs, deps, f0)
print(f"scan process_frame (no kf):{t/NF:6.2f} ms/frame")

# eager loop for comparison
proc = jax.jit(
    lambda st, im, de, last, vel, havev: frontend.process_frame_impl(
        st, im, de, last, vel, havev, jnp.int32(0), K, dist, bf, depth_limit,
        jnp.int32(1), ocfg, True, 640, 480, False,
    )
)


def eager(state, first):
    last, vel, havev = first, jnp.eye(4), jnp.asarray(False)
    st = state
    for i in range(1, 40):
        res = proc(st, imgs[i], deps[i], last, vel, havev)
        st = res.state
        last, vel, havev = res.frame, res.velocity, jnp.asarray(True)
    return res.stats


t = timeit(eager, state0, f0)
print(f"eager process_frame loop:  {t/NF:6.2f} ms/frame")


@jax.jit
def scan_track_cond(state, imgs, deps, first):
    """Same as scan_track + the insert cond with need_kf ALWAYS False."""

    def step(carry, inputs):
        st, last, vel, havev = carry
        img, depth = inputs
        res = frontend.process_frame_impl(
            st, img, depth, last, vel, havev, jnp.int32(0), K, dist, bf,
            depth_limit, jnp.int32(1), ocfg, True, 640, 480, False,
        )
        tracked = res.stats[0] > 0
        need_kf = res.stats[1] < -1.0  # never true, but data-dependent

        def do_insert(args):
            st, fr = args
            st2, kf_id, _, victim, _, _ = frontend.insert_keyframe_fused(
                st, fr, K, bf, depth_limit, jax.random.key(0)
            )
            return st2, kf_id

        state2, new_ref = jax.lax.cond(
            need_kf, do_insert, lambda args: (args[0], jnp.int32(0)), (res.state, res.frame)
        )
        new_last = jax.tree.map(lambda a, b: jnp.where(tracked, a, b), res.frame, last)
        return (state2, new_last, res.velocity, tracked), res.stats[1]

    carry, outs = jax.lax.scan(
        step, (state, first, jnp.eye(4), jnp.asarray(False)), (imgs[1:], deps[1:])
    )
    return outs


t = timeit(scan_track_cond, state0, imgs, deps, f0)
print(f"scan track + dead cond:    {t/NF:6.2f} ms/frame")


@jax.jit
def scan_track_jitcall(state, imgs, deps, first):
    """scan_track but calling the jit-WRAPPED process_frame (like offline.py)."""

    def step(carry, inputs):
        st, last, vel, havev = carry
        img, depth = inputs
        res = frontend.process_frame(
            st, img, depth, last, vel, havev, jnp.int32(0), K, dist, bf,
            depth_limit, jnp.int32(1), ocfg, True, 640, 480, False,
        )
        tracked = res.stats[0] > 0
        new_last = jax.tree.map(lambda a, b: jnp.where(tracked, a, b), res.frame, last)
        return (res.state, new_last, res.velocity, tracked), res.stats[1]

    carry, outs = jax.lax.scan(step, (state, first, jnp.eye(4), jnp.asarray(False)), (imgs[1:], deps[1:]))
    return outs


t = timeit(scan_track_jitcall, state0, imgs, deps, f0)
print(f"scan w/ inner-jit call:    {t/NF:6.2f} ms/frame")
