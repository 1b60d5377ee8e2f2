"""Sanity-check timing methodology on the axon TPU tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend())
key = jax.random.key(0)


def timeit_block_each(f, *a, n=10):
    r = f(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*a)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, sum(ts) / n * 1e3


def timeit_pipelined(f, *a, n=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [f(*a) for _ in range(n)]
    jax.block_until_ready(rs[-1])
    return (time.perf_counter() - t0) / n * 1e3


# Known-FLOPs matmul: 4096^3 * 2 = 137 GFLOP; v5e ~394 bf16 TFLOPS peak -> ~0.35ms
A = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
mb, ma = timeit_block_each(mm, A)
mp = timeit_pipelined(mm, A)
print(f"matmul 4096^3 bf16: block-each min={mb:.2f} avg={ma:.2f} | pipelined={mp:.2f} ms")

# Tiny op: roundtrip latency estimate
tiny = jax.jit(lambda a: a + 1)
x = jnp.zeros(8)
tb, ta = timeit_block_each(tiny, x)
tp = timeit_pipelined(tiny, x)
print(f"tiny add:           block-each min={tb:.2f} avg={ta:.2f} | pipelined={tp:.2f} ms")

# ba_window_steps again with both methods
from orb_slam2v2_1_tpu.ops import ba

C, N, P = 32, 1024, 4096
win = ba.BAWindow(
    poses=jnp.tile(jnp.eye(4), (C, 1, 1)),
    points=jax.random.normal(key, (P, 3)) + jnp.array([0, 0, 5.0]),
    pt_idx=jax.random.randint(key, (C, N), 0, P),
    target=jax.random.normal(key, (C, N, 3)) * 100 + 300,
    inv_sigma2=jnp.ones((C, N)),
    is_stereo=jnp.zeros((C, N), bool),
    valid=jnp.ones((C, N), bool),
    cam_fixed=jnp.zeros(C, bool).at[0].set(True),
    K=jnp.array([550.0, 550.0, 320.0, 240.0]),
    bf=jnp.float32(44.0),
)
f15 = jax.jit(lambda w: ba.ba_window_steps(w, iters=15)[1])
bb, bavg = timeit_block_each(f15, win, n=5)
bp = timeit_pipelined(f15, win, n=5)
print(f"ba_window 15 iters: block-each min={bb:.2f} avg={bavg:.2f} | pipelined={bp:.2f} ms")
