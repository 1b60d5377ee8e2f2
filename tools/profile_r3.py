"""Round-3 micro-profiling: isolate the ms sinks inside tracking + insertion."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend())


def timeit(f, *a, n=20, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.key(0)

# 1. Batched tiny SVD (triangulation): (10*1024, 4, 4)
A = jax.random.normal(key, (10240, 4, 4))
svd = jax.jit(lambda a: jnp.linalg.svd(a)[2][..., -1, :])
print(f"svd 10240x4x4:        {timeit(svd, A):.2f} ms")

# eigh alternative on AtA
eigh = jax.jit(lambda a: jnp.linalg.eigh(jnp.einsum('bij,bik->bjk', a, a))[1][..., 0])
print(f"eigh 10240x4x4:       {timeit(eigh, A):.2f} ms")

# 2. top_k over M=16384, k=4096 (local map selection)
score = jax.random.randint(key, (16384,), 0, 2)
topk = jax.jit(lambda s: jax.lax.top_k(s, 4096))
print(f"top_k 16384->4096:    {timeit(topk, score):.2f} ms")

# argsort full
ars = jax.jit(lambda s: jnp.argsort(s))
print(f"argsort 16384:        {timeit(ars, score):.2f} ms")
big = jax.random.randint(key, (131072,), 0, 16384)
ars2 = jax.jit(lambda s: jnp.argsort(s, stable=True))
print(f"argsort 131072 stable:{timeit(ars2, big):.2f} ms")

# 3. covisibility on the bench map shape
from orb_slam2v2_1_tpu.models.map_state import empty_map, covisibility

st = empty_map(128, 16384, 1024)
kf_mp = jax.random.randint(key, (128, 1024), -1, 16384)
st = st._replace(
    kf_mp=kf_mp,
    kf_kp_valid=jnp.ones((128, 1024), bool),
    kf_valid=jnp.ones(128, bool),
    mp_valid=jnp.ones(16384, bool),
)
print(f"covisibility 128x16k: {timeit(covisibility, st):.2f} ms")

# 4. window BA single iteration cost
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
for it in (1, 5, 15):
    f = jax.jit(lambda w, i=it: ba.ba_window_steps(w, iters=i)[1])
    print(f"ba_window_steps it={it:2d}: {timeit(f, win, n=5):.2f} ms")

# 5. match_nn 1024x1024 (the matmul core)
from orb_slam2v2_1_tpu.ops import matching, hamming

d1 = jax.random.randint(key, (1024, 8), 0, 2**31 - 1, jnp.uint32)
d2 = jax.random.randint(jax.random.key(1), (1024, 8), 0, 2**31 - 1, jnp.uint32)
p1 = hamming.unpack_pm1(d1)
p2 = hamming.unpack_pm1(d2)
mask = jnp.ones((1024, 1024), bool)
mn = jax.jit(lambda a, b, m: matching.match_nn(a, b, m, max_dist=50, nn_ratio=1.0))
print(f"match_nn 1024x1024:   {timeit(mn, p1, p2, mask):.2f} ms")
vm = jax.jit(
    lambda a, b, m: jax.vmap(lambda x: matching.match_nn(x, b, m, max_dist=50, nn_ratio=1.0))(a)
)
p10 = jnp.tile(p1[None], (10, 1, 1))
print(f"match_nn x10 vmap:    {timeit(vm, p10, p2, mask):.2f} ms")

# 6. unpack_pm1 cost
up = jax.jit(lambda d: hamming.unpack_pm1(d))
d16 = jax.random.randint(key, (16384, 8), 0, 2**31 - 1, jnp.uint32)
print(f"unpack_pm1 16384:     {timeit(up, d16):.2f} ms")

# 7. nanmedian 1024 x10
x = jax.random.normal(key, (10, 1024))
nm = jax.jit(lambda a: jnp.nanmedian(a, axis=1))
print(f"nanmedian 10x1024:    {timeit(nm, x):.2f} ms")

# 8. pose_optimization cost (tracking: called 2x per frame)
obs = ba.Obs(
    cam_idx=jnp.zeros(1024, jnp.int32),
    pt_idx=jax.random.randint(key, (1024,), 0, P),
    target=jax.random.normal(key, (1024, 3)) * 100 + 300,
    inv_sigma2=jnp.ones(1024),
    is_stereo=jnp.zeros(1024, bool),
    valid=jnp.ones(1024, bool),
)
po = jax.jit(lambda T, p, o: ba.pose_optimization(T, p, o, win.K, win.bf))
pts = jax.random.normal(key, (16384, 3)) + jnp.array([0, 0, 5.0])
print(f"pose_optimization:    {timeit(po, jnp.eye(4), pts, obs):.2f} ms")

# 9. scatter-based incidence build alone
def inc_build(st):
    K, NN = st.kf_mp.shape
    M = st.mp_pos.shape[0]
    mp = jnp.where(st.kf_kp_valid & (st.kf_mp >= 0), st.kf_mp, M)
    inc = jnp.zeros((K, M + 1), jnp.bfloat16)
    inc = inc.at[jnp.arange(K)[:, None], mp].set(1.0)
    return inc

ib = jax.jit(inc_build)
print(f"incidence scatter:    {timeit(ib, st):.2f} ms")
