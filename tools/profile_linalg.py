"""Microbench the small-linalg primitives used in the hot path on TPU."""

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


rng = np.random.default_rng(0)

# 1. batched 4x4 SVD (triangulate): 10 pairs x 1000 kp
A = jnp.asarray(rng.normal(size=(10000, 4, 4)), jnp.float32)
svd = jax.jit(lambda a: jnp.linalg.svd(a)[2])
print(f"svd 4x4 x10k:      {timeit(svd, A):8.2f} ms")

# 2. closed-form smallest-singular via normal eq 3x3 solve
def inhom_dlt(a):
    B = a[..., :3]
    c = -a[..., 3]
    M = jnp.einsum("nij,nik->njk", B, B)
    b = jnp.einsum("nij,ni->nj", B, c)
    # adjugate 3x3 solve
    from orb_slam2v2_1_tpu.ops.ba import _inv3x3
    return jnp.einsum("nij,nj->ni", _inv3x3(M), b)

dlt = jax.jit(inhom_dlt)
print(f"inhom-dlt x10k:    {timeit(dlt, A):8.2f} ms")

# 3. 6x6 solve (pose opt LM iteration)
H = jnp.asarray(rng.normal(size=(6, 6)), jnp.float32)
H = H @ H.T + 6 * jnp.eye(6)
g = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
s6 = jax.jit(jnp.linalg.solve)
print(f"solve 6x6 x1:      {timeit(s6, H, g):8.2f} ms")

# 4. cholesky 192x192 + solve (window BA reduced system)
S = jnp.asarray(rng.normal(size=(192, 192)), jnp.float32)
S = S @ S.T + 192 * jnp.eye(192)
b = jnp.asarray(rng.normal(size=(192,)), jnp.float32)
s192 = jax.jit(jnp.linalg.solve)
print(f"solve 192 (LU):    {timeit(s192, S, b):8.2f} ms")
cho = jax.jit(lambda S, b: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b))
print(f"cho_solve 192:     {timeit(cho, S, b):8.2f} ms")

# 5. batched 3x3 inv: linalg vs closed form
Hp = jnp.asarray(rng.normal(size=(4096, 3, 3)), jnp.float32)
Hp = jnp.einsum("nij,nkj->nik", Hp, Hp) + 3 * jnp.eye(3)
i3 = jax.jit(jnp.linalg.inv)
print(f"inv 3x3 x4096:     {timeit(i3, Hp):8.2f} ms")
from orb_slam2v2_1_tpu.ops.ba import _inv3x3
i3c = jax.jit(_inv3x3)
print(f"inv3x3 closed:     {timeit(i3c, Hp):8.2f} ms")

# 6. nanmedian of 1000 x10
X = jnp.asarray(rng.normal(size=(10, 1000)), jnp.float32)
nm = jax.jit(lambda x: jnp.nanmedian(x, axis=1))
print(f"nanmedian x10:     {timeit(nm, X):8.2f} ms")

# 7. one LM iteration of window BA vs 15
from orb_slam2v2_1_tpu.ops import ba as ba_ops

C, N, P = 32, 1000, 4096
win = ba_ops.BAWindow(
    poses=jnp.tile(jnp.eye(4), (C, 1, 1)),
    points=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 5], jnp.float32),
    pt_idx=jnp.asarray(rng.integers(0, P, (C, N)), jnp.int32),
    target=jnp.asarray(rng.normal(size=(C, N, 3)) * 100 + 300, jnp.float32),
    inv_sigma2=jnp.ones((C, N)),
    is_stereo=jnp.ones((C, N), bool),
    valid=jnp.ones((C, N), bool),
    cam_fixed=jnp.zeros(C, bool).at[0].set(True),
    K=jnp.asarray([550.0, 550.0, 320.0, 240.0]),
    bf=jnp.float32(44.0),
)
for it in (1, 5, 15):
    f = jax.jit(lambda w: ba_ops.ba_window_steps(w, iters=it, robust=True)[1])
    print(f"ba_window {it:2d} it:   {timeit(f, win, n=5):8.2f} ms")

# 8. pose optimization (4x10)
O = 1000
obs = ba_ops.Obs(
    cam_idx=jnp.zeros(O, jnp.int32),
    pt_idx=jnp.asarray(rng.integers(0, P, O), jnp.int32),
    target=jnp.asarray(rng.normal(size=(O, 3)) * 100 + 300, jnp.float32),
    inv_sigma2=jnp.ones(O),
    is_stereo=jnp.ones(O, bool),
    valid=jnp.ones(O, bool),
)
pts = jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 5], jnp.float32)
po = jax.jit(lambda o: ba_ops.pose_optimization(jnp.eye(4), pts, o, win.K, win.bf)[0])
print(f"pose_opt 4x10:     {timeit(po, obs, n=10):8.2f} ms")
