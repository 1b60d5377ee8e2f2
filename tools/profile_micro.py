"""Micro-benchmarks for solver building blocks on the real device."""

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
C6 = 288
A = jnp.asarray(rng.standard_normal((C6, C6)), jnp.float32)
S = A @ A.T + 100.0 * jnp.eye(C6)
rhs = jnp.asarray(rng.standard_normal(C6), jnp.float32)

cho = jax.jit(lambda S, b: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b))
print(f"cho_solve 288:      {timeit(cho, S, rhs):.3f} ms")

lu = jax.jit(lambda S, b: jnp.linalg.solve(S, b))
print(f"lu_solve 288:       {timeit(lu, S, rhs):.3f} ms")


def cg_solve(S, b, iters=24):
    Sb = S.reshape(48, 6, 48, 6)
    diag = Sb[jnp.arange(48), :, jnp.arange(48), :]  # (48,6,6)
    Minv = jnp.linalg.inv(diag)

    def precond(r):
        return jnp.einsum("cab,cb->ca", Minv, r.reshape(48, 6)).reshape(-1)

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z

    def body(i, st):
        x, r, z, p = st
        Sp = S @ p
        rz = r @ z
        alpha = rz / jnp.maximum(p @ Sp, 1e-20)
        x = x + alpha * p
        r2 = r - alpha * Sp
        z2 = precond(r2)
        beta = (r2 @ z2) / jnp.maximum(rz, 1e-20)
        return (x, r2, z2 + beta * p, z2)[0:2] + (z2, z2 + beta * p)

    x, r, z, p = jax.lax.fori_loop(0, iters, body, (x, r, z, p))
    return x


cg = jax.jit(cg_solve)
print(f"cg24+blockjacobi:   {timeit(cg, S, rhs):.3f} ms")

# batched 3x3 inverse: LU vs adjugate
P = 8192
H = jnp.asarray(rng.standard_normal((P, 3, 3)), jnp.float32)
H = H @ H.transpose(0, 2, 1) + 10.0 * jnp.eye(3)
inv_lu = jax.jit(jnp.linalg.inv)
print(f"inv LU (8192,3,3):  {timeit(inv_lu, H):.3f} ms")


def inv3_adj(H):
    a, b, c = H[:, 0, 0], H[:, 0, 1], H[:, 0, 2]
    d, e, f = H[:, 1, 0], H[:, 1, 1], H[:, 1, 2]
    g, h, i = H[:, 2, 0], H[:, 2, 1], H[:, 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    idet = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            Cc, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    return adj * idet[:, None, None]


inv_adj = jax.jit(inv3_adj)
x1 = inv_lu(H)
x2 = inv_adj(H)
print("  adj err:", float(jnp.max(jnp.abs(x1 - x2))))
print(f"inv adj (8192,3,3): {timeit(inv_adj, H):.3f} ms")

# batched 6x6 inverse for preconditioner
H6 = jnp.asarray(rng.standard_normal((48, 6, 6)), jnp.float32)
H6 = H6 @ H6.transpose(0, 2, 1) + 10.0 * jnp.eye(6)
print(f"inv LU (48,6,6):    {timeit(inv_lu, H6):.3f} ms")

# gather vs scatter for B construction
O = 24576
Csz = 48
N = 1000
vals = jnp.asarray(rng.standard_normal((Csz, N, 6, 3)), jnp.float32)
slot_of = jnp.asarray(rng.integers(0, N, (P, Csz)), jnp.int32)
gatherB = jax.jit(lambda v, s: v[jnp.arange(Csz)[None, :], s])  # (P,C,6,3)
print(f"gather B (P,C,6,3): {timeit(gatherB, vals, slot_of):.3f} ms")

pt = jnp.asarray(rng.integers(0, P, (O,)), jnp.int32)
cam = jnp.asarray(rng.integers(0, Csz, (O,)), jnp.int32)
Bo = jnp.asarray(rng.standard_normal((O, 6, 3)), jnp.float32)
scatterB = jax.jit(lambda Bo: jnp.zeros((P, Csz, 6, 3)).at[pt, cam].add(Bo))
print(f"scatter B:          {timeit(scatterB, Bo):.3f} ms")

# S_corr: einsum pcay,pdby->cadb vs explicit matmul
B = gatherB(vals, slot_of)
Hpp_inv = inv_adj(H)


def s_einsum(B, Hi):
    U = jnp.einsum("pcax,pxy->pcay", B, Hi)
    return jnp.einsum("pcay,pdby->cadb", U, B)


def s_matmul(B, Hi):
    U = jnp.einsum("pcax,pxy->pcay", B, Hi)
    U2 = U.transpose(1, 2, 0, 3).reshape(Csz * 6, P * 3)
    B2 = B.transpose(1, 2, 0, 3).reshape(Csz * 6, P * 3)
    return (U2 @ B2.T).reshape(Csz, 6, Csz, 6).transpose(0, 1, 2, 3)


se = jax.jit(s_einsum)
sm = jax.jit(s_matmul)
r1 = se(B, Hpp_inv)
r2 = sm(B, Hpp_inv).reshape(Csz, 6, Csz, 6)
print("  S err:", float(jnp.max(jnp.abs(r1.reshape(Csz,6,Csz,6) - r2))))
print(f"S einsum:           {timeit(se, B, Hpp_inv):.3f} ms")
print(f"S matmul:           {timeit(sm, B, Hpp_inv):.3f} ms")

# pose_optimization standalone
from orb_slam2v2_1_tpu.ops import ba

Np = 1000
pts = jnp.asarray(rng.standard_normal((Np, 3)) * 2 + np.array([0, 0, 5]), jnp.float32)
K4 = jnp.asarray([550.0, 550.0, 320.0, 240.0])
uv = pts[:, :2] / pts[:, 2:3] * 550.0 + jnp.asarray([320.0, 240.0])
obs = ba.Obs(
    cam_idx=jnp.zeros(Np, jnp.int32),
    pt_idx=jnp.arange(Np, dtype=jnp.int32),
    target=jnp.concatenate([uv, uv[:, :1] - 44.0 / pts[:, 2:3]], -1),
    inv_sigma2=jnp.ones(Np),
    is_stereo=jnp.ones(Np, bool),
    valid=jnp.ones(Np, bool),
)
po = jax.jit(lambda T, p, o: ba.pose_optimization(T, p, o, K4, jnp.float32(44.0)))
print(f"pose_optimization:  {timeit(po, jnp.eye(4), pts, obs):.3f} ms")
