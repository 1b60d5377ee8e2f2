"""Compare S-build variants for the window Schur step (amortized, real TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import ba

print("backend:", jax.default_backend())

key = jax.random.key(0)
C, N, P = 32, 1024, 4096
lam = jnp.float32(1e-4)

Gp = jax.random.normal(key, (P, C, 30), jnp.float32)
Hcc = jax.random.normal(key, (C, 6, 6))
cam_fixed = jnp.zeros(C, bool).at[0].set(True)
gc = jax.random.normal(key, (C, 6))


def timeit(f, *a, n=5, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def amort(name, fn, carry0=jnp.float32(0)):
    def rep(k):
        def body(i, acc):
            return fn(acc)

        return jax.jit(lambda: jax.lax.fori_loop(0, k, body, carry0))

    t1 = timeit(rep(1))
    t11 = timeit(rep(11))
    print(f"{name:28s} {(t11 - t1) / 10:7.3f} ms/step")


def common(Gp):
    B = Gp[..., :18].reshape(P, C, 6, 3)
    Hpp = jnp.sum(Gp[..., 18:27], axis=1).reshape(P, 3, 3)
    gp = jnp.sum(Gp[..., 27:30], axis=1)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6)[..., None] * jnp.eye(3)
    Hpp_inv = ba._inv3x3(Hpp_d)
    U = jnp.einsum("pcax,pxy->pcay", B, Hpp_inv)
    return B, U, Hpp_inv, gp


def v1(acc):
    """Current: transpose + reshape + dot."""
    B, U, Hpp_inv, gp = common(Gp + acc)
    U2 = U.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    B2 = B.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    S = -jnp.dot(U2, B2.T, preferred_element_type=jnp.float32)
    return S[0, 0] * 1e-20


def v2(acc):
    """einsum direct — let XLA pick layouts."""
    B, U, Hpp_inv, gp = common(Gp + acc)
    S = -jnp.einsum("pcax,pdbx->cadb", U, B).reshape(C * 6, C * 6)
    return S[0, 0] * 1e-20


def v3(acc):
    """bf16 inputs, f32 accumulate."""
    B, U, Hpp_inv, gp = common(Gp + acc)
    S = -jnp.einsum(
        "pcax,pdbx->cadb",
        U.astype(jnp.bfloat16),
        B.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(C * 6, C * 6)
    return S[0, 0] * 1e-20


def v4(acc):
    """Contract with P-major flattening: (P3, C6) matrices via reshape only.

    Build Z = permute B to (P,3,C,6) first via swap of last two axes (cheap?),
    then reshape to (P*3, C*6) and do S = Z^T (Hppinv-scaled Z).
    """
    Gp_ = Gp + acc
    B = Gp_[..., :18].reshape(P, C, 6, 3)
    Hpp = jnp.sum(Gp_[..., 18:27], axis=1).reshape(P, 3, 3)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6)[..., None] * jnp.eye(3)
    Hpp_inv = ba._inv3x3(Hpp_d)
    Bz = B.transpose(0, 3, 1, 2).reshape(P, 3, C * 6)  # (P,3,C6)
    Uz = jnp.einsum("pxy,pyc->pxc", Hpp_inv, Bz)  # (P,3,C6)
    S = -jnp.einsum("pxc,pxd->cd", Uz, Bz)
    return S[0, 0] * 1e-20


def v5(acc):
    """v4 in bf16 for the big contraction."""
    Gp_ = Gp + acc
    B = Gp_[..., :18].reshape(P, C, 6, 3)
    Hpp = jnp.sum(Gp_[..., 18:27], axis=1).reshape(P, 3, 3)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6)[..., None] * jnp.eye(3)
    Hpp_inv = ba._inv3x3(Hpp_d)
    Bz = B.transpose(0, 3, 1, 2).reshape(P, 3, C * 6)
    Uz = jnp.einsum("pxy,pyc->pxc", Hpp_inv, Bz)
    S = -jnp.einsum(
        "pxc,pxd->cd",
        Uz.astype(jnp.bfloat16),
        Bz.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return S[0, 0] * 1e-20


amort("v1 transpose+dot (current)", v1)
amort("v2 einsum direct", v2)
amort("v3 einsum bf16", v3)
amort("v4 P-major reshape", v4)
amort("v5 P-major bf16", v5)

# gather variants
G = jax.random.normal(key, (C, N, 30))
slot_of = jax.random.randint(key, (P, C), 0, N + 8)  # some invalid
slot_c = jnp.minimum(slot_of, N - 1)
obs_ok = (slot_of < N).astype(jnp.float32)[..., None]
cam_iota = jax.lax.broadcasted_iota(jnp.int32, slot_c.shape, 1)


def g1(acc):
    Gp = (G + acc)[cam_iota, slot_c] * obs_ok
    return Gp[0, 0, 0] * 1e-20


def g2(acc):
    """Gather via flat index take."""
    Gf = (G + acc).reshape(C * N, 30)
    flat = cam_iota * N + slot_c
    Gp = jnp.take(Gf, flat.reshape(-1), axis=0).reshape(P, C, 30) * obs_ok
    return Gp[0, 0, 0] * 1e-20


def g3(acc):
    """Scatter from (C,N) into (P,C): at[pt, cam].set."""
    pt_of = jax.random.randint(jax.random.key(1), (C, N), 0, P + 4)  # fake
    Gp = jnp.zeros((P + 1, C, 30)).at[
        jnp.minimum(pt_of, P), jax.lax.broadcasted_iota(jnp.int32, (C, N), 0)
    ].set(G + acc)[:P]
    return Gp[0, 0, 0] * 1e-20


amort("g1 fancy-index gather", g1)
amort("g2 flat take", g2)
amort("g3 scatter set", g3)

# G einsum variants
r = jax.random.normal(key, (C, N, 3))
Jc = jax.random.normal(key, (C, N, 3, 6))
Jp = jax.random.normal(key, (C, N, 3, 3))
w = jnp.ones((C, N))


def a1(acc):
    Wc = Jc * (w + acc)[..., None, None]
    Bo = jnp.einsum("cnia,cnib->cnab", Wc, Jp)
    Wp = Jp * (w + acc)[..., None, None]
    Hpp_o = jnp.einsum("cnia,cnib->cnab", Jp, Wp)
    gp_o = jnp.einsum("cnia,cni->cna", Wp, r)
    G = jnp.concatenate([Bo.reshape(C, N, 18), Hpp_o.reshape(C, N, 9), gp_o], axis=-1)
    return G[0, 0, 0] * 1e-20


amort("a1 G einsums (current)", a1)
