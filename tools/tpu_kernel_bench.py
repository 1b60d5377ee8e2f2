import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend())
from orb_slam2v2_1_tpu.ops import fast as fast_ops
from orb_slam2v2_1_tpu.ops import hamming, matching, pallas_kernels, orb

rng = np.random.default_rng(0)

def timeit(f, *a, n=50):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

# --- FAST score+NMS
img = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
xla = jax.jit(lambda x: fast_ops.nms3(fast_ops.fast_score(x)))
ref = xla(img); got = pallas_kernels.fast_score_nms(img)
b = 19
err = np.abs(np.asarray(got)[b:-b,b:-b] - np.asarray(ref)[b:-b,b:-b]).max()
print(f"fast: xla {timeit(xla, img):.3f} ms  pallas {timeit(pallas_kernels.fast_score_nms, img):.3f} ms  maxerr {err}")

# --- masked match
Q, N = 1024, 1024
def feats(n):
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    pm1 = hamming.unpack_pm1(jnp.asarray(packed))
    xy = jnp.asarray(np.stack([rng.uniform(0,640,n), rng.uniform(0,480,n)],-1), jnp.float32)
    lvl = jnp.asarray(rng.integers(0,8,n), jnp.int32)
    val = jnp.asarray(rng.uniform(size=n) > 0.1)
    return pm1, xy, lvl, val
qp, qxy, qlvl, qval = feats(Q)
tp, txy, tlvl, tval = feats(N)
rad = jnp.asarray(rng.uniform(20,120,Q), jnp.float32)

@jax.jit
def xla_match(qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval):
    mask = (matching.window_mask(qxy,txy,rad) & matching.level_mask(qlvl,tlvl,-1,1)
            & qval[:,None] & tval[None,:])
    D = hamming.distance_matrix(qp,tp)
    return matching.best_two(D, mask)

@jax.jit
def pls_match(qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval):
    return pallas_kernels.masked_best_two(qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval,-1,1)

ri, rb, rs = xla_match(qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval)
gi, gb, gs = pls_match(qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval)
has = np.asarray(rb) < (1<<20)
assert (np.asarray(gi)[has] == np.asarray(ri)[has]).all(), "idx mismatch"
assert (np.asarray(gb).clip(max=1<<20) == np.asarray(rb).clip(max=1<<20)).all()
print(f"match: xla {timeit(xla_match,qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval):.3f} ms  pallas {timeit(pls_match,qp,qxy,qlvl,qval,rad,tp,txy,tlvl,tval):.3f} ms  OK")

# --- end-to-end extraction with/without pallas
cfg = orb.OrbConfig()
e = jax.jit(lambda x: orb.extract_orb(x, cfg))
print(f"extract_orb (pallas path): {timeit(e, img, n=20):.3f} ms")
