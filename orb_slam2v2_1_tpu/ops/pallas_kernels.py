"""Pallas TPU kernels for the per-frame hot ops.

Two kernels carry most of the per-frame FLOPs/bandwidth of the tracking hot
path (SURVEY §3.2):

* `fast_score_nms` — fused FAST-9/16 corner scoring + 3x3 non-max
  suppression. The pure-XLA path (ops/fast.py) materializes sixteen shifted
  (H, W) difference images plus min/max reduction trees in HBM; this kernel
  streams the image through VMEM in row tiles (halo DMA from HBM) and emits
  only the suppressed score map — one HBM read + one HBM write total.
  Replaces the reference's per-cell `cv::FAST` + `DistributeOctTree` scoring
  stage (src/ORBextractor.cc:765-853).

* `masked_match` — fused Hamming-distance + spatial/scale-window masking +
  best/second-best reduction, the `ORBmatcher::SearchByProjection` inner loop
  (src/ORBmatcher.cc:45-137,1330-1472). The pure-XLA path materializes the
  (Q, N) distance matrix and the (Q, N) window mask in HBM; this kernel
  computes distance blocks on the MXU (+-1 bf16 matmul identity:
  hamming = (256 - a.b)/2), builds the mask in-register from keypoint
  coordinates, and keeps only the running (best, second, argmin) per query —
  flash-attention-style, nothing (Q, N)-shaped ever leaves VMEM.

Both kernels have exact pure-XLA twins; `enabled()` picks the Pallas path on
real TPU backends, and tests force `interpret=True` on CPU to pin
bit-equality against the XLA implementations.
"""

from __future__ import annotations

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bresenham circle of radius 3 (circular order), same table as ops/fast.py.
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

_BIG_DIST = 1 << 20  # plain int: jnp constants may not be captured by kernels


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.cache
def enabled() -> bool:
    """Use the Pallas kernels? On by default on TPU backends; override with
    ORB_TPU_PALLAS=0/1."""
    env = os.environ.get("ORB_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.cache
def match_enabled() -> bool:
    """Use the Pallas match kernel? OFF by default — RETIRED from the hot
    path (ORB_TPU_PALLAS_MATCH=1 opts back in for kernel-level work).

    Standalone the kernel beats the XLA path 5x (0.016 ms vs 0.079 ms for a
    1024x1024 masked search), but embedded in the fused per-frame scan it
    acts as a scheduling barrier: the surrounding ORB/frame ops lose their
    overlap across the Mosaic call boundary. Measured twice:
      r3: one call inflates a tracking iteration 11.5 -> 27.9 ms;
      r4 (current program, 40-frame desk scan on the real chip):
          52.5 fps with the XLA twin vs 28.5 fps with the kernel.
    The question is closed: the XLA twin (one bf16 MXU matmul + masked
    reductions) is the faster whole-program choice, and `fast_score_nms`
    remains the Pallas kernel that earns its place on the hot path.
    """
    env = os.environ.get("ORB_TPU_PALLAS_MATCH")
    if env is not None:
        return env not in ("0", "false", "") and enabled()
    return False


def _interpret() -> bool:
    return os.environ.get("ORB_TPU_PALLAS_INTERPRET", "0") not in ("0", "false", "")


# ---------------------------------------------------------------------------
# Fused FAST score + NMS
# ---------------------------------------------------------------------------

def _roll_cols(x: jax.Array, shift: int) -> jax.Array:
    """Circular column roll with any-sign shift (pltpu.roll wants >= 0)."""
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _min9_circular(d: list) -> list:
    """w9[k] = min(d[k], ..., d[(k+8) % 16]) via log-step folding."""
    m2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
    m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
    m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
    return [jnp.minimum(m8[k], d[(k + 8) % 16]) for k in range(16)]


def _fast_kernel(img_hbm, out_ref, buf, sem, *, tile: int, wp: int):
    i = pl.program_id(0)
    # Rows [i*tile, i*tile + tile + 8) of the pre-padded image: 4 halo rows on
    # each side cover the radius-3 circle plus the 1-row NMS neighborhood.
    cp = pltpu.make_async_copy(img_hbm.at[pl.ds(i * tile, tile + 8), :], buf, sem)
    cp.start()
    cp.wait()

    t2 = tile + 2  # score rows incl. the +-1 NMS halo
    center = buf[3:3 + t2, :]
    # Column shifts wrap via roll; the wrapped 3 columns at each side are
    # inside the 19px border that select_keypoints discards.
    d = [
        _roll_cols(buf[3 + dy:3 + dy + t2, :], -dx) - center
        for (dy, dx) in _CIRCLE
    ]
    m9 = _min9_circular(d)
    bright = functools.reduce(jnp.maximum, m9)
    m9d = _min9_circular([-x for x in d])
    dark = functools.reduce(jnp.maximum, m9d)
    s = jnp.maximum(jnp.maximum(bright, dark), 0.0)  # (t2, wp)

    # 3x3 NMS: horizontal 3-max via roll, vertical via the score halo rows.
    h3 = jnp.maximum(s, jnp.maximum(_roll_cols(s, 1), _roll_cols(s, -1)))
    m = jnp.maximum(h3[0:tile, :], jnp.maximum(h3[1:tile + 1, :], h3[2:tile + 2, :]))
    sc = s[1:1 + tile, :]
    out_ref[:] = jnp.where(sc >= m, sc, 0.0)


@partial(jax.jit, static_argnames=())
def fast_score_nms(img: jax.Array) -> jax.Array:
    """Fused FAST-9/16 score + 3x3 NMS: (H, W) f32 -> (H, W) f32.

    Equivalent to `fast.nms3(fast.fast_score(img))` away from the image
    border (agreement inside the 19px extraction border is exact; callers
    discard the border).
    """
    h, w = img.shape
    tile = 32 if w <= 1024 else 16
    hp = _round_up(h, tile)
    wp = _round_up(w, 128)
    # 4 halo rows above and below; zero padding (border region is discarded).
    padded = jnp.zeros((hp + 8, wp), img.dtype).at[4:4 + h, :w].set(img)

    out = pl.pallas_call(
        partial(_fast_kernel, tile=tile, wp=wp),
        grid=(hp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(padded)
    return out[:h, :w]


# ---------------------------------------------------------------------------
# Fused masked Hamming match (best / second-best / argmin)
# ---------------------------------------------------------------------------

def _match_kernel(
    q_pm1, qx, qy, qlvl, qrad, qval,
    t_pm1_t, tx, ty, tlvl, tval,
    best_ref, idx_ref, second_ref,
    *, bn: int, level_lo: int, level_hi: int,
):
    i = pl.program_id(1)  # target-block index (inner, sequential per q-block)

    # t comes in pre-transposed (256, bn): Mosaic wants the standard
    # contraction form. This Mosaic build rejects bf16 operands with fp32
    # contract precision ("Bad lhs type"), so upcast; the MXU runs f32 at
    # half bf16 rate, still >>1 TFLOP/s for this 256-deep contraction.
    dots = jnp.dot(
        q_pm1[:].astype(jnp.float32),
        t_pm1_t[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dist = ((256.0 - dots) * 0.5).astype(jnp.int32)  # exact ints in [0, 256]

    mask = (
        (jnp.abs(qx[:] - tx[:]) <= qrad[:])
        & (jnp.abs(qy[:] - ty[:]) <= qrad[:])
        & (tlvl[:] - qlvl[:] >= float(level_lo))
        & (tlvl[:] - qlvl[:] <= float(level_hi))
        & (qval[:] > 0.5)
        & (tval[:] > 0.5)
    )
    dm = jnp.where(mask, dist, jnp.int32(_BIG_DIST))  # (Q, bn)

    bb = jnp.min(dm, axis=1, keepdims=True)  # (Q, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, dm.shape, 1)
    bi = jnp.min(
        jnp.where(dm == bb, col + i * bn, jnp.int32(1 << 30)), axis=1, keepdims=True
    )
    # Second-best inside the block: mask out the single best column.
    dm2 = jnp.where(col + i * bn == bi, jnp.int32(_BIG_DIST), dm)
    bs = jnp.min(dm2, axis=1, keepdims=True)

    @pl.when(i == 0)
    def _():
        best_ref[:] = bb
        idx_ref[:] = bi
        second_ref[:] = bs

    @pl.when(i > 0)
    def _():
        rb, ri, rs = best_ref[:], idx_ref[:], second_ref[:]
        # Earlier block wins ties: only a strictly smaller distance replaces.
        take = bb < rb
        best_ref[:] = jnp.where(take, bb, rb)
        idx_ref[:] = jnp.where(take, bi, ri)
        second_ref[:] = jnp.minimum(jnp.minimum(rs, bs), jnp.maximum(rb, bb))


def masked_best_two(
    q_pm1: jax.Array,  # (Q, 256) bf16 +-1
    q_xy: jax.Array,  # (Q, 2) f32 predicted positions
    q_level: jax.Array,  # (Q,) predicted octave
    q_valid: jax.Array,  # (Q,) bool
    radius,  # (Q,) or scalar, pixels
    t_pm1: jax.Array,  # (N, 256) bf16 +-1
    t_xy: jax.Array,  # (N, 2)
    t_level: jax.Array,  # (N,)
    t_valid: jax.Array,  # (N,) bool
    level_lo: int = -1,
    level_hi: int = 1,
):
    """Fused SearchByProjection reduction: returns (best_idx, best, second),
    each (Q,) int32, identical to ops/matching.py's
    `best_two(distance_matrix(q, t), window_mask & level_mask & valid)`."""
    q, n = q_pm1.shape[0], t_pm1.shape[0]
    bn = 256
    bq = 512  # query tile: keeps the kernel's VMEM footprint ~3 MB
    qp = _round_up(max(q, 16), 16 if q <= bq else bq)
    bq = min(bq, qp)
    np_ = _round_up(max(n, bn), bn)

    def padq(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        x = jnp.broadcast_to(x, (q,)) if x.shape[0] == 1 else x
        return jnp.pad(x, (0, qp - q), constant_values=fill)[:, None]

    def padt(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        return jnp.pad(x, (0, np_ - n), constant_values=fill)[None, :]

    q_pm1p = jnp.pad(q_pm1, ((0, qp - q), (0, 0)))
    t_pm1p = jnp.pad(t_pm1, ((0, np_ - n), (0, 0))).T  # (256, Np)

    grid = (qp // bq, np_ // bn)
    qspec = pl.BlockSpec((bq, 1), lambda qi, i: (qi, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, bn), lambda qi, i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bq, 1), lambda qi, i: (qi, 0), memory_space=pltpu.VMEM)

    best, idx, second = pl.pallas_call(
        partial(_match_kernel, bn=bn, level_lo=level_lo, level_hi=level_hi),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, 256), lambda qi, i: (qi, 0), memory_space=pltpu.VMEM),
            qspec, qspec, qspec, qspec, qspec,
            pl.BlockSpec((256, bn), lambda qi, i: (0, i), memory_space=pltpu.VMEM),
            tspec, tspec, tspec, tspec,
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((qp, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(
        q_pm1p,
        padq(q_xy[:, 0]), padq(q_xy[:, 1]), padq(q_level), padq(radius),
        padq(q_valid),
        t_pm1p,
        padt(t_xy[:, 0]), padt(t_xy[:, 1]), padt(t_level), padt(t_valid),
    )
    best_idx = jnp.where(best[:q, 0] >= _BIG_DIST, 0, idx[:q, 0])
    return best_idx, best[:q, 0], second[:q, 0]
