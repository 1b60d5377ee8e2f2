"""Oriented-FAST + rotated-BRIEF extraction, fully batched.

TPU-native replacement for `ORBextractor` (reference src/ORBextractor.cc):
  * intensity-centroid orientation `IC_Angle` (src/ORBextractor.cc:77-104)
  * steered 256-bit BRIEF `computeOrbDescriptor` (src/ORBextractor.cc:108-147)
  * the full per-frame pipeline `operator()` (src/ORBextractor.cc:1043-1105)

The reference hard-codes a learned 256-pair sampling pattern
(`bit_pattern_31_`, src/ORBextractor.cc:150-408). We deliberately do NOT copy
it: descriptors here only ever match against descriptors produced by this
framework (the vocabulary is also ours), so a deterministic seeded BRIEF-style
Gaussian pattern (sigma = patch/5, clipped to a radius-13 disc so any rotation
stays inside the 31x31 patch) is equivalent in function. Pattern quality can
be upgraded later by offline greedy decorrelation without changing this code.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import fast as fast_ops
from . import image as image_ops

HALF_PATCH = 15  # orientation disc radius (src/ORBextractor.cc:57 HALF_PATCH_SIZE)
PATCH = 2 * HALF_PATCH + 1  # 31
PATTERN_RADIUS = 13  # keeps rotated BRIEF taps inside the patch


def _make_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) int32 of (ay, ax, by, bx) BRIEF tap pairs in patch coords."""
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < 512:
        p = rng.normal(0.0, PATCH / 5.0, size=2)
        if np.linalg.norm(p) <= PATTERN_RADIUS:
            pts.append(p)
    pts = np.round(np.asarray(pts)).astype(np.int32)
    return np.concatenate([pts[0::2], pts[1::2]], axis=1)  # (256, 4) = ay ax by bx


_PATTERN = jnp.asarray(_make_pattern())  # (256, 4)


def _orientation_mask() -> np.ndarray:
    """(31, 31) f32 disc mask of radius HALF_PATCH (the u_max circle in
    src/ORBextractor.cc:85-103)."""
    ys, xs = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
    return (ys**2 + xs**2 <= HALF_PATCH**2).astype(np.float32)


_DISC = jnp.asarray(_orientation_mask())
_YGRID = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.float32)

# ---------------------------------------------------------------------------
# Angle-binned BRIEF select matrices: steered BRIEF as ONE MXU matmul.
#
# The per-keypoint rotate-and-gather formulation (take_along_axis with
# (K, 256) per-row indices) is gather-bound on TPU — measured 10+ ms for
# 2000 keypoints, dominating extraction. Discretizing the steering angle to
# N_BINS (11.25 deg/bin — the classic ORB construction uses 12 deg lookup
# tables for exactly this reason) makes the tap pattern per bin FIXED, so
# all taps for all bins become one (K, 961) @ (961, N_BINS*512) matmul plus
# a one-hot bin contraction. Same rounded-tap math as the gather version at
# each bin's center angle.
# ---------------------------------------------------------------------------
N_ANGLE_BINS = 32


def _make_select_matrices(pattern: np.ndarray) -> np.ndarray:
    """(961, N_BINS*512) one-hot: column block b holds [a-taps | b-taps]
    for bin b's center angle (same rotation+round as the steered gather)."""
    S = np.zeros((N_ANGLE_BINS, PATCH * PATCH, 512), np.float32)
    ay, ax, by, bx = pattern.T.astype(np.float64)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        ca, sa = np.cos(th), np.sin(th)
        for (y, x, col) in ((ay, ax, 0), (by, bx, 256)):
            ry = np.round(sa * x + ca * y).astype(np.int64) + HALF_PATCH
            rx = np.round(ca * x - sa * y).astype(np.int64) + HALF_PATCH
            S[b, ry * PATCH + rx, col + np.arange(256)] = 1.0
    return S.transpose(1, 0, 2).reshape(PATCH * PATCH, N_ANGLE_BINS * 512)


_SELECT = jnp.asarray(_make_select_matrices(np.asarray(_PATTERN)))


class OrbFeatures(NamedTuple):
    """Fixed-capacity per-frame feature set (struct-of-arrays Frame analog)."""

    xy: jax.Array  # (N, 2) f32 — (x, y) in level-0 pixel coords
    level: jax.Array  # (N,) int32 pyramid level
    angle: jax.Array  # (N,) f32 radians
    response: jax.Array  # (N,) f32 FAST score
    desc: jax.Array  # (N, 8) uint32 — packed 256-bit descriptors
    desc_pm1: jax.Array  # (N, 256) bf16 — +-1 unpacked, for MXU Hamming
    valid: jax.Array  # (N,) bool


def _gather_patches(img: jax.Array, yx: jax.Array, half: int = HALF_PATCH) -> jax.Array:
    """Gather (2*half+1)^2 patches centered at yx (K, 2) -> (K, P, P).

    Assumes keypoints are >= border(19) from the edge (select_keypoints
    guarantees this), so no bounds handling is needed.
    """
    size = 2 * half + 1

    def one(c):
        return jax.lax.dynamic_slice(img, (c[0] - half, c[1] - half), (size, size))

    return jax.vmap(one)(yx)


# Patch-local Gaussian blur: the descriptor needs the blurred image ONLY at
# the gathered patches, so gather a (31+2*pad)^2 raw patch and blur it with
# one BATCHED separable conv — replacing 8 per-level single-channel image
# blurs (poor TPU conv utilization, measured ~6 ms/frame at KITTI size)
# with ~50 MFLOP of batched conv. Patches sit >= border(19) from the edge,
# so the result is bit-identical to blurring the whole level first.
BLUR_SIZE = 9
BLUR_PAD = BLUR_SIZE // 2
GATHER_HALF = HALF_PATCH + BLUR_PAD  # 19 == select_keypoints border


def blur_patches(raw: jax.Array, sigma: float = 3.0) -> jax.Array:
    """(K, 39, 39) raw patches -> (K, 31, 31) Gaussian-blurred (VALID)."""
    from .image import _gauss_kernel

    k = _gauss_kernel(BLUR_SIZE, sigma)
    x = raw[:, None, :, :]
    x = jax.lax.conv_general_dilated(
        x, k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.DEFAULT,
    )
    x = jax.lax.conv_general_dilated(
        x, k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return x[:, 0]


def ic_angle(patches: jax.Array) -> jax.Array:
    """Intensity-centroid angle per patch (K, 31, 31) -> (K,) radians."""
    w = patches * _DISC
    m10 = jnp.sum(w * _YGRID[None, None, :], axis=(1, 2))  # x moments
    m01 = jnp.sum(w * _YGRID[None, :, None], axis=(1, 2))  # y moments
    return jnp.arctan2(m01, m10)


def brief_descriptors(patches: jax.Array, angles: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Steered BRIEF over blurred patches, angle-binned matmul formulation.

    patches: (K, 31, 31) from the *blurred* level image; angles: (K,).
    Returns (packed (K, 8) uint32, pm1 (K, 256) bf16).

    All N_ANGLE_BINS tap sets are computed as one (K, 961) @ (961, B*512)
    matmul (the one-hot select matrices are exact, so taps equal the
    gathered patch values bit-for-bit); the keypoint's bin is then selected
    by a one-hot contraction. See _make_select_matrices for why this beats
    the per-keypoint gather on TPU.
    """
    K = patches.shape[0]
    flat = patches.reshape(K, -1)  # (K, 961)
    taps = jnp.matmul(flat, _SELECT, precision=jax.lax.Precision.HIGHEST)
    taps = taps.reshape(K, N_ANGLE_BINS, 512)
    frac = angles / (2.0 * jnp.pi) * N_ANGLE_BINS
    bin_idx = jnp.round(frac).astype(jnp.int32) % N_ANGLE_BINS
    onehot = jax.nn.one_hot(bin_idx, N_ANGLE_BINS, dtype=taps.dtype)  # (K, B)
    sel = jnp.einsum("kbs,kb->ks", taps, onehot)  # (K, 512)
    bits = sel[:, :256] < sel[:, 256:]

    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(
        bits.reshape(-1, 8, 32).astype(jnp.uint32) << shifts[None, None, :], axis=-1,
        dtype=jnp.uint32,
    )
    pm1 = (bits.astype(jnp.bfloat16) * 2 - 1)
    return packed, pm1


class OrbConfig(NamedTuple):
    n_features: int = 1000
    n_levels: int = 8
    scale: float = 1.2
    fast_threshold: float = 20.0
    fast_min_threshold: float = 7.0
    cell: int = 16
    border: int = 19


@partial(jax.jit, static_argnames=("config",))
def extract_orb(img: jax.Array, config: OrbConfig = OrbConfig()) -> OrbFeatures:
    """Full ORB pipeline for one grayscale f32 image (H, W).

    Static output capacity = config.n_features (padded with valid=False).
    """
    pyr = image_ops.build_pyramid(img, config.n_levels, config.scale)
    counts = fast_ops.level_feature_counts(
        config.n_features, config.n_levels, config.scale
    )

    per_level = []
    for lvl, (limg, n_l) in enumerate(zip(pyr, counts)):
        if n_l == 0:
            continue
        score = fast_ops.suppressed_score(limg)
        yx, resp, valid = fast_ops.select_keypoints(
            score,
            n_l,
            cell=config.cell,
            border=config.border,
            threshold=config.fast_threshold,
            min_threshold=config.fast_min_threshold,
            suppress=False,
        )
        # Orientation and descriptors both sample the blurred level: one
        # patch gather serves both, and the blur stabilizes the intensity
        # centroid (measured: median cross-frame angle error 7.7deg -> 5.3deg
        # on the synthetic harness; the reference computes IC_Angle on the
        # raw pyramid level, src/ORBextractor.cc:1043-1105 — this is a
        # deliberate robustness improvement, not an oversight).
        # sigma=3 (vs the reference's GaussianBlur(7,7,2,2)): measured to cut
        # cross-frame descriptor distances enough to double init matches on
        # the synthetic harness; stability beats per-bit discriminability.
        # The blur is applied per gathered patch (see blur_patches): only
        # the keypoint neighborhoods are ever needed, and the batched conv
        # replaces 8 single-channel whole-level blurs.
        raw = _gather_patches(limg, yx, half=GATHER_HALF)
        bpatches = blur_patches(raw, 3.0)
        ang = ic_angle(bpatches)
        packed, pm1 = brief_descriptors(bpatches, ang)

        level_scale = config.scale**lvl
        xy0 = yx[:, ::-1].astype(jnp.float32) * level_scale  # (x, y) level-0
        per_level.append(
            OrbFeatures(
                xy=xy0,
                level=jnp.full(n_l, lvl, jnp.int32),
                angle=ang,
                response=resp,
                desc=packed,
                desc_pm1=pm1,
                valid=valid,
            )
        )

    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *per_level)
