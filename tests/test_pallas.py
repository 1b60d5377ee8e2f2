"""Pallas kernels (interpret mode) vs their pure-XLA twins.

The kernels must be drop-in: same values away from the discarded extraction
border (fast_score_nms) and bit-identical reductions (masked_best_two)."""

import os

os.environ["ORB_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import fast as fast_ops
from orb_slam2v2_1_tpu.ops import hamming, matching, pallas_kernels


def test_fast_score_nms_matches_xla(rng):
    img = jnp.asarray(rng.uniform(0, 255, (97, 200)), jnp.float32)
    ref = fast_ops.nms3(fast_ops.fast_score(img))
    got = pallas_kernels.fast_score_nms(img)
    b = 19  # extraction border discarded by select_keypoints
    np.testing.assert_allclose(
        np.asarray(got)[b:-b, b:-b], np.asarray(ref)[b:-b, b:-b], atol=1e-4
    )


def test_fast_score_nms_aligned_shape(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 128)), jnp.float32)
    ref = fast_ops.nms3(fast_ops.fast_score(img))
    got = pallas_kernels.fast_score_nms(img)
    b = 19
    np.testing.assert_allclose(
        np.asarray(got)[b:-b, b:-b], np.asarray(ref)[b:-b, b:-b], atol=1e-4
    )


def _random_features(rng, n, w=640, h=480):
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    pm1 = hamming.unpack_pm1(jnp.asarray(packed))
    xy = jnp.asarray(np.stack([rng.uniform(0, w, n), rng.uniform(0, h, n)], -1), jnp.float32)
    lvl = jnp.asarray(rng.integers(0, 8, n), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    return pm1, xy, lvl, valid


def test_masked_best_two_matches_xla(rng):
    q_pm1, q_xy, q_lvl, q_val = _random_features(rng, 100)
    t_pm1, t_xy, t_lvl, t_val = _random_features(rng, 300)
    radius = jnp.asarray(rng.uniform(20, 120, 100), jnp.float32)

    mask = (
        matching.window_mask(q_xy, t_xy, radius)
        & matching.level_mask(q_lvl, t_lvl, -1, 1)
        & q_val[:, None]
        & t_val[None, :]
    )
    D = hamming.distance_matrix(q_pm1, t_pm1)
    ref_idx, ref_best, ref_second = matching.best_two(D, mask)

    got_idx, got_best, got_second = pallas_kernels.masked_best_two(
        q_pm1, q_xy, q_lvl, q_val, radius, t_pm1, t_xy, t_lvl, t_val, -1, 1
    )
    has = np.asarray(ref_best) < (1 << 20)
    np.testing.assert_array_equal(np.asarray(got_best), np.asarray(ref_best).clip(max=1 << 20))
    np.testing.assert_array_equal(np.asarray(got_idx)[has], np.asarray(ref_idx)[has])
    np.testing.assert_array_equal(
        np.asarray(got_second).clip(max=1 << 20),
        np.asarray(ref_second).clip(max=1 << 20),
    )


def test_masked_best_two_no_window(rng):
    """radius=inf + wide level window == plain masked NN (SearchByBoW-style)."""
    q_pm1, q_xy, q_lvl, q_val = _random_features(rng, 64)
    t_pm1, t_xy, t_lvl, t_val = _random_features(rng, 256)

    mask = q_val[:, None] & t_val[None, :]
    D = hamming.distance_matrix(q_pm1, t_pm1)
    ref_idx, ref_best, ref_second = matching.best_two(D, mask)

    got_idx, got_best, got_second = pallas_kernels.masked_best_two(
        q_pm1, q_xy, q_lvl, q_val, 1e9, t_pm1, t_xy, t_lvl, t_val, -99, 99
    )
    has = np.asarray(ref_best) < (1 << 20)
    np.testing.assert_array_equal(np.asarray(got_idx)[has], np.asarray(ref_idx)[has])
    np.testing.assert_array_equal(
        np.asarray(got_best).clip(max=1 << 20), np.asarray(ref_best).clip(max=1 << 20)
    )
