"""Matching + two-view initializer tests (SURVEY §4: geometry unit tests —
H/F scoring, reconstruction on synthetic scenes)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import hamming, matching, twoview, triangulate, lie

K = jnp.array([500.0, 500.0, 320.0, 240.0])


def rand_desc(rng, n):
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(packed), hamming.unpack_pm1(jnp.asarray(packed))


def corrupt(packed, rng, nbits):
    """Flip nbits random bits per descriptor."""
    out = np.array(packed)
    for i in range(out.shape[0]):
        for b in rng.integers(0, 256, nbits):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return jnp.asarray(out), hamming.unpack_pm1(jnp.asarray(out))


class TestMatching:
    def test_nn_with_noise(self, rng):
        packed, pm1 = rand_desc(rng, 128)
        _, pm1_n = corrupt(packed, rng, 10)
        perm = rng.permutation(128)
        m = matching.match_nn(
            pm1, pm1_n[perm], jnp.ones((128, 128), bool), max_dist=40, nn_ratio=0.9
        )
        ok = np.asarray(m.ok)
        idx = np.asarray(m.idx)
        inv = np.argsort(perm)
        assert ok.mean() > 0.95
        assert (idx[ok] == inv[ok]).all()

    def test_window_mask_limits(self, rng):
        qxy = jnp.asarray([[100.0, 100.0]])
        txy = jnp.asarray([[104.0, 100.0], [100.0, 110.0]])
        m = matching.window_mask(qxy, txy, 5.0)
        np.testing.assert_array_equal(np.asarray(m), [[True, False]])

    def test_rotation_consistency(self, rng):
        # 80 matches at delta ~10deg, 20 scattered uniformly.
        d = np.deg2rad(np.concatenate([rng.normal(10, 1, 80), rng.uniform(-180, 180, 20)]))
        ok = np.ones(100, bool)
        keep = np.asarray(matching.rotation_consistency(jnp.asarray(d), jnp.asarray(ok)))
        assert keep[:80].mean() > 0.9
        assert keep[80:].mean() < 0.4

    def test_duplicate_resolution(self):
        idx = jnp.asarray([5, 5, 3], jnp.int32)
        dist = jnp.asarray([10, 4, 7], jnp.int32)
        ok = jnp.asarray([True, True, True])
        m = matching.resolve_duplicates(idx, dist, ok, 8)
        np.testing.assert_array_equal(np.asarray(m.ok), [False, True, True])


class TestTriangulate:
    def test_exact_recovery(self, rng):
        pts = np.stack(
            [rng.uniform(-2, 2, 50), rng.uniform(-2, 2, 50), rng.uniform(4, 8, 50)], -1
        ).astype(np.float32)
        T1 = jnp.eye(4)
        T2 = lie.se3_exp(jnp.asarray([0.5, 0.02, 0.0, 0.0, 0.05, 0.0], jnp.float32))
        P1 = triangulate.projection_matrix(T1, K)
        P2 = triangulate.projection_matrix(T2, K)
        from orb_slam2v2_1_tpu.ops.projection import project

        x1 = project(T1, jnp.asarray(pts), K)
        x2 = project(T2, jnp.asarray(pts), K)
        X = triangulate.triangulate(P1, P2, x1, x2)
        np.testing.assert_allclose(np.asarray(X), pts, atol=2e-2)


class TestTwoView:
    def _project(self, T, pts):
        from orb_slam2v2_1_tpu.ops.projection import project

        return project(T, pts, K)

    def test_general_scene_uses_f(self, rng):
        pts = np.stack(
            [rng.uniform(-3, 3, 300), rng.uniform(-2, 2, 300), rng.uniform(4, 12, 300)],
            -1,
        ).astype(np.float32)
        T2 = lie.se3_exp(jnp.asarray([0.8, 0.0, 0.0, 0.0, 0.06, 0.0], jnp.float32))
        x1 = self._project(jnp.eye(4), jnp.asarray(pts))
        x2 = self._project(T2, jnp.asarray(pts))
        x1 = x1 + jnp.asarray(rng.normal(0, 0.5, x1.shape).astype(np.float32))
        x2 = x2 + jnp.asarray(rng.normal(0, 0.5, x2.shape).astype(np.float32))
        res = twoview.initialize_two_view(
            x1, x2, jnp.ones(300, bool), K, jax.random.key(0)
        )
        assert bool(res.success)
        assert not bool(res.used_h)
        # Recovered motion ~ ground truth up to scale.
        R_gt = np.asarray(T2)[:3, :3]
        t_gt = np.asarray(T2)[:3, 3]
        t_gt = t_gt / np.linalg.norm(t_gt)
        # Linear estimate from noisy pixels; joint BA refines further in the
        # real pipeline (CreateInitialMapMonocular runs global BA).
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=1e-2)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=3e-2)
        # Triangulated structure correct up to the same scale.
        good = np.asarray(res.good)
        assert good.sum() > 250
        scale = np.median(np.asarray(res.points)[good][:, 2] / pts[good][:, 2])
        np.testing.assert_allclose(
            np.asarray(res.points)[good] / scale, pts[good], atol=1.0
        )

    def test_planar_scene_uses_h(self, rng):
        # All points on z = 6 plane.
        pts = np.stack(
            [rng.uniform(-3, 3, 300), rng.uniform(-2, 2, 300), np.full(300, 6.0)], -1
        ).astype(np.float32)
        T2 = lie.se3_exp(jnp.asarray([0.6, 0.1, 0.0, 0.0, 0.04, 0.0], jnp.float32))
        x1 = self._project(jnp.eye(4), jnp.asarray(pts))
        x2 = self._project(T2, jnp.asarray(pts))
        x1 = x1 + jnp.asarray(rng.normal(0, 0.4, x1.shape).astype(np.float32))
        x2 = x2 + jnp.asarray(rng.normal(0, 0.4, x2.shape).astype(np.float32))
        res = twoview.initialize_two_view(
            x1, x2, jnp.ones(300, bool), K, jax.random.key(1)
        )
        assert bool(res.used_h)
        assert bool(res.success)
        R_gt = np.asarray(T2)[:3, :3]
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=2e-2)

    def test_no_parallax_fails(self, rng):
        # Pure rotation: must refuse to initialize.
        pts = np.stack(
            [rng.uniform(-3, 3, 300), rng.uniform(-2, 2, 300), rng.uniform(4, 12, 300)],
            -1,
        ).astype(np.float32)
        T2 = lie.se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.05, 0.0], jnp.float32))
        x1 = self._project(jnp.eye(4), jnp.asarray(pts))
        x2 = self._project(T2, jnp.asarray(pts))
        res = twoview.initialize_two_view(
            x1, x2, jnp.ones(300, bool), K, jax.random.key(2)
        )
        assert not bool(res.success)
