"""Vocabulary / PnP / Sim3 solver tests (SURVEY §4: geometry unit tests —
EPnP on synthetic scenes, Horn Sim3 closed form)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.ops import hamming, lie, pnp, sim3solver, vocab

K = jnp.array([500.0, 500.0, 320.0, 240.0])


class TestPnP:
    def _scene(self, rng, n=200):
        pw = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)], -1
        ).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32)))
        from orb_slam2v2_1_tpu.ops.projection import project

        # world points = camera frame points moved out by T^-1
        pw_world = np.asarray(lie.transform_points(lie.se3_inverse(T), jnp.asarray(pw)))
        uv = np.asarray(project(T, jnp.asarray(pw_world), K))
        return jnp.asarray(pw_world), jnp.asarray(uv), T

    def test_exact_recovery(self, rng):
        pw, uv, T_gt = self._scene(rng)
        res = pnp.pnp_ransac(
            pw, uv, jnp.ones(200), jnp.ones(200, bool), K, jax.random.key(0)
        )
        assert bool(res.success)
        err = np.asarray(lie.se3_log(lie.se3_inverse(res.Tcw) @ T_gt))
        assert np.linalg.norm(err) < 1e-2
        assert int(res.n_inliers) > 190

    def test_with_outliers(self, rng):
        pw, uv, T_gt = self._scene(rng)
        uv = np.array(uv)
        bad = rng.choice(200, 80, replace=False)
        uv[bad] += rng.uniform(30, 200, (80, 2)).astype(np.float32)
        res = pnp.pnp_ransac(
            jnp.asarray(pw), jnp.asarray(uv), jnp.ones(200), jnp.ones(200, bool),
            K, jax.random.key(1),
        )
        assert bool(res.success)
        err = np.asarray(lie.se3_log(lie.se3_inverse(res.Tcw) @ T_gt))
        assert np.linalg.norm(err) < 2e-2
        inl = np.asarray(res.inliers)
        assert not inl[bad].any() or inl[bad].mean() < 0.05


class TestSim3:
    def test_recovers_known_sim3(self, rng):
        n = 80
        p2 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)], -1
        ).astype(np.float32)
        S_gt = lie.sim3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.2, -0.1, 0.0], jnp.float32))
        p1 = np.asarray((jnp.asarray(p2) @ S_gt[:3, :3].T) + S_gt[:3, 3])

        def proj(p):
            return np.stack([500 * p[:, 0] / p[:, 2] + 320, 500 * p[:, 1] / p[:, 2] + 240], -1)

        res = sim3solver.sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(proj(p1)), jnp.asarray(proj(p2)),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), K, jax.random.key(0),
            fix_scale=True,
        )
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.S12), np.asarray(S_gt), atol=1e-3)

    def test_with_scale(self, rng):
        n = 80
        p2 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)], -1
        ).astype(np.float32)
        S_gt = lie.sim3_exp(
            jnp.asarray([0.1, 0.2, -0.3, 0.05, -0.1, 0.15, 0.35], jnp.float32)
        )
        p1 = np.asarray((jnp.asarray(p2) @ S_gt[:3, :3].T) + S_gt[:3, 3])

        def proj(p):
            return np.stack([500 * p[:, 0] / p[:, 2] + 320, 500 * p[:, 1] / p[:, 2] + 240], -1)

        res = sim3solver.sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(proj(p1)), jnp.asarray(proj(p2)),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), K, jax.random.key(1),
            fix_scale=False,
        )
        assert bool(res.success)
        _, _, s = lie.sim3_parts(res.S12)
        np.testing.assert_allclose(float(s), float(jnp.exp(0.35)), rtol=1e-3)


class TestVocab:
    @pytest.fixture(scope="class")
    def tiny_vocab(self):
        rng = np.random.default_rng(0)
        desc = rng.integers(0, 2**32, (3000, 8), dtype=np.uint64).astype(np.uint32)
        data = vocab.train_vocabulary(desc, rng)
        return vocab.load_vocabulary(data), desc

    def test_quantization_consistency(self, tiny_vocab):
        v, desc = tiny_vocab
        pm1 = hamming.unpack_pm1(jnp.asarray(desc[:256]))
        w1 = np.asarray(vocab.assign_words(v, pm1))
        w2 = np.asarray(vocab.assign_words(v, pm1))
        np.testing.assert_array_equal(w1, w2)
        assert len(np.unique(w1)) > 100  # spread across the vocabulary

    def test_noise_stability(self, tiny_vocab, rng):
        """Small descriptor noise should usually keep the word."""
        v, desc = tiny_vocab
        d0 = desc[:200].copy()
        d1 = d0.copy()
        for i in range(len(d1)):
            for b in rng.integers(0, 256, 8):  # flip 8/256 bits
                d1[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        w0 = np.asarray(vocab.assign_words(v, hamming.unpack_pm1(jnp.asarray(d0))))
        w1 = np.asarray(vocab.assign_words(v, hamming.unpack_pm1(jnp.asarray(d1))))
        assert (w0 == w1).mean() > 0.5

    def test_bow_similarity(self, tiny_vocab, rng):
        """A frame must be far more similar to a noisy copy of itself than to
        a random other frame."""
        v, desc = tiny_vocab
        W = v.n_words
        a = desc[:500]
        b = desc[500:1000]
        a_noisy = a.copy()
        for i in range(len(a_noisy)):
            for bit in rng.integers(0, 256, 10):
                a_noisy[i, bit // 32] ^= np.uint32(1) << np.uint32(bit % 32)

        def bow(d):
            words = vocab.assign_words(v, hamming.unpack_pm1(jnp.asarray(d)))
            return vocab.bow_vector(words, jnp.ones(len(d), bool), v.word_weight, W)

        va, vn, vb = bow(a), bow(a_noisy), bow(b)
        s_self = float(vocab.bow_scores(va, vn[None])[0])
        s_other = float(vocab.bow_scores(va, vb[None])[0])
        assert s_self > 2 * s_other, (s_self, s_other)
