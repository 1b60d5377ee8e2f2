"""ORB pipeline unit tests (SURVEY §4: kernel unit tests — FAST invariants,
orientation vs golden values, Hamming semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import fast as fast_ops
from orb_slam2v2_1_tpu.ops import hamming, image as image_ops, orb


def checkerboard(h=480, w=640, sq=40):
    ys, xs = np.mgrid[0:h, 0:w]
    return (((ys // sq) + (xs // sq)) % 2 * 200.0 + 20.0).astype(np.float32)


def noisy_scene(rng, h=480, w=640):
    """Blobs + corners + noise — enough texture for ~1000 keypoints."""
    img = rng.uniform(0, 50, (h, w)).astype(np.float32)
    for _ in range(300):
        y, x = rng.integers(20, h - 20), rng.integers(20, w - 20)
        s = rng.integers(3, 12)
        img[y : y + s, x : x + s] += rng.uniform(60, 180)
    return np.clip(img, 0, 255)


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((480, 640))
        pyr = image_ops.build_pyramid(img, 8, 1.2)
        assert len(pyr) == 8
        assert pyr[0].shape == (480, 640)
        assert pyr[1].shape == (400, 533)
        assert pyr[7].shape[0] < 140

    def test_blur_preserves_constant(self):
        img = jnp.full((64, 64), 7.0)
        out = image_ops.gaussian_blur(img)
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-4)


class TestFast:
    def test_flat_image_no_corners(self):
        score = fast_ops.fast_score(jnp.full((64, 64), 100.0))
        assert float(jnp.max(score)) == 0.0

    def test_isolated_bright_dot(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[32, 32] = 250.0
        score = np.asarray(fast_ops.fast_score(jnp.asarray(img)))
        assert score[32, 32] >= 190.0  # margin ~200

    def test_corner_of_square(self):
        img = np.full((64, 64), 30.0, np.float32)
        img[32:, 32:] = 220.0
        score = np.asarray(fast_ops.fast_score(jnp.asarray(img)))
        # The square's corner region should fire; deep inside the square or
        # along straight edges (far from the corner) should not.
        assert score[30:35, 30:35].max() > 50.0
        assert score[50, 50] == 0.0  # interior
        assert score[50, 33] == 0.0  # straight vertical edge (not a corner)

    def test_select_spread_and_count(self, rng):
        img = jnp.asarray(noisy_scene(rng))
        score = fast_ops.fast_score(img)
        yx, resp, valid = fast_ops.select_keypoints(score, 200, cell=16)
        yx, valid = np.asarray(yx), np.asarray(valid)
        assert valid.sum() > 150
        # Spread: no two valid keypoints share a 16px cell.
        cells = {(y // 16, x // 16) for (y, x) in yx[valid]}
        assert len(cells) == valid.sum()
        # Border respected.
        assert yx[valid].min() >= 19
        assert (yx[valid][:, 0] < 480 - 19).all()

    def test_strong_outranks_weak(self):
        img = np.full((128, 128), 100.0, np.float32)
        img[40, 40] = 130.0  # weak corner (margin ~30 > 20)
        img[80, 80] = 250.0  # strong corner
        score = fast_ops.fast_score(jnp.asarray(img))
        yx, resp, valid = fast_ops.select_keypoints(score, 1, cell=16)
        assert np.asarray(valid)[0]
        np.testing.assert_array_equal(np.asarray(yx)[0], [80, 80])

    def test_level_counts_sum(self):
        counts = fast_ops.level_feature_counts(1000, 8, 1.2)
        assert sum(counts) == 1000
        assert counts[0] > counts[-1]


class TestOrientation:
    def test_gradient_patch_angle(self):
        # Patch brighter toward +x => centroid along +x => angle ~ 0.
        ys, xs = np.mgrid[-15:16, -15:16]
        patch = (xs.astype(np.float32) + 16.0)[None]
        ang = float(orb.ic_angle(jnp.asarray(patch))[0])
        assert abs(ang) < 0.02
        # Brighter toward +y => angle ~ pi/2.
        patch = (ys.astype(np.float32) + 16.0)[None]
        ang = float(orb.ic_angle(jnp.asarray(patch))[0])
        assert abs(ang - np.pi / 2) < 0.02

    def test_rotation_equivariance(self, rng):
        """Rotating the image rotates the reported angle (mod discretization)."""
        from scipy.ndimage import rotate as ndrotate

        patch = rng.uniform(0, 255, (31, 31)).astype(np.float32)
        patch = np.asarray(image_ops.gaussian_blur(jnp.asarray(patch), 7, 2.0))
        a0 = float(orb.ic_angle(jnp.asarray(patch)[None])[0])
        # scipy's +deg is CCW in display (y-up) = CW in y-down pixel coords,
        # so rotate by -90 to add +pi/2 in our atan2(y-down) convention.
        rot = ndrotate(patch, -90, reshape=False, order=1)
        a90 = float(orb.ic_angle(jnp.asarray(rot)[None])[0])
        d = (a90 - a0 - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 0.2


class TestDescriptors:
    def test_deterministic_and_nontrivial(self, rng):
        img = jnp.asarray(noisy_scene(rng))
        feats = orb.extract_orb(img)
        assert feats.desc.shape == (1000, 8)
        d1 = np.asarray(feats.desc)
        feats2 = orb.extract_orb(img)
        np.testing.assert_array_equal(d1, np.asarray(feats2.desc))
        # Bits should be roughly balanced, not constant.
        bits = np.unpackbits(d1[np.asarray(feats.valid)].view(np.uint8), axis=1)
        assert 0.2 < bits.mean() < 0.8

    def test_descriptor_rotation_invariance(self, rng):
        """Same physical corner viewed rotated should have a small Hamming
        distance; random pairs should be ~128."""
        from scipy.ndimage import rotate as ndrotate

        base = noisy_scene(rng, 128, 128)
        # scipy -30 deg == +30 deg in y-down pixel coords (see equivariance test).
        rot = ndrotate(base, -30, reshape=False, order=1, mode="nearest")
        f0 = orb.extract_orb(jnp.asarray(base), orb.OrbConfig(n_features=100, n_levels=1))
        f1 = orb.extract_orb(jnp.asarray(rot), orb.OrbConfig(n_features=100, n_levels=1))
        D = np.asarray(hamming.distance_matrix(f0.desc_pm1, f1.desc_pm1))
        v0, v1 = np.asarray(f0.valid), np.asarray(f1.valid)
        D = D[np.ix_(v0, v1)]
        # Map f1 keypoints back into the base frame: p = R(-theta) q.
        ct, st = np.cos(np.deg2rad(30)), np.sin(np.deg2rad(30))
        xy1 = np.asarray(f1.xy)[v1] - 63.5
        xy1r = np.stack(
            [ct * xy1[:, 0] + st * xy1[:, 1], -st * xy1[:, 0] + ct * xy1[:, 1]],
            -1,
        ) + 63.5
        xy0 = np.asarray(f0.xy)[v0]
        dist2 = ((xy0[:, None] - xy1r[None]) ** 2).sum(-1)
        pair_j = dist2.argmin(1)
        close = dist2[np.arange(len(xy0)), pair_j] < 4.0
        assert close.sum() >= 5
        matched_d = D[np.arange(len(xy0))[close], pair_j[close]]
        assert np.median(matched_d) < 60, np.median(matched_d)
        # Matched pairs must be far more similar than the background pairs.
        assert np.median(D) > 2.5 * np.median(matched_d)


class TestHamming:
    def test_packed_matches_matrix(self, rng):
        packed = jnp.asarray(
            rng.integers(0, 2**32, (32, 8), dtype=np.uint64).astype(np.uint32)
        )
        pm1 = hamming.unpack_pm1(packed)
        D_mat = np.asarray(hamming.distance_matrix(pm1, pm1))
        D_ref = np.asarray(
            hamming.distance_packed(packed[:, None, :], packed[None, :, :])
        )
        np.testing.assert_array_equal(D_mat, D_ref)
        assert (np.diag(D_mat) == 0).all()

    def test_known_distance(self):
        a = jnp.zeros((1, 8), jnp.uint32)
        b = jnp.full((1, 8), 0xFFFFFFFF, jnp.uint32)
        assert int(hamming.distance_packed(a, b)[0]) == 256
        c = jnp.asarray(np.array([[1, 0, 0, 0, 0, 0, 0, 3]], np.uint32))
        assert int(hamming.distance_packed(a, c)[0]) == 3
