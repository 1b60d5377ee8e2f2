"""Dense-mapping parity (VERDICT r3 item 10): gravity-plane RANSAC fit +
octree export (reference src/pointcloudmapping.cc:117-281)."""

import numpy as np

from orb_slam2v2_1_tpu.utils import pointcloud as pc


def _tilted_floor_cloud(rng, n_floor=2000, n_noise=300, tilt=0.3):
    """A floor plane (dominant) tilted by `tilt` rad around x, plus clutter."""
    pts = np.zeros((n_floor, 3), np.float32)
    pts[:, 0] = rng.uniform(-3, 3, n_floor)
    pts[:, 2] = rng.uniform(0, 6, n_floor)
    pts[:, 1] = 1.5 + rng.normal(0, 0.01, n_floor)  # floor at y=+1.5 (y down)
    c, s = np.cos(tilt), np.sin(tilt)
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    pts = pts @ R.T
    noise = np.stack(
        [rng.uniform(-3, 3, n_noise), rng.uniform(-1, 1, n_noise),
         rng.uniform(0, 6, n_noise)], -1
    ).astype(np.float32) @ R.T
    return np.concatenate([pts, noise]), R


class TestGravityAlign:
    def test_plane_fit_finds_floor(self, rng):
        cloud, R = _tilted_floor_cloud(rng)
        n, d, inl = pc.fit_gravity_plane(cloud, rng)
        # The fitted normal must match the rotated floor normal (-y, tilted).
        gt_n = R @ np.array([0.0, -1.0, 0.0])
        assert abs(float(n @ gt_n)) > 0.999, (n, gt_n)
        assert inl.sum() > 1500

    def test_alignment_levels_the_floor(self, rng):
        cloud, _ = _tilted_floor_cloud(rng)
        aligned, R = pc.gravity_align(cloud, rng)
        # After alignment the floor's y spread collapses to sensor noise.
        floor = aligned[:2000]
        assert np.std(floor[:, 1]) < 0.02
        # Rotation is orthonormal.
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestOctree:
    def test_roundtrip(self, rng, tmp_path):
        pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
        path = tmp_path / "map.octree.npz"
        pc.save_octree(pts, path, res=0.1)
        centers = pc.load_octree(path)
        assert centers.shape[0] > 0
        # Every input point has an occupied leaf within half a diagonal.
        from scipy.spatial import cKDTree

        d, _ = cKDTree(centers).query(pts)
        assert d.max() < 0.1 * np.sqrt(3) / 2 + 1e-5

    def test_empty(self, tmp_path):
        path = tmp_path / "empty.octree.npz"
        pc.save_octree(np.zeros((0, 3), np.float32), path)
        assert pc.load_octree(path).shape == (0, 3)

    def test_mapper_exports(self, rng, tmp_path):
        import jax.numpy as jnp

        K = jnp.asarray([100.0, 100.0, 32.0, 24.0])
        mapper = pc.DenseMapper(K, voxel=0.1, stride=2)
        depth = np.full((48, 64), 2.0, np.float32)
        mapper.insert_keyframe(depth, np.eye(4, dtype=np.float32))
        cloud = mapper.save(
            ply_path=tmp_path / "m.ply",
            occupancy_path=tmp_path / "m.occ.npz",
        )
        assert cloud.shape[0] > 0
        assert (tmp_path / "m.ply").exists()
        pc.save_octree(cloud, tmp_path / "m.octree.npz")
        assert pc.load_octree(tmp_path / "m.octree.npz").shape[0] > 0
