"""SE3/Sim3 manifold tests (SURVEY §4: geometry unit tests — exp/log round trips)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.ops import lie


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(lie.quat_to_rot(jnp.asarray(q, jnp.float32)))


class TestSO3:
    def test_exp_zero(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_known_axis(self):
        # 90 deg about z
        R = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(64, 3)).astype(np.float32)
        phi *= (rng.uniform(0.01, 3.0, size=(64, 1)) / np.linalg.norm(phi, axis=-1, keepdims=True)).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=2e-4)

    def test_log_near_pi(self, rng):
        for theta in [np.pi - 1e-4, np.pi - 1e-6]:
            axis = np.array([0.3, -0.5, 0.8])
            axis /= np.linalg.norm(axis)
            phi = (theta * axis).astype(np.float32)
            R = lie.so3_exp(jnp.asarray(phi))
            phi2 = np.asarray(lie.so3_log(R))
            R2 = np.asarray(lie.so3_exp(jnp.asarray(phi2)))
            # Near pi the sign of the axis may flip; compare rotations.
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)

    def test_orthonormal(self, rng):
        phi = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
        )


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32) * 0.8
        T = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_inverse(self, rng):
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        TT = np.asarray(T @ lie.se3_inverse(T))
        np.testing.assert_allclose(TT, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_transform_points(self, rng):
        T = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32)))
        pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        out = np.asarray(lie.transform_points(T, pts))
        Tn = np.asarray(T)
        expected = pts @ Tn[:3, :3].T + Tn[:3, 3]
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_jit_and_vmap(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
        direct = lie.se3_exp(xi)
        vmapped = jax.vmap(lie.se3_exp)(xi)
        jitted = jax.jit(lie.se3_exp)(xi)
        np.testing.assert_allclose(direct, vmapped, atol=1e-6)
        np.testing.assert_allclose(direct, jitted, atol=1e-6)

    def test_grad_flows(self):
        def loss(xi):
            return jnp.sum(lie.se3_exp(xi) ** 2)

        g = jax.grad(loss)(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 7)).astype(np.float32) * 0.7
        S = lie.sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.sim3_log(S))
        np.testing.assert_allclose(xi2, xi, atol=3e-3)

    def test_scale_extraction(self, rng):
        xi = np.zeros(7, np.float32)
        xi[6] = 0.5
        S = lie.sim3_exp(jnp.asarray(xi))
        _, _, s = lie.sim3_parts(S)
        np.testing.assert_allclose(float(s), np.exp(0.5), rtol=1e-5)

    def test_inverse(self, rng):
        xi = rng.normal(size=(16, 7)).astype(np.float32) * 0.5
        S = lie.sim3_exp(jnp.asarray(xi))
        SS = np.asarray(S @ lie.sim3_inverse(S))
        np.testing.assert_allclose(SS, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-4)

    def test_se3_embedding(self, rng):
        # sigma = 0 reduces Sim3 exp to SE3 exp.
        xi6 = rng.normal(size=(8, 6)).astype(np.float32)
        xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], axis=-1)
        np.testing.assert_allclose(
            np.asarray(lie.sim3_exp(jnp.asarray(xi7))),
            np.asarray(lie.se3_exp(jnp.asarray(xi6))),
            atol=1e-5,
        )


class TestQuat:
    def test_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        q = lie.rot_to_quat(jnp.asarray(R))
        R2 = np.asarray(lie.quat_to_rot(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_identity(self):
        q = np.asarray(lie.rot_to_quat(jnp.eye(3)))
        np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-6)
