"""Pose-graph optimization tests (SURVEY §4: essential-graph convergence on
a synthetic loop)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import lie, pose_graph


def circle_poses(n, radius=5.0):
    """Ground-truth Tcw around a circle (a loop trajectory)."""
    poses = []
    for k in range(n):
        th = 2 * np.pi * k / n
        c = np.array([radius * np.sin(th), 0.0, radius * (1 - np.cos(th))])
        yaw = th
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = R
        Twc[:3, 3] = c
        poses.append(np.linalg.inv(Twc).astype(np.float32))
    return poses


def test_loop_correction_reduces_drift(rng):
    n = 24
    gt = circle_poses(n)
    # Simulate odometry drift: accumulate noisy relative motions.
    est = [gt[0]]
    for k in range(1, n):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(
            lie.se3_exp(jnp.asarray(rng.normal(0, 0.01, 6).astype(np.float32) * np.array([1, 1, 1, 0.5, 0.5, 0.5], np.float32)))
        )
        est.append((noise @ rel @ est[-1]).astype(np.float32))
    est = np.stack(est)
    drift_before = np.linalg.norm(
        np.linalg.inv(est[-1])[:3, 3] - np.linalg.inv(gt[-1])[:3, 3]
    )

    # Edges: sequential chain with the (noisy) measured odometry, plus a
    # perfect loop edge last->first.
    ei, ej, Sji = [], [], []
    for k in range(1, n):
        ei.append(k - 1)
        ej.append(k)
        Sji.append(est[k] @ np.linalg.inv(est[k - 1]))  # odometric measurement
    ei.append(0)
    ej.append(n - 1)
    Sji.append(np.asarray(gt[n - 1] @ np.linalg.inv(gt[0])))  # loop closure
    edges = pose_graph.PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32),
        j=jnp.asarray(ej, jnp.int32),
        S_ji=jnp.asarray(np.stack(Sji), jnp.float32),
        weight=jnp.ones(len(ei)).at[-1].set(5.0),
        valid=jnp.ones(len(ei), bool),
    )
    fixed = jnp.zeros(n, bool).at[0].set(True)
    corrected = pose_graph.optimize_pose_graph(jnp.asarray(est), fixed, edges, iters=25)

    drift_after = np.linalg.norm(
        np.linalg.inv(np.asarray(corrected[-1]))[:3, 3] - np.linalg.inv(gt[-1])[:3, 3]
    )
    assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
    # First pose untouched.
    np.testing.assert_allclose(np.asarray(corrected[0]), est[0], atol=1e-6)


def test_relative_sim3_roundtrip(rng):
    S_i = lie.sim3_exp(jnp.asarray(rng.normal(0, 0.3, 7).astype(np.float32)))
    S_j = lie.sim3_exp(jnp.asarray(rng.normal(0, 0.3, 7).astype(np.float32)))
    S_ji = pose_graph.relative_sim3(S_i, S_j)
    np.testing.assert_allclose(np.asarray(S_ji @ S_i), np.asarray(S_j), atol=1e-5)
