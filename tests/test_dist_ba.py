"""Distributed BA on the virtual 8-device CPU mesh (SURVEY §4: multi-host
without a cluster)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from orb_slam2v2_1_tpu.ops import ba, lie
from orb_slam2v2_1_tpu.parallel import dist_ba
from tests.test_ba import K, BF, synth_scene, make_obs


def test_sharded_step_matches_single_device(rng):
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8
    poses, pts = synth_scene(rng, n_pts=64, n_cams=4)
    obs = make_obs(poses, pts, 0.3, rng, stereo=True)  # 256 obs = 8*32
    C = poses.shape[0]
    poses_n = lie.se3_exp(jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))) @ poses
    pts_n = pts + jnp.asarray(rng.normal(0, 0.02, pts.shape).astype(np.float32))
    fixed = jnp.asarray([True] + [False] * (C - 1))

    mesh = Mesh(devices, ("obs",))
    step = dist_ba.make_sharded_ba_step(mesh, cg_iters=40, robust=False)
    new_poses, new_pts = step(poses_n, pts_n, obs, fixed, K, BF)

    # Single-device reference step with identical parameters.
    ref_poses, ref_pts = dist_ba.distributed_ba_step(
        poses_n, pts_n, obs, fixed, K, BF, axis=None, cg_iters=40, robust=False
    ) if False else (None, None)
    # Single-device reference via a 1-device mesh.
    mesh1 = Mesh(devices[:1], ("obs",))
    step1 = dist_ba.make_sharded_ba_step(mesh1, cg_iters=40, robust=False)
    ref_poses, ref_pts = step1(poses_n, pts_n, obs, fixed, K, BF)

    np.testing.assert_allclose(np.asarray(new_poses), np.asarray(ref_poses), atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_pts), np.asarray(ref_pts), atol=2e-3)

    # And the step actually reduces pose error vs ground truth.
    def err(ps):
        return float(jnp.linalg.norm(lie.se3_log(lie.se3_inverse(ps) @ poses)))

    assert err(new_poses) < err(poses_n)
