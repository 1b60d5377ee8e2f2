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


def _noisy_problem(rng, n_pts=64, n_cams=4, stereo=True):
    poses, pts = synth_scene(rng, n_pts=n_pts, n_cams=n_cams)
    obs = make_obs(poses, pts, 0.3, rng, stereo=stereo)
    C = poses.shape[0]
    poses_n = lie.se3_exp(
        jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))
    ) @ poses
    pts_n = pts + jnp.asarray(rng.normal(0, 0.02, pts.shape).astype(np.float32))
    fixed = jnp.asarray([True] + [False] * (C - 1))
    poses_n = jnp.where(fixed[:, None, None], poses, poses_n)
    prob = ba.BAProblem(
        poses=poses_n, points=pts_n, obs=obs, cam_fixed=fixed, K=K, bf=BF
    )
    return prob, poses


class TestShardedFullSchedule:
    """The full sharded LM schedule (robust -> cull -> plain) must converge
    to the single-device `ba.bundle_adjust` objective."""

    def test_cost_parity_8dev(self, rng):
        prob, gt_poses = _noisy_problem(rng)
        prob2, cost_ref = ba.bundle_adjust(prob, cg_iters=40)

        mesh = Mesh(np.array(jax.devices()[:8]), ("obs",))
        solve = dist_ba.make_sharded_bundle_adjust(mesh, cg_iters=40)
        p_s, x_s, valid_s, cost_s = solve(
            prob.poses, prob.points, prob.obs, prob.cam_fixed, K, BF
        )
        rel = abs(float(cost_s) - float(cost_ref)) / max(float(cost_ref), 1e-9)
        assert rel < 0.01, (float(cost_s), float(cost_ref))

        # Both engines should recover the ground-truth poses.
        def err(ps):
            return float(jnp.linalg.norm(lie.se3_log(lie.se3_inverse(ps) @ gt_poses)))

        assert err(p_s) < 0.02
        assert err(p_s) < err(prob.poses)

    def test_lm_chunk_threads_damping(self, rng):
        """Two 3-iteration chunks with threaded lam converge like one
        6-iteration run (the abortable-GBA chunking invariant). Exact pose
        equality is NOT expected: each chunk re-orthonormalizes and restarts
        the early-exit check — the invariant is the converged cost."""
        prob, _ = _noisy_problem(rng)
        mesh = Mesh(np.array(jax.devices()[:4]), ("obs",))
        chunk3 = dist_ba.get_sharded_lm_chunk(mesh, iters=3, robust=True, cg_iters=40)
        chunk6 = dist_ba.get_sharded_lm_chunk(mesh, iters=6, robust=True, cg_iters=40)
        lam = jnp.float32(1e-4)
        p_a, x_a, lam_a, _ = chunk3(
            prob.poses, prob.points, prob.obs, prob.cam_fixed, K, BF, lam
        )
        p_a, x_a, lam_a, _ = chunk3(p_a, x_a, prob.obs, prob.cam_fixed, K, BF, lam_a)
        p_b, x_b, lam_b, _ = chunk6(
            prob.poses, prob.points, prob.obs, prob.cam_fixed, K, BF, lam
        )

        def cost(p, x):
            return float(dist_ba._local_cost(p, x, prob.obs, K, BF, True))

        c_a, c_b, c_0 = cost(p_a, x_a), cost(p_b, x_b), cost(prob.poses, prob.points)
        assert c_a < 0.2 * c_0  # chunked run actually optimizes
        # Same basin, not bit-identical (chunk boundaries re-orthonormalize).
        assert abs(c_a - c_b) / max(c_b, 1e-9) < 0.1


def synthetic_map_state(rng, n_kf=8, n_pts=256, Kcap=16, Mcap=512, N=128,
                        noise=0.005):
    """Geometrically consistent MapState: keyframes on an arc observing a
    shared point cloud (projections as keypoints), with a small pose/point
    perturbation for BA to undo."""
    from orb_slam2v2_1_tpu.models.map_state import (
        append_keyframe, empty_map, refresh_covis,
    )
    from orb_slam2v2_1_tpu.ops.projection import project_stereo

    pts = np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
         rng.uniform(3, 7, n_pts)], -1
    ).astype(np.float32)
    state = empty_map(Kcap, Mcap, N)
    state = state._replace(
        mp_pos=state.mp_pos.at[:n_pts].set(jnp.asarray(pts)),
        mp_valid=state.mp_valid.at[:n_pts].set(True),
        mp_max_dist=state.mp_max_dist.at[:n_pts].set(100.0),
        n_mp=jnp.int32(n_pts),
    )
    for k in range(n_kf):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.15 * k
        xi[4] = 0.02 * k
        pose = lie.se3_exp(jnp.asarray(xi))
        sel = rng.choice(n_pts, size=N, replace=n_pts < N)
        uvr = project_stereo(
            jnp.broadcast_to(pose, (N, 4, 4)), jnp.asarray(pts[sel]), K, BF
        )
        xy = uvr[:, :2] + jnp.asarray(rng.normal(0, 0.2, (N, 2)), jnp.float32)
        ur = uvr[:, 2]
        state, kf = append_keyframe(
            state, pose, jnp.int32(k), xy, jnp.zeros(N, jnp.int32),
            jnp.zeros(N), jnp.zeros((N, 8), jnp.uint32), jnp.ones(N, bool),
            ur, jnp.asarray(sel, jnp.int32),
        )
    state = refresh_covis(state)
    # Perturb everything but the anchor (oldest) keyframe.
    d = lie.se3_exp(jnp.asarray(rng.normal(0, noise, (Kcap, 6)), jnp.float32))
    pert = d @ state.kf_pose
    keep = jnp.arange(Kcap) == 0
    state = state._replace(
        kf_pose=jnp.where(keep[:, None, None], state.kf_pose, pert),
        mp_pos=state.mp_pos
        + jnp.asarray(rng.normal(0, 5 * noise, (Mcap, 3)), jnp.float32)
        * state.mp_valid[:, None],
    )
    return state


def _copy_state(state):
    return jax.tree.map(jnp.copy, state)


class TestProductRouting:
    """run_global_bundle_adjustment must route through the sharded engine
    when a multi-device mesh is available, and produce a map equivalent to
    the single-device path."""

    def test_gba_routes_and_matches(self, rng):
        from orb_slam2v2_1_tpu.models import loop_closing

        state = synthetic_map_state(rng)
        mesh = Mesh(np.array(jax.devices()[:8]), ("obs",))

        s_single, cost_single = loop_closing.global_bundle_adjustment(
            _copy_state(state), K, BF
        )
        s_dist, cost_dist = loop_closing.run_global_bundle_adjustment(
            _copy_state(state), K, BF, mesh=mesh
        )
        # Same basin: poses agree tightly, and the sharded solve reaches a
        # cost at least as good as the single-device one (the dense path's
        # early exit can leave it slightly higher).
        assert float(cost_dist) <= float(cost_single) * 1.02
        np.testing.assert_allclose(
            np.asarray(s_dist.kf_pose), np.asarray(s_single.kf_pose), atol=5e-3
        )

    def test_local_ba_dist_matches_single(self, rng):
        from orb_slam2v2_1_tpu.models import local_mapping

        state = synthetic_map_state(rng)
        mesh = Mesh(np.array(jax.devices()[:8]), ("obs",))
        kf_id = 7
        s1, cost1 = local_mapping.local_bundle_adjustment(
            _copy_state(state), jnp.int32(kf_id), K, BF
        )
        s2, cost2 = local_mapping.local_bundle_adjustment_dist(
            _copy_state(state), kf_id, K, BF, mesh
        )
        rel = abs(float(cost2) - float(cost1)) / max(float(cost1), 1e-9)
        assert rel < 0.1  # different solvers (planar-chol vs sharded PCG)
        np.testing.assert_allclose(
            np.asarray(s2.kf_pose), np.asarray(s1.kf_pose), atol=1e-2
        )
