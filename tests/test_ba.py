"""BA engine tests (SURVEY §4: optimizer tests — motion-only gating semantics,
Schur equivalence vs dense solve on toy graphs)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import ba, lie

K = jnp.array([500.0, 500.0, 320.0, 240.0])
BF = jnp.float32(500.0 * 0.1)


def synth_scene(rng, n_pts=80, n_cams=4, noise=0.3, spread=2.0):
    """Points in a box ~5m ahead; cameras on a small baseline arc."""
    pts = np.stack(
        [
            rng.uniform(-spread, spread, n_pts),
            rng.uniform(-spread, spread, n_pts),
            rng.uniform(4.0, 8.0, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    poses = []
    for i in range(n_cams):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.3 * i  # baseline along x
        xi[4] = 0.02 * i  # slight rotation
        poses.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    poses = np.stack(poses)
    return jnp.asarray(poses), jnp.asarray(pts)


def make_obs(poses, pts, noise_px, rng, stereo=False):
    C, P = poses.shape[0], pts.shape[0]
    cam_idx = np.repeat(np.arange(C), P).astype(np.int32)
    pt_idx = np.tile(np.arange(P), C).astype(np.int32)
    from orb_slam2v2_1_tpu.ops.projection import project_stereo

    targets = np.array(
        project_stereo(poses[cam_idx], pts[pt_idx], K, BF)
    )
    targets += rng.normal(0, noise_px, targets.shape).astype(np.float32)
    O = len(cam_idx)
    return ba.Obs(
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        target=jnp.asarray(targets),
        inv_sigma2=jnp.ones(O),
        is_stereo=jnp.full(O, stereo),
        valid=jnp.ones(O, bool),
    )


class TestPoseOptimization:
    def test_recovers_pose(self, rng):
        poses, pts = synth_scene(rng, n_cams=1)
        obs = make_obs(poses, pts, 0.5, rng)
        # Perturb the camera pose.
        xi = jnp.asarray(rng.normal(0, 0.05, 6).astype(np.float32))
        T0 = lie.se3_exp(xi) @ poses[0]
        T, inliers, n = ba.pose_optimization(T0, pts, obs, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ poses[0]))
        assert np.linalg.norm(err) < 0.01, err
        assert int(n) > 70

    def test_outlier_gating(self, rng):
        poses, pts = synth_scene(rng, n_cams=1)
        obs = make_obs(poses, pts, 0.3, rng)
        # Corrupt 20% of the observations badly.
        O = obs.target.shape[0]
        bad = np.zeros(O, bool)
        bad[rng.choice(O, O // 5, replace=False)] = True
        target = np.array(obs.target)
        target[bad] += rng.uniform(30, 80, (bad.sum(), 3)).astype(np.float32)
        obs = obs._replace(target=jnp.asarray(target))

        xi = jnp.asarray(rng.normal(0, 0.03, 6).astype(np.float32))
        T0 = lie.se3_exp(xi) @ poses[0]
        T, inliers, n = ba.pose_optimization(T0, pts, obs, K, BF)
        inliers = np.asarray(inliers)
        # All corrupted obs must be flagged outliers; most clean obs kept.
        assert not inliers[bad].any()
        assert inliers[~bad].mean() > 0.9
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ poses[0]))
        assert np.linalg.norm(err) < 0.01

    def test_stereo_observations(self, rng):
        poses, pts = synth_scene(rng, n_cams=1)
        obs = make_obs(poses, pts, 0.3, rng, stereo=True)
        xi = jnp.asarray(rng.normal(0, 0.04, 6).astype(np.float32))
        T0 = lie.se3_exp(xi) @ poses[0]
        T, _, n = ba.pose_optimization(T0, pts, obs, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ poses[0]))
        assert np.linalg.norm(err) < 0.01
        assert int(n) > 70


class TestMixedOctaves:
    def test_no_spurious_fixed_point(self, rng):
        """Regression: with per-octave information weights, the LM accept
        test must evaluate the same objective as the step direction —
        a mismatch created stable wrong-pose fixed points ~6cm from truth."""
        poses, pts = synth_scene(rng, n_pts=200)
        obs = make_obs(poses[:1], pts, 0.3, rng)
        # Heterogeneous octaves -> heterogeneous inv_sigma2.
        levels = rng.integers(0, 8, 200)
        obs = obs._replace(inv_sigma2=jnp.asarray((1 / 1.44**levels).astype(np.float32)))
        # Start 6 cm forward of the truth.
        T0 = jnp.asarray(np.diag([1.0, 1, 1, 1]).astype(np.float32)).at[2, 3].set(0.065)
        T0 = T0 @ poses[0]
        T, _, n = ba.pose_optimization(T0, pts, obs, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ poses[0]))
        assert np.linalg.norm(err) < 5e-3, err


class TestBundleAdjust:
    def _problem(self, rng, noise_px=0.3, perturb=0.02, stereo=True):
        poses, pts = synth_scene(rng)
        obs = make_obs(poses, pts, noise_px, rng, stereo=stereo)
        C = poses.shape[0]
        poses_n = lie.se3_exp(
            jnp.asarray(
                np.concatenate(
                    [np.zeros((2, 6)), rng.normal(0, perturb, (C - 2, 6))]
                ).astype(np.float32)
            )
        ) @ poses
        pts_n = pts + jnp.asarray(rng.normal(0, 0.05, pts.shape).astype(np.float32))
        fixed = jnp.asarray(np.array([True, True] + [False] * (C - 2)))
        prob = ba.BAProblem(poses=poses_n, points=pts_n, obs=obs, cam_fixed=fixed, K=K, bf=BF)
        return prob, poses, pts

    def test_reduces_error(self, rng):
        prob, gt_poses, gt_pts = self._problem(rng)
        prob2, cost = ba.bundle_adjust(prob)
        # Pose error vs ground truth must shrink substantially.
        def pose_err(poses):
            e = lie.se3_log(lie.se3_inverse(poses) @ gt_poses)
            return float(jnp.linalg.norm(e))

        assert pose_err(prob2.poses) < 0.25 * pose_err(prob.poses)
        assert np.isfinite(float(cost))

    def test_fixed_cameras_unchanged(self, rng):
        prob, _, _ = self._problem(rng)
        prob2, _ = ba.bundle_adjust(prob)
        np.testing.assert_allclose(prob2.poses[:2], prob.poses[:2], atol=1e-6)

    def test_early_exit_tolerance_costs_no_accuracy(self, rng):
        """The LM early exit fires at a 1e-3 relative cost decrease
        (ba.py lm_iter `done`). Pin that stopping there costs nothing real:
        10 EXTRA plain iterations past the standard schedule may not improve
        the cost by more than 0.5% nor move the pose estimate vs ground
        truth meaningfully (VERDICT r4 leftover: the loosened tolerance
        needs a direct accuracy-regression assertion)."""
        prob, gt_poses, _ = self._problem(rng)
        prob2, cost2 = ba.bundle_adjust(prob)
        prob3, cost3, _, _ = ba.ba_step_count_lam(
            prob2, jnp.float32(1e-6), iters=10, cg_iters=32, robust=False
        )
        c2, c3 = float(cost2), float(cost3)
        assert c3 <= c2 * 1.001  # extra iterations never hurt
        assert (c2 - c3) <= 0.005 * c2 + 1e-6, (c2, c3)

        def pose_err(poses):
            e = lie.se3_log(lie.se3_inverse(poses) @ gt_poses)
            return float(jnp.linalg.norm(e))

        # The extra refinement moves the solution by <5% of the remaining
        # error: the early exit stopped at the right place.
        assert abs(pose_err(prob3.poses) - pose_err(prob2.poses)) <= (
            0.05 * pose_err(prob2.poses) + 1e-5
        )


def coo_to_window(prob: ba.BAProblem, n_slots: int):
    """Pack a COO problem (unique (cam, pt) pairs) into a BAWindow."""
    C = prob.poses.shape[0]
    P = prob.points.shape[0]
    cam = np.asarray(prob.obs.cam_idx)
    pt_idx = np.full((C, n_slots), P, np.int32)
    target = np.zeros((C, n_slots, 3), np.float32)
    inv_s2 = np.ones((C, n_slots), np.float32)
    stereo = np.zeros((C, n_slots), bool)
    valid = np.zeros((C, n_slots), bool)
    fill = np.zeros(C, np.int32)
    for o in range(cam.shape[0]):
        if not bool(prob.obs.valid[o]):
            continue
        c = int(cam[o])
        s = fill[c]
        fill[c] += 1
        pt_idx[c, s] = int(prob.obs.pt_idx[o])
        target[c, s] = np.asarray(prob.obs.target[o])
        inv_s2[c, s] = float(prob.obs.inv_sigma2[o])
        stereo[c, s] = bool(prob.obs.is_stereo[o])
        valid[c, s] = True
    return ba.BAWindow(
        poses=prob.poses, points=prob.points, pt_idx=jnp.asarray(pt_idx),
        target=jnp.asarray(target), inv_sigma2=jnp.asarray(inv_s2),
        is_stereo=jnp.asarray(stereo), valid=jnp.asarray(valid),
        cam_fixed=prob.cam_fixed, K=prob.K, bf=prob.bf,
    )


class TestWindowBA:
    """The structured camera-major window solver (ba.BAWindow) must agree
    with the COO path — same math, TPU-friendly layout."""

    def test_reduces_error_like_coo(self, rng):
        poses, pts = synth_scene(rng)
        obs = make_obs(poses, pts, 0.3, rng, stereo=True)
        C = poses.shape[0]
        poses_n = lie.se3_exp(
            jnp.asarray(
                np.concatenate(
                    [np.zeros((2, 6)), rng.normal(0, 0.02, (C - 2, 6))]
                ).astype(np.float32)
            )
        ) @ poses
        pts_n = pts + jnp.asarray(rng.normal(0, 0.05, pts.shape).astype(np.float32))
        fixed = jnp.asarray(np.array([True, True] + [False] * (C - 2)))
        prob = ba.BAProblem(poses=poses_n, points=pts_n, obs=obs, cam_fixed=fixed, K=K, bf=BF)
        win = coo_to_window(prob, n_slots=pts.shape[0])
        win2, cost = ba.bundle_adjust_window(win)

        e0 = float(jnp.linalg.norm(lie.se3_log(lie.se3_inverse(prob.poses) @ poses)))
        e1 = float(jnp.linalg.norm(lie.se3_log(lie.se3_inverse(win2.poses) @ poses)))
        assert e1 < 0.25 * e0
        assert np.isfinite(float(cost))
        # Fixed cameras bit-identical.
        np.testing.assert_allclose(win2.poses[:2], prob.poses[:2], atol=1e-6)

    def test_step_matches_dense_normal_equations(self, rng):
        """One damped GN step of the window solver vs the full dense
        (6C+3P) normal equations in f64."""
        poses, pts = synth_scene(rng, n_pts=30, n_cams=3)
        obs = make_obs(poses, pts, 0.5, rng, stereo=True)
        C, P = 3, 30
        poses_n = lie.se3_exp(jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))) @ poses
        pts_n = pts + jnp.asarray(rng.normal(0, 0.02, pts.shape).astype(np.float32))
        fixed = jnp.zeros(C, bool)
        prob = ba.BAProblem(poses=poses_n, points=pts_n, obs=obs, cam_fixed=fixed, K=K, bf=BF)
        win = coo_to_window(prob, n_slots=P)

        slot_of = ba._window_slot_of(win)
        # Compare in f64: the planar step's closed-form 3x3 inverses and
        # stacked-matmul accumulation order differ from numpy's dense solve
        # enough to add a few 1e-4 of f32 noise on a tiny problem; in f64 the
        # agreement is ~1e-6, which is what actually validates the math.
        with jax.enable_x64(True):
            win64 = jax.tree.map(
                lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a,
                win,
            )
            # robust=False -> plain information weights (inv_sigma2 * valid).
            dx_cam, dx_pt, _ = ba._window_planar_step(
                win64, slot_of, jnp.float64(1e-4), jnp.asarray(False)
            )

        # Dense reference from the COO layout (matches TestSchurEquivalence).
        inlier = prob.obs.valid.astype(jnp.float32)
        rc, Jcc, Jpc, wc, *_ = ba._build_system(prob, False, inlier)
        r64 = np.asarray(rc, np.float64)
        Jc64 = np.asarray(Jcc, np.float64)
        Jp64 = np.asarray(Jpc, np.float64)
        w64 = np.asarray(wc, np.float64)
        O = r64.shape[0]
        n = 6 * C + 3 * P
        J = np.zeros((O * 3, n))
        for o in range(O):
            c, p = int(obs.cam_idx[o]), int(obs.pt_idx[o])
            J[o * 3 : o * 3 + 3, c * 6 : c * 6 + 6] = Jc64[o]
            J[o * 3 : o * 3 + 3, 6 * C + p * 3 : 6 * C + p * 3 + 3] = Jp64[o]
        W = np.repeat(w64, 3)
        H = J.T @ (J * W[:, None])
        g = J.T @ (r64.reshape(-1) * W)
        H_d = H + 1e-4 * np.diag(np.diag(H)) + 1e-8 * np.eye(n)
        dx = np.linalg.solve(H_d, -g)
        np.testing.assert_allclose(
            np.asarray(dx_cam).reshape(-1), dx[: 6 * C], rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dx_pt).reshape(-1), dx[6 * C :], rtol=1e-3, atol=1e-4
        )

        # And the PRODUCTION f32 path (closed-form 3x3 inverses, stacked
        # matmuls) must stay within loose tolerance of the same reference —
        # the tight f64 check alone would let an f32-only regression slip.
        dx_cam32, dx_pt32, _ = ba._window_planar_step(
            win, slot_of, jnp.float32(1e-4), jnp.asarray(False)
        )
        np.testing.assert_allclose(
            np.asarray(dx_cam32).reshape(-1), dx[: 6 * C], rtol=0.05, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(dx_pt32).reshape(-1), dx[6 * C :], rtol=0.05, atol=2e-3
        )


class TestSchurEquivalence:
    def test_matches_dense_gauss_newton(self, rng):
        """The matrix-free Schur-PCG camera step must match the dense normal
        equations solution on a small, well-conditioned problem."""
        poses, pts = synth_scene(rng, n_pts=30, n_cams=3)
        obs = make_obs(poses, pts, 0.5, rng, stereo=True)
        C, P = 3, 30
        poses_n = lie.se3_exp(jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))) @ poses
        pts_n = pts + jnp.asarray(rng.normal(0, 0.02, pts.shape).astype(np.float32))
        fixed = jnp.zeros(C, bool)
        prob = ba.BAProblem(poses=poses_n, points=pts_n, obs=obs, cam_fixed=fixed, K=K, bf=BF)

        inlier = prob.obs.valid.astype(jnp.float32)
        r, Jc, Jp, w, cost, _, _ = ba._build_system(prob, False, inlier)
        lam = jnp.float32(1e-4)
        dx_cam, dx_pt = ba._schur_solve(prob, r, Jc, Jp, w, lam, cg_iters=60)

        # Dense reference: full (6C+3P) damped normal equations in f64.
        r64 = np.asarray(r, np.float64)
        Jc64 = np.asarray(Jc, np.float64)
        Jp64 = np.asarray(Jp, np.float64)
        w64 = np.asarray(w, np.float64)
        O = r64.shape[0]
        n = 6 * C + 3 * P
        J = np.zeros((O * 3, n))
        for o in range(O):
            c, p = int(obs.cam_idx[o]), int(obs.pt_idx[o])
            J[o * 3 : o * 3 + 3, c * 6 : c * 6 + 6] = Jc64[o]
            J[o * 3 : o * 3 + 3, 6 * C + p * 3 : 6 * C + p * 3 + 3] = Jp64[o]
        W = np.repeat(w64, 3)
        H = J.T @ (J * W[:, None])
        g = J.T @ (r64.reshape(-1) * W)
        H_d = H + float(lam) * np.diag(np.diag(H)) + 1e-8 * np.eye(n)
        dx = np.linalg.solve(H_d, -g)
        np.testing.assert_allclose(
            np.asarray(dx_cam).reshape(-1), dx[: 6 * C], rtol=0.05, atol=5e-5
        )
