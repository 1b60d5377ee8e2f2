"""Distributed bundle adjustment: observations sharded over a device mesh.

Design (SURVEY §2.3 / §5 "long-context analog"): the BA edge set (camera,
point, pixel) is the big axis — shard it. Poses and points are replicated;
each device builds its local normal-equation contributions; the Schur-reduced
camera system is solved with preconditioned CG where every matrix-vector
product ends in ONE `psum` over the mesh (the all-reduce of the reduced
camera blocks riding ICI). Landmark back-substitution is local + psum.

This replaces the reference's single-process g2o `LocalBundleAdjustment`
(src/Optimizer.cc:453-780) with a formulation whose cost scales as
O(obs / n_devices) per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import ba, lie


def _local_blocks(poses, points, obs: ba.Obs, K, bf, robust: bool):
    """Per-shard residuals/Jacobians + block Hessians (all local)."""
    rmask = ba._res_mask(obs)
    Tcams = poses[obs.cam_idx]
    pw = points[obs.pt_idx]
    r, Jc, Jp, behind = ba._residual_jac_batch(Tcams, pw, obs.target, K, bf)
    r = r * rmask
    Jc = Jc * rmask[..., None]
    Jp = Jp * rmask[..., None]
    chi2 = ba._chi2(r, obs)
    w = ba._obs_weights(obs, chi2, jnp.asarray(robust)) * (~behind)
    return r, Jc, Jp, w


def _local_system(poses, points, obs: ba.Obs, cam_fixed, K, bf, robust):
    """Residuals/Jacobians/weights + local robustified cost, with semantics
    identical to `ba._build_system` (fixed-camera Jacobians zeroed, Huber on
    the cost, obs.valid as the inlier mask) so a sharded solve converges to
    the same objective as the single-device `ba.bundle_adjust`."""
    rmask = ba._res_mask(obs)
    Tcams = poses[obs.cam_idx]
    pw = points[obs.pt_idx]
    r, Jc, Jp, behind = ba._residual_jac_batch(Tcams, pw, obs.target, K, bf)
    r = r * rmask
    Jc = Jc * rmask[..., None]
    Jp = Jp * rmask[..., None]
    chi2 = ba._chi2(r, obs)
    w = ba._obs_weights(obs, chi2, jnp.asarray(robust))
    free_cam = (~cam_fixed)[obs.cam_idx].astype(r.dtype)
    Jc = Jc * free_cam[:, None, None]
    cost_local = ba._cost(obs, chi2, jnp.asarray(robust), 1.0)
    return r, Jc, Jp, w, cost_local, chi2, behind


def _local_cost(poses, points, obs: ba.Obs, K, bf, robust):
    """Local (pre-psum) robustified cost at the given parameters."""
    rmask = ba._res_mask(obs)
    Tcams = poses[obs.cam_idx]
    pw = points[obs.pt_idx]
    pc = jnp.einsum("oij,oj->oi", Tcams[:, :3, :3], pw) + Tcams[:, :3, 3]
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = K[0] * pc[:, 0] / z + K[2]
    v = K[1] * pc[:, 1] / z + K[3]
    ur = u - bf / z
    r = (jnp.stack([u, v, ur], -1) - obs.target) * rmask
    chi2 = ba._chi2(r, obs)
    return ba._cost(obs, chi2, jnp.asarray(robust), 1.0)


def distributed_ba_step(
    poses,  # (C,4,4) replicated
    points,  # (P,3) replicated
    obs: ba.Obs,  # sharded along the observation axis
    cam_fixed,  # (C,) replicated
    K,
    bf,
    axis: str = "obs",
    lam: float = 1e-4,
    cg_iters: int = 16,
    robust: bool = True,
):
    """One damped GN step; call under shard_map with `axis` mapped over the
    observation shards. Returns (new_poses, new_points) replicated."""
    C = poses.shape[0]
    Pn = points.shape[0]
    r, Jc, Jp, w = _local_blocks(poses, points, obs, K, bf, robust)
    cam = obs.cam_idx
    pt = obs.pt_idx

    Wc = Jc * w[:, None, None]
    Wp = Jp * w[:, None, None]

    # Block Hessians + gradients: local segment-sum, then ONE all-reduce.
    Hcc = jax.lax.psum(
        jnp.zeros((C, 6, 6)).at[cam].add(jnp.einsum("oia,oib->oab", Jc, Wc)), axis
    )
    Hpp = jax.lax.psum(
        jnp.zeros((Pn, 3, 3)).at[pt].add(jnp.einsum("oia,oib->oab", Jp, Wp)), axis
    )
    gc = jax.lax.psum(jnp.zeros((C, 6)).at[cam].add(jnp.einsum("oia,oi->oa", Wc, r)), axis)
    gp = jax.lax.psum(jnp.zeros((Pn, 3)).at[pt].add(jnp.einsum("oia,oi->oa", Wp, r)), axis)

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None] * jnp.eye(6)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., None] * jnp.eye(3)
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    def hpc_x(x):  # (C,6) -> (P,3), local + psum
        v = jnp.einsum("oia,oa->oi", Wc, x[cam])
        return jax.lax.psum(
            jnp.zeros((Pn, 3)).at[pt].add(jnp.einsum("oia,oi->oa", Jp, v)), axis
        )

    def hcp_y(y):  # (P,3) -> (C,6)
        v = jnp.einsum("oia,oa->oi", Wp, y[pt])
        return jax.lax.psum(
            jnp.zeros((C, 6)).at[cam].add(jnp.einsum("oia,oi->oa", Jc, v)), axis
        )

    def S_apply(x):
        direct = jnp.einsum("cab,cb->ca", Hcc_d, x)
        u = jnp.einsum("pab,pb->pa", Hpp_inv, hpc_x(x))
        return direct - hcp_y(u)

    rhs = -(gc - hcp_y(jnp.einsum("pab,pb->pa", Hpp_inv, gp)))
    M_inv = jnp.linalg.inv(Hcc_d)

    def precond(x):
        return jnp.einsum("cab,cb->ca", M_inv, x)

    def cg_body(i, state):
        x, res, z, p = state
        Sp = S_apply(p)
        rz = jnp.sum(res * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
        x = x + alpha * p
        res_n = res - alpha * Sp
        z_n = precond(res_n)
        beta = jnp.sum(res_n * z_n) / jnp.maximum(rz, 1e-20)
        return (x, res_n, z_n, z_n + beta * p)

    z0 = precond(rhs)
    dx_cam, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (jnp.zeros((C, 6)), rhs, z0, z0))
    dx_cam = dx_cam * (~cam_fixed)[:, None]
    dx_pt = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + hpc_x(dx_cam))

    new_poses = lie.orthonormalize(lie.se3_exp(dx_cam) @ poses)
    new_points = points + dx_pt
    return new_poses, new_points


def _gn_solve(poses, points, obs: ba.Obs, cam_fixed, K, bf, axis, lam,
              robust, cg_iters: int):
    """One damped GN step (Schur-eliminated, block-Jacobi PCG) with every
    reduction ending in ONE `psum` over `axis`. Returns
    (dx_cam, dx_pt, cost0) where cost0 is the globally-reduced robustified
    cost at the input parameters."""
    C = poses.shape[0]
    Pn = points.shape[0]
    r, Jc, Jp, w, cost_local, _, _ = _local_system(
        poses, points, obs, cam_fixed, K, bf, robust
    )
    cost0 = jax.lax.psum(cost_local, axis)
    cam = obs.cam_idx
    pt = obs.pt_idx
    Wc = Jc * w[:, None, None]
    Wp = Jp * w[:, None, None]

    Hcc = jax.lax.psum(
        jnp.zeros((C, 6, 6)).at[cam].add(jnp.einsum("oia,oib->oab", Jc, Wc)), axis
    )
    Hpp = jax.lax.psum(
        jnp.zeros((Pn, 3, 3)).at[pt].add(jnp.einsum("oia,oib->oab", Jp, Wp)), axis
    )
    gc = jax.lax.psum(jnp.zeros((C, 6)).at[cam].add(jnp.einsum("oia,oi->oa", Wc, r)), axis)
    gp = jax.lax.psum(jnp.zeros((Pn, 3)).at[pt].add(jnp.einsum("oia,oi->oa", Wp, r)), axis)

    Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None] * jnp.eye(6)
    Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., None] * jnp.eye(3)
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    def hpc_x(x):
        v = jnp.einsum("oia,oa->oi", Wc, x[cam])
        return jax.lax.psum(
            jnp.zeros((Pn, 3)).at[pt].add(jnp.einsum("oia,oi->oa", Jp, v)), axis
        )

    def hcp_y(y):
        v = jnp.einsum("oia,oa->oi", Wp, y[pt])
        return jax.lax.psum(
            jnp.zeros((C, 6)).at[cam].add(jnp.einsum("oia,oi->oa", Jc, v)), axis
        )

    def S_apply(x):
        direct = jnp.einsum("cab,cb->ca", Hcc_d, x)
        u = jnp.einsum("pab,pb->pa", Hpp_inv, hpc_x(x))
        return direct - hcp_y(u)

    rhs = -(gc - hcp_y(jnp.einsum("pab,pb->pa", Hpp_inv, gp)))
    M_inv = jnp.linalg.inv(Hcc_d)

    def precond(x):
        return jnp.einsum("cab,cb->ca", M_inv, x)

    def cg_body(i, state):
        x, res, z, p = state
        Sp = S_apply(p)
        rz = jnp.sum(res * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
        x = x + alpha * p
        res_n = res - alpha * Sp
        z_n = precond(res_n)
        beta = jnp.sum(res_n * z_n) / jnp.maximum(rz, 1e-20)
        return (x, res_n, z_n, z_n + beta * p)

    z0 = precond(rhs)
    dx_cam, _, _, _ = jax.lax.fori_loop(
        0, cg_iters, cg_body, (jnp.zeros((C, 6)), rhs, z0, z0)
    )
    dx_cam = dx_cam * (~cam_fixed)[:, None]
    dx_pt = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + hpc_x(dx_cam))
    dx_cam = jnp.where(jnp.all(jnp.isfinite(dx_cam)), dx_cam, jnp.zeros_like(dx_cam))
    dx_pt = jnp.where(jnp.all(jnp.isfinite(dx_pt)), dx_pt, jnp.zeros_like(dx_pt))
    return dx_cam, dx_pt, cost0


def _lm_run(poses, points, obs: ba.Obs, cam_fixed, K, bf, axis, lam0,
            iters: int, robust: bool, cg_iters: int):
    """`iters` LM iterations with the accept/damping/early-exit schedule of
    `ba.ba_step_count_lam` (src/Optimizer.cc LM semantics), each step one
    sharded GN solve. All shards compute identical replicated decisions from
    identical psum results, so control flow stays in lockstep."""

    def lm_cond(state):
        _, _, _, it, done = state
        return (it < iters) & ~done

    def lm_iter(state):
        poses, points, lam, it, _ = state
        dx_cam, dx_pt, cost0 = _gn_solve(
            poses, points, obs, cam_fixed, K, bf, axis, lam, robust, cg_iters
        )
        new_poses = lie.se3_exp(dx_cam) @ poses
        new_points = points + dx_pt
        cost1 = jax.lax.psum(
            _local_cost(new_poses, new_points, obs, K, bf, robust), axis
        )
        accept = cost1 < cost0
        done = accept & (cost0 - cost1 < 1e-3 * cost0 + 1e-6)
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6)
        return (poses, points, lam, it + 1, done)

    poses, points, lam, _, converged = jax.lax.while_loop(
        lm_cond, lm_iter, (poses, points, lam0, jnp.int32(0), jnp.asarray(False))
    )
    ortho = lie.orthonormalize(poses)
    poses = jnp.where(cam_fixed[:, None, None], poses, ortho)
    return poses, points, lam, converged


def _classify_local(poses, points, obs: ba.Obs, K, bf):
    """chi2 + depth-positivity outlier gate on the LOCAL observation shard
    (ba.classify_outliers semantics — purely elementwise, no collective)."""
    rmask = ba._res_mask(obs)
    Tcams = poses[obs.cam_idx]
    pw = points[obs.pt_idx]
    r, _, _, behind = ba._residual_jac_batch(Tcams, pw, obs.target, K, bf)
    chi2 = ba._chi2(r * rmask, obs)
    th = jnp.where(obs.is_stereo, ba.CHI2_STEREO, ba.CHI2_MONO)
    good = (chi2 <= th) & ~behind & obs.valid
    return obs._replace(valid=good)


def sharded_bundle_adjust_body(
    poses, points, obs: ba.Obs, cam_fixed, K, bf,
    axis: str = "obs", iters1: int = 5, iters2: int = 10, cg_iters: int = 24,
):
    """Full sharded LM schedule — the distributed analog of
    `ba.bundle_adjust` (robust rounds -> chi2 outlier cull -> plain rounds,
    src/Optimizer.cc:607-636). Call under shard_map with the observation
    axis mapped. Returns (poses, points, obs_valid, cost): poses/points
    replicated, obs_valid sharded, cost globally reduced."""
    poses, points, _, _ = _lm_run(
        poses, points, obs, cam_fixed, K, bf, axis,
        jnp.float32(1e-4), iters1, True, cg_iters,
    )
    obs = _classify_local(poses, points, obs, K, bf)
    poses, points, _, _ = _lm_run(
        poses, points, obs, cam_fixed, K, bf, axis,
        jnp.float32(1e-4), iters2, False, cg_iters,
    )
    cost = jax.lax.psum(_local_cost(poses, points, obs, K, bf, False), axis)
    return poses, points, obs.valid, cost


def make_sharded_bundle_adjust(
    mesh: Mesh, axis: str = "obs", iters1: int = 5, iters2: int = 10,
    cg_iters: int = 24,
):
    """Jitted multi-device full-LM bundle adjustment over `mesh`.

    fn(poses, points, obs, cam_fixed, K, bf) -> (poses, points, valid, cost).
    Observation arrays must have leading dim divisible by the mesh size (pad
    with valid=False slots)."""
    obs_spec = ba.Obs(
        cam_idx=P(axis), pt_idx=P(axis), target=P(axis),
        inv_sigma2=P(axis), is_stereo=P(axis), valid=P(axis),
    )
    fn = shard_map(
        partial(
            sharded_bundle_adjust_body,
            axis=axis, iters1=iters1, iters2=iters2, cg_iters=cg_iters,
        ),
        mesh=mesh,
        in_specs=(P(), P(), obs_spec, P(), P(), P()),
        out_specs=(P(), P(), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(fn)


_CHUNK_CACHE: dict = {}


def get_sharded_lm_chunk(
    mesh: Mesh, axis: str = "obs", iters: int = 3, robust: bool = True,
    cg_iters: int = 24,
):
    """Cached jitted LM *chunk* over `mesh`: `iters` iterations from a
    threaded damping value, so an abortable caller (the GBA runner's
    mbStopGBA analog) can split a long solve into chunks without restarting
    the damping schedule.

    fn(poses, points, obs, cam_fixed, K, bf, lam0)
      -> (poses, points, lam, converged)."""
    key = (id(mesh), tuple(mesh.devices.flat), axis, iters, robust, cg_iters)
    fn = _CHUNK_CACHE.get(key)
    if fn is not None:
        return fn
    obs_spec = ba.Obs(
        cam_idx=P(axis), pt_idx=P(axis), target=P(axis),
        inv_sigma2=P(axis), is_stereo=P(axis), valid=P(axis),
    )

    def body(poses, points, obs, cam_fixed, K, bf, lam0):
        return _lm_run(
            poses, points, obs, cam_fixed, K, bf, axis, lam0, iters, robust,
            cg_iters,
        )

    fn = jax.jit(
        shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), obs_spec, P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )
    _CHUNK_CACHE[key] = fn
    return fn


def make_sharded_ba_step(mesh: Mesh, axis: str = "obs", **kw):
    """Build a jitted multi-device BA step over `mesh` (1-D over `axis`).

    Observation arrays must have leading dim divisible by mesh size.
    """
    obs_spec = ba.Obs(
        cam_idx=P(axis), pt_idx=P(axis), target=P(axis),
        inv_sigma2=P(axis), is_stereo=P(axis), valid=P(axis),
    )

    fn = shard_map(
        partial(distributed_ba_step, axis=axis, **kw),
        mesh=mesh,
        in_specs=(P(), P(), obs_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
