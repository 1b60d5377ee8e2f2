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
