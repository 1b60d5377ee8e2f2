"""Sim(3) pose-graph optimization (the essential graph).

Replaces `Optimizer::OptimizeEssentialGraph` (reference src/Optimizer.cc:
783-1049, g2o `EdgeSim3` LM with lambda_init=1e-16): batched GN/LM over all
keyframe Sim3s with a fixed-capacity edge list (spanning chain + strong
covisibility + loop edges). Per-edge 7-dof Jacobians come from `jax.jacfwd`
of the closed-form residual (no hand-coded Sim3 adjoints to get wrong);
the normal equations are assembled by scatter-add and solved densely —
7*K_max parameters is tiny for the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


class PoseGraphEdges(NamedTuple):
    i: jax.Array  # (E,) i32
    j: jax.Array  # (E,) i32
    S_ji: jax.Array  # (E,4,4) measured relative Sim3: maps i-coords -> j-coords
    weight: jax.Array  # (E,) f32
    valid: jax.Array  # (E,) bool


def relative_sim3(S_i: jax.Array, S_j: jax.Array) -> jax.Array:
    """Measurement S_ji = S_j * S_i^{-1} (world->i, world->j poses)."""
    return S_j @ lie.sim3_inverse(S_i)


def _edge_residual(xi_i, xi_j, S_i0, S_j0, S_ji):
    """Residual of one edge under left-multiplied tangent updates."""
    S_i = lie.sim3_exp(xi_i) @ S_i0
    S_j = lie.sim3_exp(xi_j) @ S_j0
    return lie.sim3_log(S_ji @ S_i @ lie.sim3_inverse(S_j))


@partial(jax.jit, static_argnames=("iters",), donate_argnames=())
def optimize_pose_graph(
    sim3_poses: jax.Array,  # (K,4,4) world->kf Sim3 (SE3 embedded for s=1)
    fixed: jax.Array,  # (K,) bool — the loop keyframe is held fixed
    edges: PoseGraphEdges,
    iters: int = 20,
):
    """LM over the pose graph; returns corrected (K,4,4) Sim3 poses."""
    Kn = sim3_poses.shape[0]
    zero = jnp.zeros(7)

    jac_fn = jax.vmap(
        jax.jacfwd(_edge_residual, argnums=(0, 1)), in_axes=(None, None, 0, 0, 0)
    )
    res_fn = jax.vmap(_edge_residual, in_axes=(None, None, 0, 0, 0))

    def total_cost(poses):
        r = res_fn(zero, zero, poses[edges.i], poses[edges.j], edges.S_ji)
        return jnp.sum(jnp.sum(r * r, -1) * edges.weight * edges.valid)

    def lm_iter(it, carry):
        poses, lam = carry
        Si = poses[edges.i]
        Sj = poses[edges.j]
        r = res_fn(zero, zero, Si, Sj, edges.S_ji)  # (E,7)
        Ji, Jj = jac_fn(zero, zero, Si, Sj, edges.S_ji)  # (E,7,7) each
        w = (edges.weight * edges.valid)[:, None, None]

        # Assemble H (K,7,K,7) sparse -> dense via scatter-add of the four
        # blocks per edge, and gradient g (K,7).
        H = jnp.zeros((Kn, Kn, 7, 7))
        H = H.at[edges.i, edges.i].add(jnp.einsum("eab,eac->ebc", Ji, Ji * w))
        H = H.at[edges.j, edges.j].add(jnp.einsum("eab,eac->ebc", Jj, Jj * w))
        H = H.at[edges.i, edges.j].add(jnp.einsum("eab,eac->ebc", Ji, Jj * w))
        H = H.at[edges.j, edges.i].add(jnp.einsum("eab,eac->ebc", Jj, Ji * w))
        g = jnp.zeros((Kn, 7))
        g = g.at[edges.i].add(jnp.einsum("eab,ea->eb", Ji * w, r))
        g = g.at[edges.j].add(jnp.einsum("eab,ea->eb", Jj * w, r))

        # Fix gauge: zero rows/cols of fixed keyframes, identity diagonal.
        free = (~fixed).astype(jnp.float32)
        Hd = H * free[:, None, None, None] * free[None, :, None, None]
        Hm = Hd.transpose(0, 2, 1, 3).reshape(Kn * 7, Kn * 7)
        diag = jnp.diagonal(Hm)
        Hm = Hm + jnp.diag(lam * diag + 1e-6)
        gv = (g * free[:, None]).reshape(-1)

        dx = -jnp.linalg.solve(Hm, gv).reshape(Kn, 7)
        dx = dx * free[:, None]
        cand = lie.sim3_exp(dx) @ poses
        accept = total_cost(cand) < total_cost(poses)
        poses = jnp.where(accept, cand, poses)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (poses, lam)

    poses, _ = jax.lax.fori_loop(0, iters, lm_iter, (sim3_poses, jnp.float32(1e-6)))
    return poses


def build_edges_from_map(state, loop_i, loop_j, S_loop_ji, covis_threshold: int = 100,
                         max_edges: int = 2048):
    """Edge list for the essential graph: TRUE spanning tree (kf_parent) +
    strong covisibility + ALL persistent past loop edges + the new measured
    loop edge (reference src/Optimizer.cc:805-954). Measurements come from
    current poses except the new loop edge, which carries the Sim3-solver
    estimate."""
    from ..models.map_state import covisibility

    Kn = state.kf_pose.shape[0]
    C = covisibility(state)
    kf_valid = state.kf_valid

    ii, jj = jnp.meshgrid(jnp.arange(Kn), jnp.arange(Kn), indexing="ij")
    upper = ii < jj
    # Spanning-tree edges (KeyFrame::GetParent): child -> parent, symmetrized
    # into the upper triangle.
    par = state.kf_parent
    has_par = kf_valid & (par >= 0)
    tree = jnp.zeros((Kn, Kn), bool)
    child_iota = jnp.arange(Kn)
    pc = jnp.minimum(child_iota, jnp.maximum(par, 0))
    qc = jnp.maximum(child_iota, jnp.maximum(par, 0))
    tree = tree.at[jnp.where(has_par, pc, Kn), jnp.where(has_par, qc, Kn)].set(
        True, mode="drop"
    )
    # Past loop edges (persistent, mspLoopEdges analog).
    le = state.loop_edges
    le_ok = (le[:, 0] >= 0) & (le[:, 1] >= 0)
    lp = jnp.minimum(le[:, 0], le[:, 1])
    lq = jnp.maximum(le[:, 0], le[:, 1])
    tree = tree.at[jnp.where(le_ok, lp, Kn), jnp.where(le_ok, lq, Kn)].set(
        True, mode="drop"
    )
    strong = (C >= covis_threshold) & upper
    mask = (tree | strong) & upper & kf_valid[ii] & kf_valid[jj]

    flat = mask.reshape(-1)
    # Small maps (tests, toy servers) can have fewer than max_edges slots.
    max_edges = min(max_edges, Kn * Kn + 1)
    _, sel = jax.lax.top_k(flat.astype(jnp.int32), max_edges - 1)
    valid = flat[sel]
    ei = (sel // Kn).astype(jnp.int32)
    ej = (sel % Kn).astype(jnp.int32)

    S = state.kf_pose  # SE3 poses embed into Sim3 with s=1
    S_ji = jax.vmap(relative_sim3)(S[ei], S[ej])

    # Append the loop edge with its measured relative Sim3.
    ei = jnp.concatenate([ei, jnp.asarray([loop_i], jnp.int32)])
    ej = jnp.concatenate([ej, jnp.asarray([loop_j], jnp.int32)])
    S_ji = jnp.concatenate([S_ji, S_loop_ji[None]])
    valid = jnp.concatenate([valid, jnp.asarray([True])])
    weight = jnp.ones(ei.shape[0])
    return PoseGraphEdges(i=ei, j=ej, S_ji=S_ji, weight=weight, valid=valid)
