"""Loop detection, Sim3 computation, loop correction, global BA.

TPU-native replacement for the reference `LoopClosing` thread
(src/LoopClosing.cc): `DetectLoop` (:113-239) via the BoW database +
host-side 3-consecutive consistency, `ComputeSim3` (:241-410) via descriptor
matching + batched Horn RANSAC, `CorrectLoop` (:412-594) via Sim3 propagation
+ fusion + essential-graph optimization, and `RunGlobalBundleAdjustment`
(:654-758) via a whole-map BA. Runs as host-scheduled device programs after
keyframe insertion (the reference's thread becomes a pipeline stage).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ba, hamming, lie, matching, pose_graph, sim3solver
from .map_state import MapState, covisibility
from .tracking import INV_LEVEL_SIGMA2, N_LEVELS, SCALE

MIN_SIM3_MATCHES = 20  # reference accepts >=20 optimized inliers (src/LoopClosing.cc:339)
MIN_TOTAL_MATCHES = 40  # + >=40 after guided projection (src/LoopClosing.cc:395)


class LoopConsistency:
    """Host-side 3-consecutive-group consistency check
    (DetectLoop, src/LoopClosing.cc:170-235)."""

    def __init__(self, required: int = 3):
        self.required = required
        self.prev_groups: list[tuple[set, int]] = []

    def update(self, cand_groups: list[set]) -> list[int]:
        """cand_groups: covisibility group (set of kf ids) per candidate.
        Returns candidate indices that reached the consistency threshold."""
        new_prev = []
        enough = []
        for gi, group in enumerate(cand_groups):
            consistent = 0
            for pg, count in self.prev_groups:
                if group & pg:
                    consistent = max(consistent, count + 1)
            new_prev.append((group, consistent))
            if consistent + 1 >= self.required:
                enough.append(gi)
        self.prev_groups = new_prev
        return enough


@partial(jax.jit, static_argnames=())
def match_keyframes(state: MapState, kf1: jax.Array, kf2: jax.Array, voc=None):
    """Descriptor matching between two keyframes' map-point keypoints
    (SearchByBoW KF-KF, src/ORBmatcher.cc:522-655: TH_LOW, ratio 0.75,
    rotation consistency; with a vocabulary, candidates are pruned to pairs
    sharing a coarse tree node — the FeatureVector alignment)."""
    from ..ops import vocab as vocab_ops

    N = state.kf_xy.shape[1]
    d1 = hamming.unpack_pm1(state.kf_desc[kf1])
    d2 = hamming.unpack_pm1(state.kf_desc[kf2])
    v1 = state.kf_kp_valid[kf1] & (state.kf_mp[kf1] >= 0)
    v2 = state.kf_kp_valid[kf2] & (state.kf_mp[kf2] >= 0)
    mask = v1[:, None] & v2[None, :]
    if voc is not None:
        n1 = vocab_ops.assign_nodes(voc, d1)
        n2 = vocab_ops.assign_nodes(voc, d2)
        mask = mask & (n1[:, None] == n2[None, :])
    m = matching.match_nn(d1, d2, mask,
                          max_dist=matching.TH_LOW, nn_ratio=0.75)
    dang = state.kf_angle[kf1] - state.kf_angle[kf2][m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    m = matching.resolve_duplicates(m.idx, m.dist, ok, N)
    return m


@partial(jax.jit, static_argnames=("fix_scale",))
def compute_sim3(
    state: MapState, kf_cur: jax.Array, kf_cand: jax.Array, K: jax.Array,
    key: jax.Array, fix_scale: bool = True, voc=None,
):
    """ComputeSim3 for one candidate (src/LoopClosing.cc:241-410): match map
    points (BoW-node aligned), Horn RANSAC, widen with mutual SearchBySim3
    matches (src/ORBmatcher.cc:1104-1328), refine with OptimizeSim3 (>=20
    inliers, src/LoopClosing.cc:333-339), then a guided wider search for
    total support (>=40, :385-395)."""
    m = match_keyframes(state, kf_cur, kf_cand, voc)
    N = state.kf_xy.shape[1]

    pose_c = state.kf_pose[kf_cur]
    pose_l = state.kf_pose[kf_cand]
    has_c = (state.kf_mp[kf_cur] >= 0) & state.kf_kp_valid[kf_cur]
    has_l_row = (state.kf_mp[kf_cand] >= 0) & state.kf_kp_valid[kf_cand]
    mp_c = jnp.maximum(state.kf_mp[kf_cur], 0)
    mp_l = jnp.maximum(state.kf_mp[kf_cand][m.idx], 0)
    # 3-D positions in each camera frame.
    p1_all = (state.mp_pos[mp_c] @ pose_c[:3, :3].T) + pose_c[:3, 3]
    p2_row = (
        state.mp_pos[jnp.maximum(state.kf_mp[kf_cand], 0)] @ pose_l[:3, :3].T
    ) + pose_l[:3, 3]  # (N,) candidate-slot-major
    p1 = p1_all
    p2 = p2_row[m.idx]
    uv1 = state.kf_xy[kf_cur]
    uv2 = state.kf_xy[kf_cand][m.idx]
    s2_1 = SCALE ** (2 * state.kf_level[kf_cur].astype(jnp.float32))
    s2_2_row = SCALE ** (2 * state.kf_level[kf_cand].astype(jnp.float32))
    s2_2 = s2_2_row[m.idx]

    res = sim3solver.sim3_ransac(
        p1, p2, uv1, uv2, s2_1, s2_2, m.ok, K, key, fix_scale=fix_scale
    )

    # --- SearchBySim3 (src/ORBmatcher.cc:1104-1328): widen the match set
    # with pairs that agree MUTUALLY under the RANSAC S12 ---
    S12_r = res.S12
    S21_r = lie.sim3_inverse(S12_r)
    d_cur = hamming.unpack_pm1(state.kf_desc[kf_cur])
    d_cand = hamming.unpack_pm1(state.kf_desc[kf_cand])

    def proj2(p, S):
        pc = (p @ S[:3, :3].T) + S[:3, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        return (
            jnp.stack([K[0] * pc[:, 0] / z + K[2], K[1] * pc[:, 1] / z + K[3]], -1),
            pc[:, 2] > 0,
        )

    # A: candidate's points into the current image.
    uvA, frontA = proj2(p2_row, S12_r)
    mA = matching.match_projection(
        q_desc=d_cand, q_xy_pred=uvA,
        q_level_pred=state.kf_level[kf_cand],
        q_valid=has_l_row & frontA,
        t_desc=d_cur, t_xy=state.kf_xy[kf_cur],
        t_level=state.kf_level[kf_cur], t_valid=state.kf_kp_valid[kf_cur],
        radius=7.5 * SCALE ** state.kf_level[kf_cand].astype(jnp.float32),
        max_dist=matching.TH_HIGH, nn_ratio=1.0,
    )
    # B: current's points into the candidate image.
    uvB, frontB = proj2(p1_all, S21_r)
    mB = matching.match_projection(
        q_desc=d_cur, q_xy_pred=uvB,
        q_level_pred=state.kf_level[kf_cur],
        q_valid=has_c & frontB,
        t_desc=d_cand, t_xy=state.kf_xy[kf_cand],
        t_level=state.kf_level[kf_cand], t_valid=state.kf_kp_valid[kf_cand],
        radius=7.5 * SCALE ** state.kf_level[kf_cur].astype(jnp.float32),
        max_dist=matching.TH_HIGH, nn_ratio=1.0,
    )
    # Mutual agreement (the reference's bInKF1 && bInKF2 check).
    iota = jnp.arange(N)
    mutual = mB.ok & mA.ok[mB.idx] & (mA.idx[mB.idx] == iota)
    m2_idx = jnp.where(m.ok, m.idx, mB.idx)
    m2_ok = m.ok | (mutual & has_l_row[mB.idx])

    # --- OptimizeSim3 over the widened match set ---
    S12_opt, inl, n_inl = sim3solver.optimize_sim3(
        p1_all, p2_row[m2_idx], uv1, state.kf_xy[kf_cand][m2_idx],
        1.0 / s2_1, 1.0 / s2_2_row[m2_idx], m2_ok, S12_r, K,
        fix_scale=fix_scale,
    )

    # Guided wider support: project the candidate's map points into the
    # current KF through the OPTIMIZED S12 and count descriptor agreements
    # (SearchByProjection Sim3 overload, src/ORBmatcher.cc:290-403).
    S12 = S12_opt
    mp_l_all = state.kf_mp[kf_cand]
    has_l = (mp_l_all >= 0) & state.kf_kp_valid[kf_cand]
    p_l_cam = (state.mp_pos[jnp.maximum(mp_l_all, 0)] @ pose_l[:3, :3].T) + pose_l[:3, 3]
    p_in_cur = (p_l_cam @ S12[:3, :3].T) + S12[:3, 3]
    z = jnp.maximum(p_in_cur[:, 2], 1e-6)
    uv_pred = jnp.stack(
        [K[0] * p_in_cur[:, 0] / z + K[2], K[1] * p_in_cur[:, 1] / z + K[3]], -1
    )
    mm = matching.match_projection(
        q_desc=hamming.unpack_pm1(state.kf_desc[kf_cand]),
        q_xy_pred=uv_pred,
        q_level_pred=state.kf_level[kf_cand],
        q_valid=has_l & (p_in_cur[:, 2] > 0),
        t_desc=hamming.unpack_pm1(state.kf_desc[kf_cur]),
        t_xy=state.kf_xy[kf_cur],
        t_level=state.kf_level[kf_cur],
        t_valid=state.kf_kp_valid[kf_cur],
        radius=7.5 * SCALE ** state.kf_level[kf_cand].astype(jnp.float32),
        max_dist=matching.TH_HIGH,
        nn_ratio=1.0,
        level_lo=-1,
        level_hi=1,
    )
    n_total = jnp.sum(mm.ok.astype(jnp.int32))
    # Acceptance follows the reference cascade: the RANSAC must converge,
    # the LM-refined Sim3 must keep >=20 inliers (src/LoopClosing.cc:339),
    # and the guided projection must reach >=40 total (:395).
    success = res.success & (n_inl >= MIN_SIM3_MATCHES) & (
        n_total >= MIN_TOTAL_MATCHES
    )
    return success, S12, n_inl, n_total


def _oldest_observer(state: MapState):
    """(M,) slot id of each map point's OLDEST live observer.

    The reference keyframe is DERIVED rather than stored: slot ids are
    reused after culling, so a stored mp_first_kf slot may now hold an
    unrelated keyframe. Per-point min over observers of (kf_seq * K + slot)
    decodes to the oldest observer's slot id; points with no live observer
    map to slot 0 (their correction is then an exact no-op only if slot 0
    didn't move — they are invalid anyway)."""
    Kn = state.kf_pose.shape[0]
    M = state.mp_pos.shape[0]
    flat_mp = jnp.where(
        state.kf_kp_valid & (state.kf_mp >= 0) & state.kf_valid[:, None],
        state.kf_mp,
        M,
    )
    comb = (
        state.kf_seq[:, None].astype(jnp.int32) * Kn
        + jnp.arange(Kn, dtype=jnp.int32)[:, None]
    )
    comb = jnp.broadcast_to(comb, flat_mp.shape)
    big = jnp.int32(2**31 - 1)
    ref_comb = (
        jnp.full(M + 1, big, jnp.int32)
        .at[flat_mp.reshape(-1)]
        .min(comb.reshape(-1))[:M]
    )
    return jnp.where(ref_comb < big, ref_comb % Kn, 0)


@partial(jax.jit, donate_argnames=("state",))
def correct_loop(
    state: MapState,
    kf_cur: jax.Array,
    kf_loop: jax.Array,
    S_cur_loop: jax.Array,  # (4,4) Sim3: maps loop-cam coords -> cur-cam coords
):
    """CorrectLoop (src/LoopClosing.cc:412-594): essential-graph optimization
    with the measured loop edge, then map-point correction through each
    point's reference keyframe."""
    Kn = state.kf_pose.shape[0]

    # The loop edge measurement: S_ji with i=loop, j=cur such that
    # S_cur_w(corrected) = S_cur_loop @ S_loop_w.
    edges = pose_graph.build_edges_from_map(state, kf_loop, kf_cur, S_cur_loop)
    fixed = (jnp.arange(Kn) == kf_loop) | ~state.kf_valid
    old_poses = state.kf_pose
    corrected = pose_graph.optimize_pose_graph(old_poses, fixed, edges, iters=20)

    # Split Sim3 -> SE3 (t /= s, reference src/LoopClosing.cc:510-513).
    R, t, s = lie.sim3_parts(corrected)
    se3 = lie.make_se3(R, t / s[:, None])

    # Correct map points through their reference KF: p' = T_new^-1 S_old p
    # (src/LoopClosing.cc:484-504).
    ref = _oldest_observer(state)
    T_old = old_poses[ref]
    T_new = se3[ref]
    p_cam = jnp.einsum("mij,mj->mi", T_old[:, :3, :3], state.mp_pos) + T_old[:, :3, 3]
    Rn = T_new[:, :3, :3]
    p_new = jnp.einsum("mji,mj->mi", Rn, p_cam - T_new[:, :3, 3])
    mp_pos = jnp.where(state.mp_valid[:, None], p_new, state.mp_pos)

    kf_pose = jnp.where(state.kf_valid[:, None, None], lie.orthonormalize(se3), state.kf_pose)

    # Record the loop edge persistently (KeyFrame::AddLoopEdge,
    # src/LoopClosing.cc:572-574); the ring buffer overwrites the oldest
    # once LOOP_EDGE_CAP closures accumulate.
    cap = state.loop_edges.shape[0]
    slot = state.n_loop_edges % cap
    loop_edges = state.loop_edges.at[slot].set(
        jnp.stack([kf_cur, kf_loop]).astype(jnp.int32)
    )
    return state._replace(
        kf_pose=kf_pose,
        mp_pos=mp_pos,
        loop_edges=loop_edges,
        n_loop_edges=state.n_loop_edges + 1,
    )


# Default capacities for the corrected neighborhood (mvpCurrentConnectedKFs)
# and the loop-side point set (mvpLoopMapPoints). The host sizes the actual
# call to cover the LIVE corrected group (see LoopCloser._fuse_caps) — these
# are compile-bucket floors, not silent truncation caps.
LOOP_FUSE_KFS = 16
LOOP_MP_CAP = 4096


@partial(
    jax.jit,
    donate_argnames=("state",),
    static_argnames=("fuse_kfs", "mp_cap"),
)
def search_and_fuse(
    state: MapState, kf_cur: jax.Array, kf_loop: jax.Array, K: jax.Array,
    fuse_kfs: int = LOOP_FUSE_KFS, mp_cap: int = LOOP_MP_CAP,
):
    """Loop fusion (LoopClosing::SearchAndFuse + the CorrectLoop merge pass,
    src/LoopClosing.cc:453-551,596-622): project the loop side's map points
    into the corrected keyframes (the current KF's covisible group) and
    merge duplicates — the loop point always wins (pRep->Replace, :617).

    Runs AFTER the essential-graph correction, so plain pinhole projection
    with the corrected SE3 poses is the right model. All target keyframes
    fuse in parallel against the same snapshot; the merge map is applied in
    one pass (same strategy as local_mapping.fuse_map_points).
    """
    Kn, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    from ..ops.projection import project as project_pts

    # Corrected neighborhood: the current KF + its best covisible keyframes.
    w = state.covis[kf_cur].at[kf_cur].set(1 << 20)
    w = jnp.where(state.kf_valid, w, -1)
    tgt_w, tgt_kfs = jax.lax.top_k(w, min(fuse_kfs, Kn))
    tgt_ok = tgt_w > 0

    # Loop-side points: observed by the loop KF's covisible group.
    grp = (state.covis[kf_loop] > 0) | (jnp.arange(Kn) == kf_loop)
    mp_in = jnp.where(
        (state.kf_mp >= 0) & state.kf_kp_valid & grp[:, None], state.kf_mp, M
    )
    lp_mask = jnp.zeros(M + 1, bool).at[mp_in.reshape(-1)].set(True)[:M]
    lp_mask = lp_mask & state.mp_valid
    _, lp_sel = jax.lax.top_k(lp_mask.astype(jnp.int32), min(mp_cap, M))
    lp_ok = lp_mask[lp_sel]
    lp_pos = state.mp_pos[lp_sel]
    lp_pm1 = hamming.unpack_pm1(state.mp_desc[lp_sel])

    def fuse_one(dst_kf, dst_ok):
        pose = state.kf_pose[dst_kf]
        uv = project_pts(pose, lp_pos, K)
        z = (pose[2, :3] @ lp_pos.T) + pose[2, 3]
        cam_center = -pose[:3, :3].T @ pose[:3, 3]
        dist = jnp.linalg.norm(lp_pos - cam_center, axis=-1)
        in_band = (dist >= state.mp_min_dist[lp_sel]) & (
            dist <= state.mp_max_dist[lp_sel]
        )
        ratio = state.mp_max_dist[lp_sel] / jnp.maximum(dist, 1e-9)
        pred_level = jnp.clip(
            jnp.ceil(
                jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(SCALE)
            ).astype(jnp.int32),
            0,
            N_LEVELS - 1,
        )
        # Skip points the target already observes.
        dst_row = state.kf_mp[dst_kf]
        dst_has = jnp.zeros(M + 1, bool).at[
            jnp.where(dst_row >= 0, dst_row, M)
        ].set(True)
        q_ok = (
            lp_ok
            & dst_ok
            & (z > 0)
            & in_band
            & ~dst_has[jnp.maximum(lp_sel, 0)]
        )
        mm = matching.match_projection(
            q_desc=lp_pm1,
            q_xy_pred=uv,
            q_level_pred=pred_level,
            q_valid=q_ok,
            t_desc=hamming.unpack_pm1(state.kf_desc[dst_kf]),
            t_xy=state.kf_xy[dst_kf],
            t_level=state.kf_level[dst_kf],
            t_valid=state.kf_kp_valid[dst_kf],
            radius=4.0 * SCALE ** pred_level.astype(jnp.float32),
            max_dist=matching.TH_LOW,
            nn_ratio=1.0,
        )
        return mm.ok, mm.idx

    okT, idxT = jax.vmap(fuse_one)(tgt_kfs, tgt_ok)  # (T, P) each

    # Apply: where the target slot holds a point -> merge (loop point wins);
    # where empty -> adopt the loop point.
    rows = state.kf_mp[tgt_kfs]  # (T, N)
    exist = jax.vmap(lambda row, idx: row[idx])(rows, idxT)  # (T, P)
    lp_ids = jnp.broadcast_to(lp_sel[None, :], okT.shape)
    add = okT & (exist < 0)
    merge = okT & (exist >= 0) & (exist != lp_ids)
    rows = jax.vmap(
        lambda row, sel, idx, val: row.at[jnp.where(sel, idx, N)].set(
            jnp.where(sel, val, -1), mode="drop"
        )
    )(rows, add, idxT, lp_ids)
    kf_mp = state.kf_mp.at[tgt_kfs].set(rows)

    # Merge map: the existing (duplicated) landmark is replaced by the loop
    # landmark everywhere.
    loser = jnp.where(merge, exist, -1).reshape(-1)
    winner = jnp.where(merge, lp_ids, -1).reshape(-1)
    rep = jnp.arange(M + 1, dtype=jnp.int32)
    rep = rep.at[jnp.where(loser >= 0, loser, M)].set(
        jnp.where(loser >= 0, winner, -1), mode="drop"
    )[:M]
    kf_mp = jnp.where(kf_mp >= 0, rep[jnp.maximum(kf_mp, 0)], kf_mp)
    mp_valid = state.mp_valid & (rep == jnp.arange(M))
    n_fused = jnp.sum(merge.astype(jnp.int32)) + jnp.sum(add.astype(jnp.int32))
    return state._replace(kf_mp=kf_mp, mp_valid=mp_valid), n_fused


def build_global_ba_problem(state: MapState, K: jax.Array, bf: jax.Array) -> ba.BAProblem:
    """Whole-map BA problem (GlobalBundleAdjustemnt, src/Optimizer.cc:41-48):
    covers EVERY live keyframe, point and observation — sized by the map
    capacity itself (no silent truncation). Camera slots map 1:1; gauge
    anchor = oldest live keyframe by insertion sequence."""
    Kmax, N = state.kf_mp.shape
    cam_used = state.kf_valid
    seq_key = jnp.where(cam_used, state.kf_seq, jnp.int32(2**30))
    anchor = jnp.argmin(seq_key)
    cam_fixed = (jnp.arange(Kmax) == anchor) | ~cam_used

    flat_ok = (
        cam_used[:, None]
        & state.kf_kp_valid
        & (state.kf_mp >= 0)
        & state.mp_valid[jnp.maximum(state.kf_mp, 0)]
    )
    kf_iota = jax.lax.broadcasted_iota(jnp.int32, (Kmax, N), 0)
    obs = ba.Obs(
        cam_idx=kf_iota.reshape(-1),
        pt_idx=jnp.maximum(state.kf_mp, 0).reshape(-1),
        target=jnp.concatenate(
            [state.kf_xy, state.kf_ur[..., None]], -1
        ).reshape(-1, 3),
        inv_sigma2=INV_LEVEL_SIGMA2[
            jnp.clip(state.kf_level, 0, N_LEVELS - 1)
        ].reshape(-1),
        is_stereo=(state.kf_ur >= 0).reshape(-1),
        valid=flat_ok.reshape(-1),
    )
    return ba.BAProblem(
        poses=state.kf_pose, points=state.mp_pos, obs=obs,
        cam_fixed=cam_fixed, K=K, bf=bf,
    )


def apply_global_ba_result(state: MapState, poses, points, cam_fixed):
    """Write optimized poses/points back into the live slots."""
    kf_pose = jnp.where(
        (state.kf_valid & ~cam_fixed)[:, None, None], poses, state.kf_pose
    )
    mp_pos = jnp.where(state.mp_valid[:, None], points, state.mp_pos)
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos)


@partial(jax.jit, donate_argnames=("state",))
def global_bundle_adjustment(state: MapState, K: jax.Array, bf: jax.Array):
    """Single-device whole-map BA: 5 robust + 10 plain LM iterations with a
    chi2 cull between (ba.bundle_adjust schedule). Invalid slots ride along
    as zero-weight observations, which costs FLOPs the MXU has to spare."""
    prob = build_global_ba_problem(state, K, bf)
    prob2, cost = ba.bundle_adjust(prob, cg_iters=32)
    return apply_global_ba_result(state, prob2.poses, prob2.points, prob.cam_fixed), cost


@partial(jax.jit, static_argnames=("kb",))
def build_global_ba_problem_compact(state: MapState, K: jax.Array, bf: jax.Array,
                                    kb: int):
    """GBA problem over the LIVE keyframes compacted into `kb` camera slots
    (bucketed by the caller): the observation list shrinks from Kmax*N to
    kb*N, so the solve is sized by the MAP, not its capacity — measured to
    halve the per-chunk GBA cost on half-full maps. Returns
    (prob, cam_slots (kb,), cam_used (kb,))."""
    Kmax, N = state.kf_mp.shape
    _, cam_slots = jax.lax.top_k(state.kf_valid.astype(jnp.int8), kb)
    cam_used = state.kf_valid[cam_slots]
    seq_key = jnp.where(cam_used, state.kf_seq[cam_slots], jnp.int32(2**30))
    anchor = jnp.argmin(seq_key)
    cam_fixed = (jnp.arange(kb) == anchor) | ~cam_used

    kf_mp = state.kf_mp[cam_slots]
    flat_ok = (
        cam_used[:, None]
        & state.kf_kp_valid[cam_slots]
        & (kf_mp >= 0)
        & state.mp_valid[jnp.maximum(kf_mp, 0)]
    )
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, (kb, N), 0)
    obs = ba.Obs(
        cam_idx=cam_iota.reshape(-1),
        pt_idx=jnp.maximum(kf_mp, 0).reshape(-1),
        target=jnp.concatenate(
            [state.kf_xy[cam_slots], state.kf_ur[cam_slots][..., None]], -1
        ).reshape(-1, 3),
        inv_sigma2=INV_LEVEL_SIGMA2[
            jnp.clip(state.kf_level[cam_slots], 0, N_LEVELS - 1)
        ].reshape(-1),
        is_stereo=(state.kf_ur[cam_slots] >= 0).reshape(-1),
        valid=flat_ok.reshape(-1),
    )
    prob = ba.BAProblem(
        poses=state.kf_pose[cam_slots], points=state.mp_pos, obs=obs,
        cam_fixed=cam_fixed, K=K, bf=bf,
    )
    return prob, cam_slots, cam_used


@jax.jit
def expand_gba_result(snap_poses, opt_poses, cam_fixed, cam_slots, cam_used):
    """Scatter compact GBA camera results back to full keyframe slots;
    returns (poses (K,4,4), cam_fixed_full (K,)) in the layout
    merge_gba_into_live / apply_global_ba_result expect."""
    Kmax = snap_poses.shape[0]
    write = cam_used & ~cam_fixed
    full = snap_poses.at[jnp.where(write, cam_slots, Kmax)].set(
        opt_poses, mode="drop"
    )
    fixed_full = (
        jnp.ones(Kmax, bool)
        .at[jnp.where(write, cam_slots, Kmax)]
        .set(False, mode="drop")
    )
    return full, fixed_full


_DIST_GBA_CACHE: dict = {}
_build_gba_jit = jax.jit(build_global_ba_problem)
_apply_gba_jit = jax.jit(apply_global_ba_result, donate_argnames=("state",))


def global_bundle_adjustment_dist(state: MapState, K, bf, mesh):
    """Whole-map BA routed through the psum-sharded LM engine
    (parallel/dist_ba.py): observations sharded over `mesh`, reduced camera
    system all-reduced per CG step. Same LM schedule as the single-device
    path. Kmax*N observations are always divisible by a power-of-two mesh."""
    from ..parallel import dist_ba

    key = (id(mesh), tuple(mesh.devices.flat))
    solve = _DIST_GBA_CACHE.get(key)
    if solve is None:
        solve = dist_ba.make_sharded_bundle_adjust(mesh, iters1=5, iters2=10, cg_iters=32)
        _DIST_GBA_CACHE[key] = solve
    prob = _build_gba_jit(state, K, bf)
    poses, points, _, cost = solve(
        prob.poses, prob.points, prob.obs, prob.cam_fixed, K, bf
    )
    return _apply_gba_jit(state, poses, points, prob.cam_fixed), cost


def run_global_bundle_adjustment(state: MapState, K, bf, mesh=None):
    """Routing: multi-device meshes get the sharded solve, single-device the
    fused one. `mesh=None` auto-builds a mesh over all local devices when
    more than one is visible (the SURVEY §2.3 ICI-collectives mapping)."""
    if mesh is None and jax.device_count() > 1:
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        mesh = _Mesh(_np.array(jax.devices()), ("obs",))
    if mesh is not None and mesh.size > 1:
        return global_bundle_adjustment_dist(state, K, bf, mesh)
    return global_bundle_adjustment(state, K, bf)


@partial(jax.jit, donate_argnames=("live",))
def merge_gba_into_live(
    live: MapState,
    snap_kf_seq: jax.Array,  # (K,) snapshot kf_seq at solve start
    snap_kf_valid: jax.Array,  # (K,)
    snap_mp_first_seq: jax.Array,  # (M,)
    snap_mp_valid: jax.Array,  # (M,)
    opt_poses: jax.Array,  # (K,4,4) optimized
    opt_points: jax.Array,  # (M,3) optimized
    cam_fixed: jax.Array,  # (K,) the solve's fixed mask (anchor + unused)
):
    """Fold a detached GBA result into the LIVE map — the reference's
    RunGlobalBundleAdjustment merge with `mTcwGBA`/`mPosGBA` staging
    (src/LoopClosing.cc:674-758): keyframes that existed at the snapshot take
    their optimized poses; keyframes born during the solve are corrected by
    propagating their parent's correction down the spanning tree; map points
    born during the solve move with their oldest live observer.

    Slot reuse is handled by identity checks on kf_seq / mp_first_seq: a
    slot whose sequence number changed holds a DIFFERENT keyframe/point than
    the one the solver saw."""
    par = jnp.maximum(live.kf_parent, 0)
    same_kf = live.kf_valid & snap_kf_valid & (live.kf_seq == snap_kf_seq)
    old_poses = live.kf_pose
    new_poses = jnp.where((same_kf & ~cam_fixed)[:, None, None], opt_poses, old_poses)
    updated = same_kf

    # T_child_new = (T_child_old @ T_parent_old^-1) @ T_parent_new, swept
    # down the tree until no child with an updated parent remains (tree
    # depth-bounded; kf_seq ordering guarantees acyclicity).
    T_rel = old_poses @ jax.vmap(lie.se3_inverse)(old_poses[par])

    def todo_of(updated):
        return live.kf_valid & ~updated & (live.kf_parent >= 0) & updated[par]

    def cond(carry):
        _, updated = carry
        return jnp.any(todo_of(updated))

    def body(carry):
        new_poses, updated = carry
        todo = todo_of(updated)
        cand = jnp.einsum("kij,kjl->kil", T_rel, new_poses[par])
        new_poses = jnp.where(todo[:, None, None], cand, new_poses)
        return new_poses, updated | todo

    new_poses, updated = jax.lax.while_loop(cond, body, (new_poses, updated))

    # Points: same-identity slots take the optimized positions; points born
    # during the solve ride their oldest live observer's correction.
    same_mp = live.mp_valid & snap_mp_valid & (live.mp_first_seq == snap_mp_first_seq)
    mp_pos = jnp.where(same_mp[:, None], opt_points, live.mp_pos)
    ref = _oldest_observer(live)
    T_old = old_poses[ref]
    T_new = new_poses[ref]
    p_cam = jnp.einsum("mij,mj->mi", T_old[:, :3, :3], live.mp_pos) + T_old[:, :3, 3]
    Rn = T_new[:, :3, :3]
    p_corr = jnp.einsum("mji,mj->mi", Rn, p_cam - T_new[:, :3, 3])
    born = live.mp_valid & ~same_mp
    mp_pos = jnp.where(born[:, None], p_corr, mp_pos)
    return live._replace(kf_pose=new_poses, mp_pos=mp_pos)


class GlobalBARunner:
    """Detached, abortable global BA — the reference's per-loop GBA thread
    (`new thread(&LoopClosing::RunGlobalBundleAdjustment, ...)`,
    src/LoopClosing.cc:588) with `mbStopGBA` checked between LM chunks
    (src/Optimizer.cc:118-124 checks its stop flag every iteration).

    The solve runs on a SNAPSHOT of the map outside any structural lock —
    keyframe insertion proceeds concurrently — in chunks of `chunk_iters` LM
    iterations via `ba.ba_step_count_lam`'s threaded damping. `result` holds
    (snapshot identity arrays, optimized poses/points, cam_fixed) when the
    solve finishes un-aborted; the owner folds it in with
    `merge_gba_into_live` under the structural lock."""

    def __init__(self, K, bf, chunk_iters: int = 3, cg_iters: int = 32, mesh=None,
                 dense_max_cams: int = 128):
        import threading

        from ..runtime.native import NativeFlag

        self.K = K
        self.bf = bf
        self.chunk_iters = chunk_iters
        self.cg_iters = cg_iters
        self.dense_max_cams = dense_max_cams
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.stop_flag = NativeFlag()  # mbStopGBA
        self._thread: threading.Thread | None = None
        self.result = None
        self.aborted = False
        self.n_runs = 0
        self.n_aborted = 0
        # Rolling wall-clock of recent solves (ms) — surfaced by
        # SlamSystem.stats() as the GBA stage metric.
        from collections import deque

        self.solve_ms = deque(maxlen=8)

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def start(self, snapshot: MapState):
        import threading

        assert not self.running, "GBA already in flight"
        self.stop_flag.clear()
        self.result = None
        self.aborted = False
        # Deep-copy NOW, on the caller's thread: the caller's buffers may be
        # donated into its next device program while this solve still reads
        # them (donation deletes the source buffer).
        self._snapshot = jax.tree.map(jnp.copy, snapshot)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def abort(self):
        """Request cooperative cancellation (CorrectLoop's mbStopGBA=true,
        src/LoopClosing.cc:424-434)."""
        self.stop_flag.set(1)

    def join(self):
        if self._thread is not None:
            self._thread.join()

    # -- worker body (device work releases the GIL) -------------------------
    def _chunks(self, prob, total: int, robust: bool):
        lam = jnp.float32(1e-4)
        done = 0
        while done < total:
            # Always a full chunk (may overshoot `total` by <chunk_iters):
            # keeps ONE compiled program per (robust, bucket) — a partial
            # tail chunk would compile a second size for no benefit, and an
            # extra LM iteration near convergence is free accuracy.
            it = self.chunk_iters
            if self.mesh is not None:
                from ..parallel import dist_ba

                chunk = dist_ba.get_sharded_lm_chunk(
                    self.mesh, iters=it, robust=robust, cg_iters=self.cg_iters
                )
                poses, points, lam, conv = chunk(
                    prob.poses, prob.points, prob.obs, prob.cam_fixed,
                    prob.K, prob.bf, lam,
                )
                prob = prob._replace(poses=poses, points=points)
            else:
                # Explicit dense reduced-camera solve below the crossover:
                # the CG chunk spends 32 sequential matvecs per LM iteration
                # on a <=6*dense_max_cams-unknown system; the dense path is
                # one MXU matmul + Cholesky. Measured on the real chip:
                # 1.2x (C=16) to 1.73x (C=128) faster per chunk at the
                # production GBA buckets — the rest of the chunk is the
                # residual/Jacobian build over O observations, which both
                # paths share (tools/bench_gba_dense.py, PERF.md gap 3).
                dense = prob.poses.shape[0] <= self.dense_max_cams
                prob, _, lam, conv = ba.ba_step_count_lam(
                    prob, lam, iters=it, cg_iters=self.cg_iters, robust=robust,
                    dense=dense,
                )
            jax.block_until_ready(prob.poses)
            done += it
            if self.stop_flag:
                return prob, True
            if bool(conv):
                break
        return prob, False

    def _run(self):
        import time as _time

        t0 = _time.perf_counter()
        self.n_runs += 1
        snap = self._snapshot
        # Compact the problem to the LIVE keyframes (bucketed): the solve is
        # sized by the map, not its capacity.
        Kmax = snap.kf_pose.shape[0]
        n_live = int(jnp.sum(snap.kf_valid.astype(jnp.int32)))
        kb = _bucket(n_live, 16, Kmax)
        prob, cam_slots, cam_used = build_global_ba_problem_compact(
            snap, self.K, self.bf, kb
        )
        prob, aborted = self._chunks(prob, 5, robust=True)
        if not aborted:
            prob = ba.classify_outliers(prob)
            prob, aborted = self._chunks(prob, 10, robust=False)
        self.aborted = aborted
        self.solve_ms.append((_time.perf_counter() - t0) * 1e3)
        if aborted:
            self.n_aborted += 1
            return
        poses_full, fixed_full = expand_gba_result(
            snap.kf_pose, prob.poses, prob.cam_fixed, cam_slots, cam_used
        )
        self.result = (
            snap.kf_seq, snap.kf_valid, snap.mp_first_seq, snap.mp_valid,
            poses_full, prob.points, fixed_full,
        )


def _bucket(n: int, floor: int, cap: int) -> int:
    """Round n up to the next power-of-two bucket in [floor, cap]."""
    b = floor
    while b < min(n, cap):
        b *= 2
    return min(b, cap)


@jax.jit
def _fuse_sizes(state: MapState, kf_cur: jax.Array, kf_loop: jax.Array):
    """Live sizes of the corrected KF group and the loop-side point set."""
    Kn = state.kf_pose.shape[0]
    M = state.mp_pos.shape[0]
    n_grp = jnp.sum(((state.covis[kf_cur] > 0) & state.kf_valid).astype(jnp.int32)) + 1
    grp = (state.covis[kf_loop] > 0) | (jnp.arange(Kn) == kf_loop)
    mp_in = jnp.where(
        (state.kf_mp >= 0) & state.kf_kp_valid & grp[:, None], state.kf_mp, M
    )
    lp = jnp.zeros(M + 1, bool).at[mp_in.reshape(-1)].set(True)[:M] & state.mp_valid
    return n_grp, jnp.sum(lp.astype(jnp.int32))


def _fuse_caps(state: MapState, kf_cur: int, kf_loop: int):
    """Static fuse capacities covering the live corrected set (bucketed so
    recompiles are bounded by log2 of the capacity range)."""
    n_grp, n_lp = _fuse_sizes(state, jnp.int32(kf_cur), jnp.int32(kf_loop))
    Kn = state.kf_pose.shape[0]
    M = state.mp_pos.shape[0]
    return (
        _bucket(int(n_grp), LOOP_FUSE_KFS, Kn),
        _bucket(int(n_lp), LOOP_MP_CAP, M),
    )


class LoopCloser:
    """Host-side orchestration of the loop pipeline (the LoopClosing thread
    analog). Call `on_keyframe` after each insertion."""

    def __init__(self, vocab, db, fix_scale: bool, K, bf, mesh=None):
        self.vocab = vocab
        self.db = db
        self.fix_scale = fix_scale
        self.K = K
        self.bf = bf
        # Device mesh for the distributed GBA route (None = auto: sharded
        # when >1 device is visible, fused single-device otherwise).
        self.mesh = mesh
        # Detached GBA (async runtime): the solve runs on its own thread on a
        # snapshot, abortable between LM chunks; results are merged by
        # `service_gba` (the reference's detached RunGlobalBundleAdjustment
        # thread, src/LoopClosing.cc:588,654-758).
        self.detached_gba = False
        self.gba_runner: GlobalBARunner | None = None
        self._gba_pending = False
        self.n_gba_merged = 0
        self.consistency = LoopConsistency()
        # Cooldown bookkeeping in MONOTONE insertion order: slot ids are
        # reused by the free list (map_state.append_keyframe), so "kf_id -
        # last_loop_kf" over slots is meaningless; count insertions instead.
        self.kf_counter = 0
        self.last_loop_seq = -(1 << 30)
        self.n_loops_closed = 0
        # Detection rounds skipped because an earlier keyframe in the same
        # batch already triggered a closure (see detect_batch): the
        # reference's 10-KF cooldown would veto them anyway, but the skip is
        # counted, not silent (repo no-silent-caps rule).
        self.n_detect_suppressed = 0

    def enable_detached_gba(self, chunk_iters: int = 3):
        self.detached_gba = True
        if self.gba_runner is None:
            self.gba_runner = GlobalBARunner(
                self.K, self.bf, chunk_iters=chunk_iters, mesh=self.mesh
            )

    def service_gba(self, box) -> bool:
        """Run OUTSIDE the structural lock (loop worker, after on_keyframe):
        merge a finished detached solve into the live map and/or start a
        pending one. Returns True if a result was merged."""
        r = self.gba_runner
        if r is None:
            return False
        merged = False
        if not r.running and r.result is not None and not self._gba_pending:
            res, r.result = r.result, None
            box.mutate(lambda live: merge_gba_into_live(live, *res))
            self.n_gba_merged += 1
            merged = True
        if self._gba_pending:
            if r.running:
                # A newer loop superseded the in-flight solve: cooperative
                # abort (CorrectLoop waits on mbStopGBA, LoopClosing.cc:424).
                r.abort()
                r.join()
            r.result = None  # a stale pre-correction result is worthless
            self._gba_pending = False
            snap, _ = box.read()
            r.start(snap)
        return merged

    def finalize_gba(self, box):
        """Shutdown barrier: let any in-flight/pending solve finish and merge
        it (System::Shutdown waits for the GBA thread, src/System.cc:570-596)."""
        r = self.gba_runner
        if r is None:
            return
        if self._gba_pending and not r.running:
            self._gba_pending = False
            snap, _ = box.read()
            r.start(snap)
        r.join()
        if r.result is not None:
            res, r.result = r.result, None
            box.mutate(lambda live: merge_gba_into_live(live, *res))
            self.n_gba_merged += 1

    def detect_loop(self, state: MapState, kf_id: int, n_kf: int):
        """Detection half of the LoopClosing round (DetectLoop + ComputeSim3,
        src/LoopClosing.cc:113-410): BoW registration + candidate retrieval +
        3-consecutive consistency + Sim3 acceptance. READ-ONLY on `state`
        (only `self.db` and the consistency chain mutate), so it can run on
        a snapshot concurrently with tracking — the reference's LoopClosing
        thread. Returns (cand, S12) for an accepted closure, else None."""
        from . import keyframe_database as kdb

        # Reference skips detection within 10 KFs of the last loop
        # (src/LoopClosing.cc:118-124). Counted in insertion order, not slot
        # ids (slots are reused after culling).
        self.kf_counter += 1
        if n_kf < 12 or self.kf_counter - self.last_loop_seq < 10:
            # Registration only: one async dispatch, no host round-trip.
            # (Row sliced inside the jit — see add_keyframe_from_state.)
            self.db = kdb.add_keyframe_from_state(
                self.db, self.vocab, state, jnp.int32(kf_id)
            )
            self.consistency.update([])
            return None

        # Fused add+detect (one dispatch), then ONE device_get for scores,
        # candidate mask and the cached covisibility (grouping uses the
        # one-round-stale cache — staleness only affects group margins).
        self.db, scores_d, cand_d = kdb.add_and_detect(
            self.db, self.vocab, state, jnp.int32(kf_id)
        )
        scores, cand_mask, C = jax.device_get((scores_d, cand_d, state.covis))
        cands = np.where(cand_mask)[0]
        if len(cands) == 0:
            self.consistency.update([])
            return None

        # Covisibility groups for consistency tracking.
        groups = [set(np.where(C[c] > 0)[0]) | {int(c)} for c in cands]
        consistent = self.consistency.update(groups)
        if not consistent:
            return None

        # Try Sim3 on consistent candidates (strongest first).
        order = sorted(consistent, key=lambda gi: -scores[cands[gi]])
        for gi in order[:3]:
            cand = int(cands[gi])
            success, S12, n_inl, n_total = compute_sim3(
                state, jnp.int32(kf_id), jnp.int32(cand), self.K,
                jax.random.key(kf_id * 131 + cand), fix_scale=self.fix_scale,
                voc=self.vocab,
            )
            if bool(success):
                return cand, S12
        return None

    def detect_batch(self, state: MapState, slots: list, n_live: int):
        """Detection for a CHUNK of freshly inserted keyframes in one device
        dispatch + one device_get (see kdb.add_and_detect_batch), processed
        in insertion order through the consistency chain. Returns accepted
        closures as [(kf_id, cand, S12)] (at most one — a closure resets the
        consistency chain and starts the cooldown)."""
        from . import keyframe_database as kdb

        if not slots:
            return []
        S = _bucket(len(slots), 8, max(8, state.kf_pose.shape[0]))
        arr = jnp.full(S, -1, jnp.int32).at[: len(slots)].set(
            jnp.asarray(slots, jnp.int32)
        )
        self.db, scores_d, cand_d = kdb.add_and_detect_batch(
            self.db, self.vocab, state, arr
        )
        scores, cand, C = jax.device_get((scores_d, cand_d, state.covis))
        triggers = []
        for i, slot in enumerate(slots):
            self.kf_counter += 1
            if triggers:
                # One closure per round: a second trigger would land inside
                # the cooldown the reference enforces between closures
                # (src/LoopClosing.cc:118-124), so only its detection round
                # is skipped — counted, and the candidates re-register in
                # the database for future rounds.
                self.n_detect_suppressed += 1
                self.consistency.update([])
                continue
            if n_live < 12 or self.kf_counter - self.last_loop_seq < 10:
                self.consistency.update([])
                continue
            cands = np.where(cand[i])[0]
            if len(cands) == 0:
                self.consistency.update([])
                continue
            groups = [set(np.where(C[c] > 0)[0]) | {int(c)} for c in cands]
            consistent = self.consistency.update(groups)
            if not consistent:
                continue
            order = sorted(consistent, key=lambda gi: -scores[i][cands[gi]])
            for gi in order[:3]:
                c = int(cands[gi])
                success, S12, n_inl, n_total = compute_sim3(
                    state, jnp.int32(slot), jnp.int32(c), self.K,
                    jax.random.key(slot * 131 + c), fix_scale=self.fix_scale,
                    voc=self.vocab,
                )
                if bool(success):
                    triggers.append((slot, c, S12))
                    break
        return triggers

    def apply_closure(self, state: MapState, kf_id: int, cand: int, S12):
        """Mutating half: CorrectLoop — essential-graph correction, loop
        fusion, covisibility refresh, GBA (detached or inline)
        (src/LoopClosing.cc:412-594). Safe to run on a LIVE state even when
        the Sim3 was accepted on an earlier snapshot: S12 is a relative
        measurement between two keyframe frames."""
        from .map_state import refresh_covis

        state = correct_loop(state, jnp.int32(kf_id), jnp.int32(cand), S12)
        # Fuse the duplicated landmarks the loop created (SearchAndFuse,
        # src/LoopClosing.cc:453-551,596-622) over the FULL corrected group
        # + all loop-side points (the reference never truncates this set):
        # capacities sized from the live map, rounded up to compile buckets.
        fuse_kfs, mp_cap = _fuse_caps(state, kf_id, cand)
        state, _ = search_and_fuse(
            state, jnp.int32(kf_id), jnp.int32(cand), self.K,
            fuse_kfs=fuse_kfs, mp_cap=mp_cap,
        )
        state = refresh_covis(state)
        if self.detached_gba:
            # GBA runs detached on a post-correction snapshot; the caller
            # starts/aborts/merges it via service_gba OUTSIDE the structural
            # lock, so keyframe insertion never stalls behind the solve.
            self._gba_pending = True
        else:
            state, _ = run_global_bundle_adjustment(
                state, self.K, self.bf, mesh=self.mesh
            )
        self.last_loop_seq = self.kf_counter
        self.n_loops_closed += 1
        self.consistency = LoopConsistency()
        return state

    def on_keyframe(self, state: MapState, kf_id: int, n_kf: int):
        """One synchronous LoopClosing round for a freshly inserted keyframe.
        Returns (state, loop_closed: bool); the BoW database is updated in
        place on `self.db`."""
        trig = self.detect_loop(state, kf_id, n_kf)
        if trig is None:
            return state, False
        cand, S12 = trig
        return self.apply_closure(state, kf_id, cand, S12), True
