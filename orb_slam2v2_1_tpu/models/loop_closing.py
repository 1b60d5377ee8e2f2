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

GBA_CAMS = 128
GBA_PTS = 16384
GBA_OBS = 65536
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
def match_keyframes(state: MapState, kf1: jax.Array, kf2: jax.Array):
    """Descriptor matching between two keyframes' map-point keypoints
    (SearchByBoW KF-KF, src/ORBmatcher.cc:522-655: TH_LOW, ratio 0.75,
    rotation consistency)."""
    N = state.kf_xy.shape[1]
    d1 = hamming.unpack_pm1(state.kf_desc[kf1])
    d2 = hamming.unpack_pm1(state.kf_desc[kf2])
    v1 = state.kf_kp_valid[kf1] & (state.kf_mp[kf1] >= 0)
    v2 = state.kf_kp_valid[kf2] & (state.kf_mp[kf2] >= 0)
    m = matching.match_nn(d1, d2, v1[:, None] & v2[None, :],
                          max_dist=matching.TH_LOW, nn_ratio=0.75)
    dang = state.kf_angle[kf1] - state.kf_angle[kf2][m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    m = matching.resolve_duplicates(m.idx, m.dist, ok, N)
    return m


@partial(jax.jit, static_argnames=("fix_scale",))
def compute_sim3(
    state: MapState, kf_cur: jax.Array, kf_cand: jax.Array, K: jax.Array,
    key: jax.Array, fix_scale: bool = True,
):
    """ComputeSim3 for one candidate (src/LoopClosing.cc:241-410): match
    map points, Horn RANSAC, then a guided wider search for total support."""
    m = match_keyframes(state, kf_cur, kf_cand)
    N = state.kf_xy.shape[1]

    pose_c = state.kf_pose[kf_cur]
    pose_l = state.kf_pose[kf_cand]
    mp_c = jnp.maximum(state.kf_mp[kf_cur], 0)
    mp_l = jnp.maximum(state.kf_mp[kf_cand][m.idx], 0)
    # 3-D positions in each camera frame.
    p1 = (state.mp_pos[mp_c] @ pose_c[:3, :3].T) + pose_c[:3, 3]
    p2 = (state.mp_pos[mp_l] @ pose_l[:3, :3].T) + pose_l[:3, 3]
    uv1 = state.kf_xy[kf_cur]
    uv2 = state.kf_xy[kf_cand][m.idx]
    s2_1 = SCALE ** (2 * state.kf_level[kf_cur].astype(jnp.float32))
    s2_2 = SCALE ** (2 * state.kf_level[kf_cand][m.idx].astype(jnp.float32))

    res = sim3solver.sim3_ransac(
        p1, p2, uv1, uv2, s2_1, s2_2, m.ok, K, key, fix_scale=fix_scale
    )

    # Guided wider support: project the candidate's map points into the
    # current KF through S12 and count descriptor agreements
    # (SearchByProjection Sim3 overload, src/ORBmatcher.cc:290-403).
    S12 = res.S12
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
    success = res.success & (res.n_inliers >= MIN_SIM3_MATCHES) & (
        n_total >= MIN_TOTAL_MATCHES
    )
    return success, S12, res.n_inliers, n_total


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
    # (src/LoopClosing.cc:484-504, using mp_first_kf as the reference).
    ref = jnp.clip(state.mp_first_kf, 0, Kn - 1)
    T_old = old_poses[ref]
    T_new = se3[ref]
    p_cam = jnp.einsum("mij,mj->mi", T_old[:, :3, :3], state.mp_pos) + T_old[:, :3, 3]
    Rn = T_new[:, :3, :3]
    p_new = jnp.einsum("mji,mj->mi", Rn, p_cam - T_new[:, :3, 3])
    mp_pos = jnp.where(state.mp_valid[:, None], p_new, state.mp_pos)

    kf_pose = jnp.where(state.kf_valid[:, None, None], lie.orthonormalize(se3), state.kf_pose)
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos)


@partial(jax.jit, donate_argnames=("state",))
def global_bundle_adjustment(state: MapState, K: jax.Array, bf: jax.Array):
    """Whole-map BA (GlobalBundleAdjustemnt, src/Optimizer.cc:41-48: 10+10
    iterations, KF0 fixed)."""
    Kmax, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]

    free_mask = state.kf_valid
    _, cam_sel = jax.lax.top_k(free_mask.astype(jnp.int32), min(GBA_CAMS, Kmax))
    cam_used = free_mask[cam_sel]
    inv_cam = (
        jnp.full(Kmax + 1, -1, jnp.int32)
        .at[jnp.where(cam_used, cam_sel, Kmax)]
        .set(jnp.arange(cam_sel.shape[0], dtype=jnp.int32))[:Kmax]
    )
    cam_fixed = (cam_sel == 0) | ~cam_used  # anchor KF0

    pt_mask = state.mp_valid
    _, pt_sel = jax.lax.top_k(pt_mask.astype(jnp.int32), min(GBA_PTS, M))
    pt_valid = pt_mask[pt_sel]
    inv_pt = (
        jnp.full(M + 1, -1, jnp.int32)
        .at[jnp.where(pt_valid, pt_sel, M)]
        .set(jnp.arange(pt_sel.shape[0], dtype=jnp.int32))[:M]
    )

    in_cam = inv_cam >= 0
    flat_ok = (
        in_cam[:, None]
        & state.kf_kp_valid
        & (state.kf_mp >= 0)
        & (inv_pt[jnp.maximum(state.kf_mp, 0)] >= 0)
    ).reshape(-1)
    _, obs_sel = jax.lax.top_k(flat_ok.astype(jnp.int32), min(GBA_OBS, Kmax * N))
    obs_valid = flat_ok[obs_sel]
    ok_kf = obs_sel // N
    ok_slot = obs_sel % N

    obs = ba.Obs(
        cam_idx=inv_cam[ok_kf].clip(0),
        pt_idx=inv_pt[jnp.maximum(state.kf_mp[ok_kf, ok_slot], 0)].clip(0),
        target=jnp.concatenate(
            [state.kf_xy[ok_kf, ok_slot], state.kf_ur[ok_kf, ok_slot, None]], -1
        ),
        inv_sigma2=INV_LEVEL_SIGMA2[
            jnp.clip(state.kf_level[ok_kf, ok_slot], 0, N_LEVELS - 1)
        ],
        is_stereo=state.kf_ur[ok_kf, ok_slot] >= 0,
        valid=obs_valid,
    )
    prob = ba.BAProblem(
        poses=state.kf_pose[cam_sel], points=state.mp_pos[pt_sel], obs=obs,
        cam_fixed=cam_fixed, K=K, bf=bf,
    )
    prob2, cost = ba.bundle_adjust(prob, cg_iters=32)

    kf_pose = state.kf_pose.at[jnp.where(cam_used & ~cam_fixed, cam_sel, Kmax)].set(
        prob2.poses, mode="drop"
    )
    mp_pos = state.mp_pos.at[jnp.where(pt_valid, pt_sel, M)].set(
        prob2.points, mode="drop"
    )
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos), cost


class LoopCloser:
    """Host-side orchestration of the loop pipeline (the LoopClosing thread
    analog). Call `on_keyframe` after each insertion."""

    def __init__(self, vocab, db, fix_scale: bool, K, bf):
        self.vocab = vocab
        self.db = db
        self.fix_scale = fix_scale
        self.K = K
        self.bf = bf
        self.consistency = LoopConsistency()
        self.last_loop_kf = -1e9
        self.n_loops_closed = 0

    def on_keyframe(self, state: MapState, kf_id: int, n_kf: int):
        """Returns (state, db, loop_closed: bool)."""
        from . import keyframe_database as kdb

        self.db = kdb.add_keyframe(
            self.db, self.vocab, jnp.int32(kf_id),
            state.kf_desc[kf_id], state.kf_kp_valid[kf_id],
        )
        # Reference skips detection within 10 KFs of the last loop
        # (src/LoopClosing.cc:118-124).
        if n_kf < 12 or kf_id - self.last_loop_kf < 10:
            self.consistency.update([])
            return state, False

        scores, cand_mask, _ = kdb.detect_loop_candidates(
            self.db, state, jnp.int32(kf_id)
        )
        cands = np.where(np.asarray(cand_mask))[0]
        if len(cands) == 0:
            self.consistency.update([])
            return state, False

        # Covisibility groups for consistency tracking.
        C = np.asarray(covisibility(state))
        groups = [set(np.where(C[c] > 0)[0]) | {int(c)} for c in cands]
        consistent = self.consistency.update(groups)
        if not consistent:
            return state, False

        # Try Sim3 on consistent candidates (strongest first).
        sc = np.asarray(scores)
        order = sorted(consistent, key=lambda gi: -sc[cands[gi]])
        for gi in order[:3]:
            cand = int(cands[gi])
            success, S12, n_inl, n_total = compute_sim3(
                state, jnp.int32(kf_id), jnp.int32(cand), self.K,
                jax.random.key(kf_id * 131 + cand), fix_scale=self.fix_scale,
            )
            if bool(success):
                state = correct_loop(
                    state, jnp.int32(kf_id), jnp.int32(cand), S12
                )
                state, _ = global_bundle_adjustment(state, self.K, self.bf)
                self.last_loop_kf = kf_id
                self.n_loops_closed += 1
                self.consistency = LoopConsistency()
                return state, True
        return state, False
