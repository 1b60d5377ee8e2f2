"""Local mapping: map-point triangulation, culling, and windowed local BA.

TPU-native replacement for the reference `LocalMapping` thread
(src/LocalMapping.cc): `CreateNewMapPoints` (:215-460), `MapPointCulling`
(:178-213), and the `Optimizer::LocalBundleAdjustment` windowing
(src/Optimizer.cc:453-780). Everything operates on the fixed-capacity
`MapState` with masked appends; the host scheduler decides *when* to run
these programs (synchronously after keyframe insertion for now, matching the
reference's queue semantics without its races).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ba, hamming, matching
from ..ops.triangulate import triangulate, projection_matrix
from .map_state import MapState, mp_observation_count, row_covisibility
from .tracking import INV_LEVEL_SIGMA2, N_LEVELS, SCALE

TRI_NEIGHBORS = 10  # mono uses 20, stereo 10 (src/LocalMapping.cc:219)
NEW_MP_CAP = 384  # max new points accepted per neighbor pair
BA_CAMS = 24  # local window cameras (free)
BA_FIXED = 8  # boundary cameras (fixed)
BA_PTS = 4096  # point capacity of the window (top covisible points kept)


def _cam_center(pose):
    return -pose[..., :3, :3].transpose(*range(pose.ndim - 2), -1, -2) @ pose[..., :3, 3:4]


@partial(jax.jit, donate_argnames=("state",))
def create_map_points(
    state: MapState,
    kf_id: jax.Array,
    K: jax.Array,
    bf: jax.Array,
    key: jax.Array,
    voc=None,
):
    """Triangulate new map points between the new keyframe and its best
    covisible neighbors (LocalMapping::CreateNewMapPoints,
    src/LocalMapping.cc:215-460 + ORBmatcher::SearchForTriangulation
    src/ORBmatcher.cc:657-825).

    All neighbor pairs are matched/triangulated/audited in PARALLEL (vmap);
    a keypoint of the new KF that triangulates against several neighbors
    keeps its best-covisibility pair (the sequential reference's
    first-pair-claims semantics), then ONE masked append grows the map.
    """
    del key
    N = state.kf_xy.shape[1]
    M = state.mp_pos.shape[0]
    row = row_covisibility(state, kf_id)
    neigh_w, neigh_idx = jax.lax.top_k(row, TRI_NEIGHBORS)

    good, X, m_idx = jax.vmap(
        lambda n_kf, w: _triangulate_candidates(state, kf_id, n_kf, w > 0, K, bf, voc)
    )(neigh_idx, neigh_w)  # (T,N) bool, (T,N,3), (T,N)

    # Per kf1 keypoint: keep the first (best-covisibility) proposing pair.
    good_any = jnp.any(good, axis=0)  # (N,)
    chosen = jnp.argmax(good, axis=0)  # (N,) first True (weights sorted desc)
    sl = jnp.arange(N)
    X_sel = X[chosen, sl]  # (N,3)
    m_sel = m_idx[chosen, sl]  # (N,) kf2-side slot
    kf2_sel = neigh_idx[chosen]  # (N,)

    # Free-list allocation: new point j takes the rank(j)-th FREE slot.
    # Culled points leave reusable holes (the MapPoint free-list matching
    # the r3 keyframe slot reuse); an append-only cursor starves the map of
    # new points once the high-water mark hits capacity — measured to kill
    # tracking on long sequences (~160 frames at 16k capacity).
    rank = jnp.cumsum(good_any.astype(jnp.int32)) - 1
    _, free_slots = jax.lax.top_k((~state.mp_valid).astype(jnp.int8), NEW_MP_CAP)
    n_free = jnp.sum((~state.mp_valid).astype(jnp.int32))
    cap_ok = good_any & (rank < NEW_MP_CAP) & (rank < n_free)
    slot = jnp.where(
        cap_ok, free_slots[jnp.minimum(rank, NEW_MP_CAP - 1)], M
    )  # M = parked/dropped

    mp_pos = jnp.concatenate([state.mp_pos, jnp.zeros((1, 3))]).at[slot].set(X_sel)[:M]
    mp_valid = jnp.concatenate([state.mp_valid, jnp.zeros(1, bool)]).at[slot].set(True)[:M]
    mp_desc = (
        jnp.concatenate([state.mp_desc, jnp.zeros((1, 8), jnp.uint32)])
        .at[slot]
        .set(state.kf_desc[kf_id])[:M]
    )
    mp_first = (
        jnp.concatenate([state.mp_first_kf, jnp.zeros(1, jnp.int32)])
        .at[slot]
        .set(jnp.broadcast_to(kf_id, slot.shape))[:M]
    )
    mp_first_seq = (
        jnp.concatenate([state.mp_first_seq, jnp.zeros(1, jnp.int32)])
        .at[slot]
        .set(jnp.broadcast_to(state.kf_seq[kf_id], slot.shape))[:M]
    )
    mp_vis = jnp.concatenate([state.mp_visible, jnp.zeros(1, jnp.int32)]).at[slot].set(1)[:M]
    mp_found = jnp.concatenate([state.mp_found, jnp.zeros(1, jnp.int32)]).at[slot].set(1)[:M]

    new_id = jnp.where(cap_ok, slot, -1)
    # Associate in each chosen neighbor row first (reads pre-update rows),
    # then the new keyframe's own row.
    nrows = state.kf_mp[neigh_idx]  # (T,N)
    tsel = (chosen[None, :] == jnp.arange(TRI_NEIGHBORS)[:, None]) & cap_ok[None, :]
    nrows = jax.vmap(
        lambda row, sel, ms: row.at[jnp.where(sel, ms, N)].set(
            jnp.where(sel, new_id, -1), mode="drop"
        )
    )(nrows, tsel, m_idx)
    kf_mp = state.kf_mp.at[neigh_idx].set(nrows)
    kf_mp = kf_mp.at[kf_id].set(jnp.where(cap_ok, new_id, state.kf_mp[kf_id]))

    # n_mp stays the HIGH-WATER mark (several consumers use it as the
    # contiguous-prefix bound); reused slots sit below it by construction.
    hw = jnp.max(jnp.where(cap_ok, slot, -1)) + 1
    return state._replace(
        mp_pos=mp_pos,
        mp_valid=mp_valid,
        mp_desc=mp_desc,
        mp_first_kf=mp_first,
        mp_first_seq=mp_first_seq,
        mp_visible=mp_vis,
        mp_found=mp_found,
        kf_mp=kf_mp,
        n_mp=jnp.maximum(state.n_mp, hw),
    )


def _triangulate_candidates(state: MapState, kf1, kf2, pair_ok, K, bf, voc=None):
    """Match + triangulate + audit ONE keyframe pair, without mutating the
    map. Returns (good (N,), X (N,3) world points, m_idx (N,) kf2 slots).

    With a vocabulary, candidate pairs are additionally pruned to those
    sharing a coarse vocabulary-tree node — the reference's
    SearchForTriangulation FeatureVector alignment
    (src/ORBmatcher.cc:657-825)."""
    N = state.kf_xy.shape[1]

    pose1 = state.kf_pose[kf1]
    pose2 = state.kf_pose[kf2]
    c1 = -pose1[:3, :3].T @ pose1[:3, 3]
    c2 = -pose2[:3, :3].T @ pose2[:3, 3]
    baseline = jnp.linalg.norm(c2 - c1)

    # Median scene depth of kf2 for the mono baseline check
    # (src/LocalMapping.cc:246-255): baseline/medianDepth > 0.01.
    mp2 = state.kf_mp[kf2]
    has2 = (mp2 >= 0) & state.kf_kp_valid[kf2]
    pz = (pose2[2, :3] @ state.mp_pos[jnp.maximum(mp2, 0)].T) + pose2[2, 3]
    pz = jnp.where(has2, pz, jnp.nan)
    median_depth = jnp.nanmedian(pz)
    pair_ok = pair_ok & (baseline / jnp.maximum(median_depth, 1e-6) > 0.01)

    # Match *unassociated* keypoints of both frames.
    free1 = state.kf_kp_valid[kf1] & (state.kf_mp[kf1] < 0)
    free2 = state.kf_kp_valid[kf2] & (state.kf_mp[kf2] < 0)
    d1 = hamming.unpack_pm1(state.kf_desc[kf1])
    d2 = hamming.unpack_pm1(state.kf_desc[kf2])

    # Epipolar constraint: distance of kp2 to the epipolar line of kp1 under
    # F12 (CheckDistEpipolarLine, src/ORBmatcher.cc:140-157).
    Km = jnp.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(Km)
    T12 = pose1 @ jnp.linalg.inv(pose2)  # maps cam2 -> cam1
    R12, t12 = T12[:3, :3], T12[:3, 3]
    tx = jnp.array(
        [[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]], [-t12[1], t12[0], 0]]
    )
    F12 = Kinv.T @ tx @ R12 @ Kinv
    x1h = jnp.concatenate([state.kf_xy[kf1], jnp.ones((N, 1))], -1)
    x2h = jnp.concatenate([state.kf_xy[kf2], jnp.ones((N, 1))], -1)
    lines = x1h @ F12  # (N,3): epipolar line in image 2 for each kp1
    num = jnp.abs(lines @ x2h.T)  # (N1, N2)
    den = jnp.sqrt(jnp.maximum(lines[:, 0] ** 2 + lines[:, 1] ** 2, 1e-12))[:, None]
    epi_d2 = (num / den) ** 2
    sigma2_2 = SCALE ** (2 * state.kf_level[kf2].astype(jnp.float32))
    epi_ok = epi_d2 < 3.84 * sigma2_2[None, :]

    mask = free1[:, None] & free2[None, :] & epi_ok
    if voc is not None:
        from ..ops import vocab as vocab_ops

        n1 = vocab_ops.assign_nodes(voc, d1)
        n2 = vocab_ops.assign_nodes(voc, d2)
        mask = mask & (n1[:, None] == n2[None, :])
    m = matching.match_nn(d1, d2, mask, max_dist=matching.TH_LOW, nn_ratio=1.0)
    dang = state.kf_angle[kf1] - state.kf_angle[kf2][m.idx]
    ok = matching.rotation_consistency(dang, m.ok)
    m = matching.resolve_duplicates(m.idx, m.dist, ok, N)
    ok = m.ok & pair_ok

    # Triangulate matches.
    P1 = projection_matrix(pose1, K)
    P2 = projection_matrix(pose2, K)
    x1 = state.kf_xy[kf1]
    x2 = state.kf_xy[kf2][m.idx]
    X = triangulate(P1, P2, x1, x2)

    # Audits (src/LocalMapping.cc:326-439): parallax, depths, reproj chi2,
    # scale-consistency.
    r1 = X - c1
    r2 = X - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(n1 * n2, 1e-12)
    z1 = (pose1[2, :3] @ X.T) + pose1[2, 3]
    z2 = (pose2[2, :3] @ X.T) + pose2[2, 3]

    def reproj_err(pose, xy):
        from ..ops.projection import project

        return jnp.sum((project(pose, X, K) - xy) ** 2, axis=-1)

    s2_1 = SCALE ** (2 * state.kf_level[kf1].astype(jnp.float32))
    s2_2m = sigma2_2[m.idx]
    e1_ok = reproj_err(pose1, x1) < 5.991 * s2_1
    e2_ok = reproj_err(pose2, x2) < 5.991 * s2_2m

    ratio_dist = n1 / jnp.maximum(n2, 1e-12)
    ratio_octave = SCALE ** (
        (state.kf_level[kf1] - state.kf_level[kf2][m.idx]).astype(jnp.float32)
    )
    scale_ok = (ratio_dist < ratio_octave * 1.5 ** 1.5) & (
        ratio_dist > ratio_octave / (1.5 ** 1.5)
    )

    good = (
        ok
        & jnp.all(jnp.isfinite(X), -1)
        & (cos_par < 0.9998)
        & (z1 > 0)
        & (z2 > 0)
        & e1_ok
        & e2_ok
        & scale_ok
    )
    return good, jnp.where(good[:, None], X, 0.0), m.idx


DEPTH_PT_CAP = 512


@partial(jax.jit, donate_argnames=("state",))
def create_depth_points(state: MapState, kf_id: jax.Array, K: jax.Array, bf: jax.Array,
                        depth_limit: jax.Array):
    """Stereo/RGB-D keyframe densification: unmatched keypoints with valid
    depth become map points, closest first (Tracking::CreateNewKeyFrame,
    src/Tracking.cc:1206-1286 — creates all points closer than mThDepth and
    at least the 100 closest)."""
    N = state.kf_xy.shape[1]
    M = state.mp_pos.shape[0]
    u = state.kf_xy[kf_id, :, 0]
    v = state.kf_xy[kf_id, :, 1]
    ur = state.kf_ur[kf_id]
    disp = u - ur
    z = jnp.where((ur >= 0) & (disp > 1e-6), bf / jnp.maximum(disp, 1e-6), -1.0)
    cand = (
        state.kf_kp_valid[kf_id]
        & (state.kf_mp[kf_id] < 0)
        & (z > 0)
    )
    # Rank by depth: all below depth_limit, else the 100 closest.
    order_key = jnp.where(cand, z, jnp.inf)
    rank = jnp.argsort(jnp.argsort(order_key))  # rank of each slot by depth
    take = cand & ((z < depth_limit) | (rank < 100)) & (rank < DEPTH_PT_CAP)

    # Unproject into world.
    pose = state.kf_pose[kf_id]
    Twc_R = pose[:3, :3].T
    Twc_t = -Twc_R @ pose[:3, 3]
    xc = (u - K[2]) * z / K[0]
    yc = (v - K[3]) * z / K[1]
    Xc = jnp.stack([xc, yc, z], -1)
    Xw = Xc @ Twc_R.T + Twc_t

    # Free-list allocation (see create_map_points): culled slots are reused.
    slot_rank = jnp.cumsum(take.astype(jnp.int32)) - 1
    _, free_slots = jax.lax.top_k((~state.mp_valid).astype(jnp.int8), DEPTH_PT_CAP)
    n_free = jnp.sum((~state.mp_valid).astype(jnp.int32))
    ok = take & (slot_rank < n_free) & (slot_rank < DEPTH_PT_CAP)
    slot = jnp.where(ok, free_slots[jnp.minimum(slot_rank, DEPTH_PT_CAP - 1)], M)
    state = state._replace(
        mp_pos=jnp.concatenate([state.mp_pos, jnp.zeros((1, 3))]).at[slot].set(Xw)[:M],
        mp_valid=jnp.concatenate([state.mp_valid, jnp.zeros(1, bool)]).at[slot].set(True)[:M],
        mp_desc=jnp.concatenate([state.mp_desc, jnp.zeros((1, 8), jnp.uint32)])
        .at[slot]
        .set(state.kf_desc[kf_id])[:M],
        mp_first_kf=jnp.concatenate([state.mp_first_kf, jnp.zeros(1, jnp.int32)])
        .at[slot]
        .set(jnp.broadcast_to(kf_id, slot.shape))[:M],
        mp_first_seq=jnp.concatenate([state.mp_first_seq, jnp.zeros(1, jnp.int32)])
        .at[slot]
        .set(jnp.broadcast_to(state.kf_seq[kf_id], slot.shape))[:M],
        mp_visible=jnp.concatenate([state.mp_visible, jnp.zeros(1, jnp.int32)]).at[slot].set(1)[:M],
        mp_found=jnp.concatenate([state.mp_found, jnp.zeros(1, jnp.int32)]).at[slot].set(1)[:M],
        kf_mp=state.kf_mp.at[kf_id].set(jnp.where(ok, slot, state.kf_mp[kf_id])),
        n_mp=jnp.maximum(state.n_mp, jnp.max(jnp.where(ok, slot, -1)) + 1),
    )
    return state


def _fuse_candidates(state: MapState, src_kf, dst_kf, pair_ok, K):
    """Project src_kf's map points into dst_kf and match to its keypoints
    (ORBmatcher::Fuse search phase, src/ORBmatcher.cc:827-977), WITHOUT
    mutating the map. Returns (ok (N,), m_idx (N,) dst slots,
    m_dist (N,), q_mp (N,) source point ids)."""
    from ..ops.projection import project

    q_mp = state.kf_mp[src_kf]  # (N,) candidate points to push into dst
    q_ok = (q_mp >= 0) & state.kf_kp_valid[src_kf] & pair_ok
    q_ok = q_ok & state.mp_valid[jnp.maximum(q_mp, 0)]
    # Skip points already observed by dst.
    M = state.mp_pos.shape[0]
    dst_has = jnp.zeros(M + 1, bool).at[
        jnp.where(state.kf_mp[dst_kf] >= 0, state.kf_mp[dst_kf], M)
    ].set(True)
    q_ok = q_ok & ~dst_has[jnp.maximum(q_mp, 0)]

    pose = state.kf_pose[dst_kf]
    pw = state.mp_pos[jnp.maximum(q_mp, 0)]
    uv = project(pose, pw, K)
    z = (pose[2, :3] @ pw.T) + pose[2, 3]
    cam_center = -pose[:3, :3].T @ pose[:3, 3]
    po = pw - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * state.mp_normal[jnp.maximum(q_mp, 0)], axis=-1) / jnp.maximum(dist, 1e-9)
    in_band = (dist >= state.mp_min_dist[jnp.maximum(q_mp, 0)]) & (
        dist <= state.mp_max_dist[jnp.maximum(q_mp, 0)]
    )
    q_ok = q_ok & (z > 0) & in_band & (view_cos > 0.5)

    ratio = state.mp_max_dist[jnp.maximum(q_mp, 0)] / jnp.maximum(dist, 1e-9)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(SCALE)).astype(jnp.int32),
        0, N_LEVELS - 1,
    )
    radius = 3.0 * SCALE ** pred_level.astype(jnp.float32)

    q_pm1 = hamming.unpack_pm1(state.mp_desc[jnp.maximum(q_mp, 0)])
    m = matching.match_projection(
        q_desc=q_pm1,
        q_xy_pred=uv,
        q_level_pred=pred_level,
        q_valid=q_ok,
        t_desc=hamming.unpack_pm1(state.kf_desc[dst_kf]),
        t_xy=state.kf_xy[dst_kf],
        t_level=state.kf_level[dst_kf],
        t_valid=state.kf_kp_valid[dst_kf],
        radius=radius,
        max_dist=matching.TH_LOW,
        nn_ratio=1.0,
    )
    return m.ok, m.idx, m.dist, q_mp


@partial(jax.jit, donate_argnames=("state",))
def fuse_map_points(state: MapState, kf_id: jax.Array, K: jax.Array, bf: jax.Array):
    """SearchInNeighbors (src/LocalMapping.cc:462-542): two-way Fuse between
    the new keyframe and its best covisible neighbors.

    All 2*TRI_NEIGHBORS directed Fuse searches run in PARALLEL (vmap against
    the same map snapshot); the association/merge bookkeeping is then applied
    in one pass — per-neighbor rows are independent, the new KF's row
    resolves cross-neighbor conflicts by best Hamming distance, and all
    point merges collapse into a single replacement map (MapPoint::Replace,
    src/MapPoint.cc:187-232). Merge chains that the reference's sequential
    order would resolve within one round settle on the next keyframe's round.
    """
    N = state.kf_xy.shape[1]
    M = state.mp_pos.shape[0]
    T = TRI_NEIGHBORS
    row = row_covisibility(state, kf_id)
    neigh_w, neigh_idx = jax.lax.top_k(row, T)
    pair_ok = neigh_w > 0

    # Direction A: new KF's points -> each neighbor (dst rows independent).
    okA, idxA, distA, qmpA = jax.vmap(
        lambda n, ok: _fuse_candidates(state, kf_id, n, ok, K)
    )(neigh_idx, pair_ok)  # (T,N) each; qmpA rows identical (kf_id's points)

    # Direction B: each neighbor's points -> the new KF (shared dst row).
    okB, idxB, distB, qmpB = jax.vmap(
        lambda n, ok: _fuse_candidates(state, n, kf_id, ok, K)
    )(neigh_idx, pair_ok)

    obs = mp_observation_count(state)
    obs1 = jnp.concatenate([obs, jnp.zeros(1, jnp.int32)])  # -1-safe lookup

    # --- apply A: per-neighbor row updates + merge pairs ---
    nrows = state.kf_mp[neigh_idx]  # (T,N) pre-update
    existA = jax.vmap(lambda row, idx: row[idx])(nrows, idxA)  # (T,N)
    srcA = jnp.where(okA, qmpA, -1)
    addA = okA & (existA < 0)
    mergeA = okA & (existA >= 0) & (existA != srcA)
    nrows = jax.vmap(
        lambda row, sel, idx, val: row.at[jnp.where(sel, idx, N)].set(
            jnp.where(sel, val, -1), mode="drop"
        )
    )(nrows, addA, idxA, srcA)
    kf_mp = state.kf_mp.at[neigh_idx].set(nrows)

    # --- apply B: one dst row (the new KF), cross-neighbor conflicts by
    # best Hamming distance ---
    big = jnp.int32(1 << 20)
    prop_pt = jnp.full((T, N + 1), -1, jnp.int32)
    prop_dist = jnp.full((T, N + 1), big)
    t_iota = jnp.arange(T)[:, None]
    dst_slot = jnp.where(okB, idxB, N)
    prop_pt = prop_pt.at[t_iota, dst_slot].set(jnp.where(okB, qmpB, -1))
    prop_dist = prop_dist.at[t_iota, dst_slot].min(jnp.where(okB, distB, big))
    best_t = jnp.argmin(prop_dist[:, :N], axis=0)  # (N,)
    slot_sel = prop_dist[best_t, jnp.arange(N)] < big
    srcB = jnp.where(slot_sel, prop_pt[best_t, jnp.arange(N)], -1)
    kf_row = kf_mp[kf_id]
    existB = kf_row
    addB = slot_sel & (srcB >= 0) & (existB < 0)
    mergeB = slot_sel & (srcB >= 0) & (existB >= 0) & (existB != srcB)
    # Dedup: two neighbors can propose the SAME point for different slots
    # (the sequential reference's per-pair dst_has check); keep the best
    # distance, ties broken by slot order.
    dist_sel = prop_dist[best_t, jnp.arange(N)]
    pt_best = jnp.full(M + 1, big).at[jnp.where(addB, srcB, M)].min(dist_sel)
    cand = addB & (dist_sel <= pt_best[jnp.maximum(srcB, 0)])
    pt_first = (
        jnp.full(M + 1, N, jnp.int32)
        .at[jnp.where(cand, srcB, M)]
        .min(jnp.arange(N, dtype=jnp.int32))
    )
    addB = cand & (pt_first[jnp.maximum(srcB, 0)] == jnp.arange(N))
    kf_row = jnp.where(addB, srcB, kf_row)
    kf_mp = kf_mp.at[kf_id].set(kf_row)

    # --- merges: the point with fewer observations is replaced ---
    l_a = jnp.where(mergeA, existA, -1).reshape(-1)
    s_a = jnp.where(mergeA, srcA, -1).reshape(-1)
    l_b = jnp.where(mergeB, existB, -1)
    s_b = jnp.where(mergeB, srcB, -1)
    losers0 = jnp.concatenate([l_a, l_b])
    srcs = jnp.concatenate([s_a, s_b])
    keep_src = obs1[srcs] >= obs1[losers0]
    winner = jnp.where(keep_src, srcs, losers0)
    loser = jnp.where(keep_src, losers0, srcs)
    valid_merge = (losers0 >= 0) & (srcs >= 0)
    rep = jnp.arange(M + 1, dtype=jnp.int32)
    rep = rep.at[jnp.where(valid_merge, loser, M)].set(
        jnp.where(valid_merge, winner, -1), mode="drop"
    )[:M]
    kf_mp = jnp.where(kf_mp >= 0, rep[jnp.maximum(kf_mp, 0)], kf_mp)
    mp_valid = state.mp_valid & (rep == jnp.arange(M))

    return state._replace(kf_mp=kf_mp, mp_valid=mp_valid)


@partial(jax.jit, donate_argnames=("state",))
def cull_map_points(state: MapState, current_kf: jax.Array):
    """MapPointCulling (src/LocalMapping.cc:178-213): drop points with
    found/visible < 0.25, or too few observations a grace period after
    creation."""
    obs = mp_observation_count(state)
    found_ratio = state.mp_found.astype(jnp.float32) / jnp.maximum(
        state.mp_visible.astype(jnp.float32), 1.0
    )
    age = state.kf_seq[current_kf] - state.mp_first_seq
    bad = (found_ratio < 0.25) | ((age >= 2) & (obs <= 2))
    # Only recent points are subject to the obs test; mature points survive
    # (reference stops testing after 3 KFs).
    bad = bad & (age <= 3) & state.mp_valid
    mp_valid = state.mp_valid & ~bad
    # Detach dead points from keyframes.
    kf_mp = jnp.where(
        (state.kf_mp >= 0) & ~mp_valid[jnp.maximum(state.kf_mp, 0)], -1, state.kf_mp
    )
    return state._replace(mp_valid=mp_valid, kf_mp=kf_mp)


@partial(jax.jit, donate_argnames=("state",), static_argnames=("force",))
def cull_keyframes(state: MapState, kf_id: jax.Array, force: bool = False):
    """KeyFrameCulling + SetBadFlag erase (src/LocalMapping.cc:640-704,
    src/KeyFrame.cc:432-546): a local keyframe is redundant if >=90% of its
    map points are observed by >=3 other keyframes at the same or finer
    scale. `force=True` is the bounded-memory eviction mode (a deviation the
    fixed-capacity map needs that the reference's unbounded map doesn't):
    when the map is full and a new keyframe is wanted, the MOST redundant
    eligible keyframe is evicted even below the 90% bar, so the map keeps
    adapting on long revisits. The victim (at most one per round) is ERASED —
    its observations cleared, its slot returned to the free list for reuse
    by `append_keyframe`, and its spanning-tree children re-parented to
    their best covisible older keyframe (SetBadFlag's re-parent loop,
    src/KeyFrame.cc:486-536, with the candidate set restricted by kf_seq
    ordering, which guarantees acyclicity).

    Returns (state, victim, parent, T_redirect): victim == -1 when nothing
    was culled; otherwise `T_redirect = Tcw_victim @ Twc_parent` lets the
    host rewrite trajectory entries referencing the victim onto its parent
    (the SaveTrajectory spanning-tree chain, src/System.cc:610-629).
    """
    from ..ops import lie

    Kn, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]

    # The reference counts observers with level <= level_in_candidate+1. We
    # approximate with a per-point observer count + per-point min observation
    # level via two segment reductions.
    flat_mp = jnp.where(
        state.kf_kp_valid & (state.kf_mp >= 0) & state.kf_valid[:, None],
        state.kf_mp, M,
    )
    lvl = state.kf_level
    counts = jnp.zeros(M + 1, jnp.int32).at[flat_mp.reshape(-1)].add(1)[:M]
    min_lvl = jnp.full(M + 1, 99, jnp.int32).at[flat_mp.reshape(-1)].min(
        lvl.reshape(-1)
    )[:M]

    row = row_covisibility(state, kf_id)
    # Roots (parent -1, i.e. the map origin) and the current KF never die;
    # neither does any keyframe carrying a loop edge (the reference's
    # mspLoopEdges guard in SetBadFlag, src/KeyFrame.cc:443-455).
    cand_mask = (row > 0) & state.kf_valid & (state.kf_parent >= 0)
    cand_mask = cand_mask.at[kf_id].set(False)
    le = state.loop_edges.reshape(-1)
    on_loop = (
        jnp.zeros(Kn + 1, bool).at[jnp.where(le >= 0, le, Kn)].set(True)[:Kn]
    )
    cand_mask = cand_mask & ~on_loop

    def redundancy(k):
        mp = state.kf_mp[k]
        has = (mp >= 0) & state.kf_kp_valid[k]
        mpc = jnp.maximum(mp, 0)
        # Observed by >=3 others at same-or-finer scale (min_lvl <= level+1).
        well_observed = (counts[mpc] >= 4) & (min_lvl[mpc] <= state.kf_level[k] + 1)
        n_pts = jnp.maximum(jnp.sum(has.astype(jnp.int32)), 1)
        n_red = jnp.sum((has & well_observed).astype(jnp.int32))
        return n_red.astype(jnp.float32) / n_pts.astype(jnp.float32)

    ratio = jax.vmap(redundancy)(jnp.arange(Kn))
    red = (ratio > 0.9) & cand_mask
    if force:
        any_red = jnp.any(cand_mask)
        victim = jnp.argmax(jnp.where(cand_mask, ratio, -1.0)).astype(jnp.int32)
    else:
        any_red = jnp.any(red)
        victim = jnp.argmax(jnp.where(red, state.kf_seq, -1)).astype(jnp.int32)
    parent = state.kf_parent[victim]
    T_redirect = state.kf_pose[victim] @ lie.se3_inverse(
        state.kf_pose[jnp.maximum(parent, 0)]
    )

    # Re-parent the victim's children: best covisible older keyframe
    # (kf_seq ordering keeps the tree acyclic); fall back to the victim's
    # own parent. Uses the cached covisibility — staleness of one round only
    # affects tie quality, not correctness.
    child = state.kf_valid & (state.kf_parent == victim)
    elig = (
        state.kf_valid[None, :]
        & (state.kf_seq[None, :] < state.kf_seq[:, None])
        & (jnp.arange(Kn)[None, :] != victim)
    )
    score = jnp.where(elig, state.covis, -1)
    best = jnp.argmax(score, axis=1).astype(jnp.int32)
    has_best = jnp.max(score, axis=1) > 0
    new_parent = jnp.where(
        child & any_red,
        jnp.where(has_best, best, parent),
        state.kf_parent,
    )

    vic = jnp.where(any_red, victim, Kn)  # park no-op writes out of range
    state = state._replace(
        kf_valid=state.kf_valid.at[vic].set(False, mode="drop"),
        kf_kp_valid=state.kf_kp_valid.at[vic].set(False, mode="drop"),
        kf_mp=state.kf_mp.at[vic].set(-1, mode="drop"),
        kf_seq=state.kf_seq.at[vic].set(-1, mode="drop"),
        kf_parent=new_parent.at[vic].set(-1, mode="drop"),
    )
    victim_out = jnp.where(any_red, victim, -1)
    return state, victim_out, parent, T_redirect


class LocalBAIndex(NamedTuple):
    cam_kf: jax.Array  # (C,) keyframe id per camera slot (-1 unused)
    pt_mp: jax.Array  # (P,) map-point id per point slot (-1 unused)


class WindowBuild(NamedTuple):
    """Local-BA window + the bookkeeping needed to write results back."""

    win: ba.BAWindow
    cam_kf: jax.Array  # (C,) keyframe slot per window camera
    cam_used: jax.Array  # (C,) bool
    pt_sel: jax.Array  # (P,) map-point slot per window point
    pt_sel_valid: jax.Array  # (P,) bool
    kf_mp_w: jax.Array  # (C,N) original kf_mp rows (outlier detach)


def build_local_ba_window(state: MapState, kf_id: jax.Array, K: jax.Array, bf: jax.Array) -> WindowBuild:
    """Window selection for local BA (Optimizer::LocalBundleAdjustment,
    src/Optimizer.cc:455-504): free cameras = the KF + top covisible
    neighbors; points = all their observations; fixed cameras = other
    observers of those points."""
    Kmax, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    P = min(BA_PTS, M)

    row = row_covisibility(state, kf_id)
    w = row.at[kf_id].set(1 << 20)  # ensure self in window
    w = jnp.where(state.kf_valid, w, -1)
    free_w, free_idx = jax.lax.top_k(w, min(BA_CAMS, Kmax))
    free_mask = jnp.zeros(Kmax, bool).at[free_idx].set(free_w > 0)

    # Points seen from the window.
    mp_in = jnp.where(
        (state.kf_mp >= 0) & state.kf_kp_valid & free_mask[:, None], state.kf_mp, M
    )
    pt_mask = jnp.zeros(M + 1, bool).at[mp_in.reshape(-1)].set(True)[:M] & state.mp_valid
    _, pt_sel = jax.lax.top_k(pt_mask.astype(jnp.int32), P)
    pt_sel_valid = pt_mask[pt_sel]
    # Inverse map mp -> point slot (P = not selected).
    inv_pt = jnp.full(M + 1, P, jnp.int32).at[jnp.where(pt_sel_valid, pt_sel, M)].set(
        jnp.arange(P, dtype=jnp.int32)
    )[:M]

    # Fixed cameras: observe selected points but are not free.
    sees_sel = jnp.any(
        (state.kf_mp >= 0) & state.kf_kp_valid & (inv_pt[jnp.maximum(state.kf_mp, 0)] < P),
        axis=1,
    )
    fixed_cand = sees_sel & ~free_mask & state.kf_valid
    _, fixed_idx = jax.lax.top_k(fixed_cand.astype(jnp.int32), min(BA_FIXED, Kmax))
    fixed_valid = fixed_cand[fixed_idx]

    cam_kf = jnp.concatenate([free_idx, fixed_idx])  # (C,)
    cam_used = jnp.concatenate([free_mask[free_idx], fixed_valid])
    cam_fixed = jnp.concatenate(
        [jnp.zeros_like(free_idx, dtype=bool), jnp.ones_like(fixed_idx, dtype=bool)]
    )
    # If the window is smaller than BA_CAMS the spare free slots must not
    # move: mark unused cams fixed.
    cam_fixed = cam_fixed | ~cam_used
    # Gauge anchor: a young map can have NO boundary cameras (every KF is in
    # the window), leaving the SE3 gauge free — measured to bend the whole
    # map by tens of degrees over a run. Always fix the oldest camera in the
    # window. (Mono scale gauge is handled separately: median-depth
    # renormalization at init, and boundary KFs once the map matures.)
    # Oldest by insertion sequence — slot ids are reused and unordered.
    order_key = jnp.where(cam_used & ~cam_fixed, state.kf_seq[cam_kf], 1 << 20)
    anchor = jnp.argsort(order_key)[:1]
    cam_fixed = cam_fixed.at[anchor].set(True)

    # Structured (C, N) observations: camera c's keypoint slots, point ids
    # remapped into the window (P = unselected/none).
    kf_mp_w = state.kf_mp[cam_kf]  # (C,N)
    pt_idx = inv_pt[jnp.maximum(kf_mp_w, 0)]
    obs_valid = (
        cam_used[:, None]
        & state.kf_kp_valid[cam_kf]
        & (kf_mp_w >= 0)
        & (pt_idx < P)
    )
    win = ba.BAWindow(
        poses=state.kf_pose[cam_kf],
        points=state.mp_pos[pt_sel],
        pt_idx=jnp.where(obs_valid, pt_idx, P),
        target=jnp.concatenate(
            [state.kf_xy[cam_kf], state.kf_ur[cam_kf][..., None]], -1
        ),
        inv_sigma2=INV_LEVEL_SIGMA2[jnp.clip(state.kf_level[cam_kf], 0, N_LEVELS - 1)],
        is_stereo=state.kf_ur[cam_kf] >= 0,
        valid=obs_valid,
        cam_fixed=cam_fixed,
        K=K,
        bf=bf,
    )
    return WindowBuild(
        win=win, cam_kf=cam_kf, cam_used=cam_used,
        pt_sel=pt_sel, pt_sel_valid=pt_sel_valid, kf_mp_w=kf_mp_w,
    )


def writeback_local_ba(state: MapState, wb: WindowBuild, poses, points, valid):
    """Apply optimized window results to the map: poses/points written back,
    outlier observations detached (reference erases outlier edges after BA,
    src/Optimizer.cc:711-737)."""
    Kmax, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    kf_pose = state.kf_pose.at[
        jnp.where(wb.cam_used & ~wb.win.cam_fixed, wb.cam_kf, Kmax)
    ].set(poses, mode="drop")
    mp_pos = state.mp_pos.at[jnp.where(wb.pt_sel_valid, wb.pt_sel, M)].set(
        points, mode="drop"
    )
    killed = wb.win.valid & ~valid  # (C,N)
    new_rows = jnp.where(killed, -1, wb.kf_mp_w)
    kf_mp = state.kf_mp.at[jnp.where(wb.cam_used, wb.cam_kf, Kmax)].set(
        new_rows, mode="drop"
    )
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos, kf_mp=kf_mp)


def local_bundle_adjustment_impl(state: MapState, kf_id: jax.Array, K: jax.Array, bf: jax.Array):
    """Windowed local BA (Optimizer::LocalBundleAdjustment,
    src/Optimizer.cc:453-780).

    Uses the camera-major structured window (ba.BAWindow): the observation
    set is exactly (window camera, keypoint slot), so no edge-list sort is
    needed and the Schur blocks assemble with one packed gather.

    Raw (untraced) body; use `local_bundle_adjustment` (donating jit) on the
    linear synchronous path, or call this from a larger fused program (e.g.
    frontend.mapping_pipeline, where the input snapshot is shared with the
    tracking thread and must NOT be donated). Multi-device deployments route
    the solve through `parallel.dist_ba` instead — see
    `local_bundle_adjustment_dist`."""
    wb = build_local_ba_window(state, kf_id, K, bf)
    win2, cost = ba.bundle_adjust_window(wb.win, iters1=4, iters2=6)
    state = writeback_local_ba(state, wb, win2.poses, win2.points, win2.valid)
    return state, cost


# Donating jit for the linear synchronous path (tracking thread owns the
# state and never re-reads the input snapshot).
local_bundle_adjustment = jax.jit(local_bundle_adjustment_impl, donate_argnames=("state",))


# ---------------------------------------------------------------------------
# Multi-device local BA: the same window solved by the psum-sharded engine
# (parallel/dist_ba.py) — observations sharded over the mesh, reduced camera
# system all-reduced over ICI (SURVEY §2.3's distributed-BA mapping).
# ---------------------------------------------------------------------------


def window_to_obs(win: ba.BAWindow) -> ba.Obs:
    """Flatten the camera-major (C,N) window into a COO edge list for the
    observation-sharded solver. C*N stays fixed, so the shard layout is
    static across calls."""
    C, N = win.valid.shape
    P = win.points.shape[0]
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, (C, N), 0)
    return ba.Obs(
        cam_idx=cam_iota.reshape(-1),
        pt_idx=jnp.where(win.valid, jnp.minimum(win.pt_idx, P - 1), 0).reshape(-1),
        target=win.target.reshape(-1, 3),
        inv_sigma2=win.inv_sigma2.reshape(-1),
        is_stereo=win.is_stereo.reshape(-1),
        valid=win.valid.reshape(-1),
    )


_DIST_LBA_CACHE: dict = {}


def local_bundle_adjustment_dist(state: MapState, kf_id, K, bf, mesh):
    """Local BA routed through the sharded LM engine on `mesh`.

    Three dispatches at keyframe cadence: jitted window build -> sharded
    solve (obs axis over the mesh) -> jitted write-back. Same LM budget as
    the single-device path (4 robust + 6 plain iterations)."""
    from ..parallel import dist_ba

    wb = _build_local_ba_window_jit(state, jnp.int32(kf_id), K, bf)
    key = (id(mesh), tuple(mesh.devices.flat))
    solve = _DIST_LBA_CACHE.get(key)
    if solve is None:
        solve = dist_ba.make_sharded_bundle_adjust(mesh, iters1=4, iters2=6)
        _DIST_LBA_CACHE[key] = solve
    obs = _window_obs_jit(wb.win)
    poses, points, valid, cost = solve(
        wb.win.poses, wb.win.points, obs, wb.win.cam_fixed, K, bf
    )
    C, N = wb.win.valid.shape
    state = _writeback_local_ba_jit(state, wb, poses, points, valid.reshape(C, N))
    return state, cost


_build_local_ba_window_jit = jax.jit(build_local_ba_window)
_window_obs_jit = jax.jit(window_to_obs)
_writeback_local_ba_jit = jax.jit(writeback_local_ba, donate_argnames=("state",))
