"""The map as pure array state: keyframes, map points, observations.

TPU-native replacement for the reference's pointer-graph map model
(`Map` src/Map.cc, `KeyFrame` src/KeyFrame.cc, `MapPoint` src/MapPoint.cc):
no objects, no mutexes — one immutable NamedTuple of fixed-capacity arrays,
updated functionally by jitted programs. Capacity is preallocated; `kf_valid`
/ `mp_valid` masks replace SetBadFlag-style deletion, and free slots are
reused by compaction (SURVEY §7 "dynamic map growth vs static shapes").

Observations are stored forward: `kf_mp[k, i]` = map-point id observed by
keypoint slot i of keyframe k (-1 if none) — the analog of
`Frame::mvpMapPoints`. The reverse index (MapPoint::GetObservations) and the
covisibility graph (KeyFrame::GetVectorCovisibleKeyFrames) are *derived* on
device: the covisibility weight matrix is one incidence matmul, replacing
`KeyFrame::UpdateConnections` (src/KeyFrame.cc:290-380).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapState(NamedTuple):
    # --- keyframes (capacity K, feature slots N) ---
    kf_pose: jax.Array  # (K,4,4) f32 Tcw
    kf_valid: jax.Array  # (K,) bool
    kf_frame_id: jax.Array  # (K,) i32 source frame id
    kf_xy: jax.Array  # (K,N,2) f32 undistorted level-0 keypoint coords
    kf_level: jax.Array  # (K,N) i32
    kf_angle: jax.Array  # (K,N) f32
    kf_desc: jax.Array  # (K,N,8) uint32 packed descriptors
    kf_kp_valid: jax.Array  # (K,N) bool
    kf_ur: jax.Array  # (K,N) f32 stereo right-u (-1 mono)
    kf_mp: jax.Array  # (K,N) i32 keypoint -> map point id (-1 none)
    # Spanning tree (KeyFrame::mpParent, reference src/KeyFrame.cc:382-417):
    # parent = best-covisible existing keyframe at insertion; culling
    # re-parents children (SetBadFlag, src/KeyFrame.cc:486-536).
    kf_parent: jax.Array  # (K,) i32 parent slot (-1 root)
    # Monotone insertion sequence number: slot ids are REUSED after culling
    # (the free-list replacing Map::EraseKeyFrame, src/Map.cc:60-75), so age
    # ordering must come from kf_seq, never from the slot id.
    kf_seq: jax.Array  # (K,) i32 (-1 unused slot)
    # --- map points (capacity M) ---
    mp_pos: jax.Array  # (M,3) f32 world
    mp_valid: jax.Array  # (M,) bool
    mp_desc: jax.Array  # (M,8) uint32 distinctive descriptor
    mp_normal: jax.Array  # (M,3) f32 mean viewing direction
    mp_min_dist: jax.Array  # (M,) f32 scale-invariance band
    mp_max_dist: jax.Array  # (M,) f32
    mp_visible: jax.Array  # (M,) i32 Increase/Found ratio bookkeeping
    mp_found: jax.Array  # (M,) i32
    mp_first_kf: jax.Array  # (M,) i32 creating keyframe slot
    mp_first_seq: jax.Array  # (M,) i32 creating keyframe's kf_seq (for age)
    # Persistent loop edges (KeyFrame::mspLoopEdges, reference
    # src/KeyFrame.cc:419-430): every accepted closure adds one (cur, loop)
    # pair; the essential graph includes ALL of them, not just the newest
    # (src/Optimizer.cc:842-879). Keyframes on a loop edge are never culled.
    loop_edges: jax.Array  # (LOOP_EDGE_CAP, 2) i32 (-1 unused)
    n_loop_edges: jax.Array  # () i32
    # --- cached derived structure ---
    # Covisibility weights, refreshed once per keyframe-insertion round
    # (refresh_covis). The per-frame tracking path reads this cache instead
    # of recomputing the (K,M)x(M,K) incidence matmul every frame; mapping
    # stages that need an exact, current row use row_covisibility.
    covis: jax.Array  # (K,K) i32
    # --- counters (device scalars so programs stay jittable) ---
    n_kf: jax.Array  # () i32 keyframe slot high-water mark
    n_mp: jax.Array  # () i32 map-point slot high-water mark
    n_seq: jax.Array  # () i32 total keyframes ever inserted

    @property
    def max_kf(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def max_mp(self) -> int:
        return self.mp_pos.shape[0]

    @property
    def n_kp(self) -> int:
        return self.kf_xy.shape[1]


LOOP_EDGE_CAP = 32


def empty_map(max_kf: int = 256, max_mp: int = 32768, n_kp: int = 1024) -> MapState:
    K, M, N = max_kf, max_mp, n_kp
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, jnp.int32),
        kf_xy=jnp.zeros((K, N, 2), jnp.float32),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), jnp.float32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_ur=jnp.full((K, N), -1.0, jnp.float32),
        kf_mp=jnp.full((K, N), -1, jnp.int32),
        kf_parent=jnp.full(K, -1, jnp.int32),
        kf_seq=jnp.full(K, -1, jnp.int32),
        mp_pos=jnp.zeros((M, 3), jnp.float32),
        mp_valid=jnp.zeros(M, bool),
        mp_desc=jnp.zeros((M, 8), jnp.uint32),
        mp_normal=jnp.zeros((M, 3), jnp.float32),
        mp_min_dist=jnp.zeros(M, jnp.float32),
        mp_max_dist=jnp.full(M, jnp.inf, jnp.float32),
        mp_visible=jnp.ones(M, jnp.int32),
        mp_found=jnp.ones(M, jnp.int32),
        mp_first_kf=jnp.full(M, -1, jnp.int32),
        mp_first_seq=jnp.zeros(M, jnp.int32),
        loop_edges=jnp.full((LOOP_EDGE_CAP, 2), -1, jnp.int32),
        n_loop_edges=jnp.int32(0),
        covis=jnp.zeros((K, K), jnp.int32),
        n_kf=jnp.int32(0),
        n_mp=jnp.int32(0),
        n_seq=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Derived graph structure
# ---------------------------------------------------------------------------

@jax.jit
def covisibility(state: MapState) -> jax.Array:
    """(K, K) int32 — number of map points shared by each keyframe pair.

    One incidence matmul replaces the reference's per-KF observation-walk +
    weight-map (`KeyFrame::UpdateConnections`, src/KeyFrame.cc:290-380).
    Diagonal is zeroed.
    """
    K, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    mp = jnp.where(state.kf_kp_valid & (state.kf_mp >= 0), state.kf_mp, M)
    # Incidence (K, M+1) in bf16 via scatter; slot M collects invalid.
    inc = jnp.zeros((K, M + 1), jnp.bfloat16)
    inc = inc.at[jnp.arange(K)[:, None], mp].set(1.0)
    inc = inc[:, :M] * state.mp_valid[None, :].astype(jnp.bfloat16)
    C = jnp.dot(inc, inc.T, preferred_element_type=jnp.float32).astype(jnp.int32)
    C = C * (state.kf_valid[:, None] & state.kf_valid[None, :])
    return C * (1 - jnp.eye(K, dtype=jnp.int32))


def row_covisibility(state: MapState, kf: jax.Array) -> jax.Array:
    """(K,) int32 — shared-point counts between keyframe `kf` and every other
    keyframe, computed fresh in O(K*N) (no incidence matmul).

    Exact replacement for `covisibility(state)[kf]` used by the mapping
    stages right after structural changes, when the cached `state.covis` is
    stale."""
    M = state.mp_pos.shape[0]
    row = state.kf_mp[kf]
    row_ok = (row >= 0) & state.kf_kp_valid[kf]
    in_row = (
        jnp.zeros(M + 1, bool)
        .at[jnp.where(row_ok, row, M)]
        .set(True)[:M]
        & state.mp_valid
    )
    shared = (
        in_row[jnp.maximum(state.kf_mp, 0)]
        & (state.kf_mp >= 0)
        & state.kf_kp_valid
    )
    votes = jnp.sum(shared, axis=1).astype(jnp.int32) * state.kf_valid
    return votes.at[kf].set(0) * state.kf_valid[kf]


def refresh_covis(state: MapState) -> MapState:
    """Recompute the cached covisibility matrix (once per mapping round)."""
    return state._replace(covis=covisibility(state))


@jax.jit
def mp_observation_count(state: MapState) -> jax.Array:
    """(M,) int32 — number of keyframes observing each map point
    (MapPoint::Observations analog)."""
    M = state.mp_pos.shape[0]
    mp = jnp.where(
        state.kf_kp_valid & (state.kf_mp >= 0) & state.kf_valid[:, None],
        state.kf_mp,
        M,
    )
    counts = jnp.zeros(M + 1, jnp.int32).at[mp.reshape(-1)].add(1)
    return counts[:M] * state.mp_valid


@partial(jax.jit, donate_argnames=("state",))
def append_keyframe(
    state: MapState,
    pose: jax.Array,
    frame_id: jax.Array,
    xy: jax.Array,
    level: jax.Array,
    angle: jax.Array,
    desc: jax.Array,
    kp_valid: jax.Array,
    ur: jax.Array,
    mp_ids: jax.Array,
) -> tuple[MapState, jax.Array]:
    """Insert a keyframe at the FIRST FREE slot (free-list reuse of culled
    slots — the Map::EraseKeyFrame + new-KeyFrame allocation cycle,
    src/Map.cc:60-75) and attach it to the spanning tree: parent = the
    keyframe sharing the most map points (KeyFrame::UpdateConnections first
    call, src/KeyFrame.cc:290-380). Returns (state, kf_id). Callers guard
    capacity (a full map refuses insertion)."""
    k = jnp.argmin(state.kf_valid)  # first free slot (False sorts first)

    # Parent: most shared map points with the new keyframe's associations.
    M = state.mp_pos.shape[0]
    in_new = (
        jnp.zeros(M + 1, bool)
        .at[jnp.where((mp_ids >= 0) & kp_valid, mp_ids, M)]
        .set(True)[:M]
        & state.mp_valid
    )
    shared = (
        in_new[jnp.maximum(state.kf_mp, 0)]
        & (state.kf_mp >= 0)
        & state.kf_kp_valid
    )
    votes = jnp.sum(shared, axis=1).astype(jnp.int32) * state.kf_valid
    parent = jnp.argmax(votes).astype(jnp.int32)
    parent = jnp.where(votes[parent] > 0, parent, -1)

    return (
        state._replace(
            kf_pose=state.kf_pose.at[k].set(pose),
            kf_valid=state.kf_valid.at[k].set(True),
            kf_frame_id=state.kf_frame_id.at[k].set(frame_id),
            kf_xy=state.kf_xy.at[k].set(xy),
            kf_level=state.kf_level.at[k].set(level),
            kf_angle=state.kf_angle.at[k].set(angle),
            kf_desc=state.kf_desc.at[k].set(desc),
            kf_kp_valid=state.kf_kp_valid.at[k].set(kp_valid),
            kf_ur=state.kf_ur.at[k].set(ur),
            kf_mp=state.kf_mp.at[k].set(mp_ids),
            kf_parent=state.kf_parent.at[k].set(parent),
            kf_seq=state.kf_seq.at[k].set(state.n_seq),
            n_kf=jnp.maximum(state.n_kf, k + 1),
            n_seq=state.n_seq + 1,
        ),
        k,
    )


def update_mp_stats(state: MapState) -> MapState:
    """Recompute distinctive descriptors, normals and scale bands for all
    valid map points from their observations.

    Batched analog of `MapPoint::ComputeDistinctiveDescriptors`
    (src/MapPoint.cc:252-318: min-median-Hamming representative) and
    `UpdateNormalAndDepth` (src/MapPoint.cc:340-383). For speed we use the
    min-*mean*-distance representative over up to OBS_CAP observations —
    same intent (most central descriptor), cheaper than median.
    """
    return _update_mp_stats_jit(state)


OBS_CAP = 12  # max observations considered per point for stats


@partial(jax.jit, donate_argnames=("state",))
def _update_mp_stats_jit(state: MapState, scale: float = 1.2):
    from ..ops import hamming

    K, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    flat_mp = jnp.where(
        state.kf_kp_valid & state.kf_valid[:, None], state.kf_mp, -1
    ).reshape(-1)  # (K*N,)

    # For each map point, gather up to OBS_CAP observing (kf, slot) pairs:
    # rank observations by flat index per point via a stable segment trick.
    order = jnp.argsort(jnp.where(flat_mp >= 0, flat_mp, M).astype(jnp.int32), stable=True)
    sorted_mp = jnp.where(flat_mp >= 0, flat_mp, M)[order]
    # position within segment
    seg_start = jnp.searchsorted(sorted_mp, jnp.arange(M))  # (M,)
    obs_idx = seg_start[:, None] + jnp.arange(OBS_CAP)[None, :]  # (M, OBS_CAP)
    obs_idx = jnp.clip(obs_idx, 0, K * N - 1)
    obs_flat = order[obs_idx]  # flat (kf*N + slot)
    obs_ok = (sorted_mp[jnp.clip(obs_idx, 0, K * N - 1)] == jnp.arange(M)[:, None])
    obs_kf = obs_flat // N
    obs_slot = obs_flat % N

    # Descriptors of the observations.
    descs = state.kf_desc[obs_kf, obs_slot]  # (M, OBS_CAP, 8)
    pm1 = hamming.unpack_pm1(descs.reshape(-1, 8)).reshape(M, OBS_CAP, 256)
    # Pairwise distances within each point's observation set.
    D = jnp.einsum("mac,mbc->mab", pm1, pm1, preferred_element_type=jnp.float32)
    D = (256.0 - D) * 0.5
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    mean_d = jnp.sum(jnp.where(pair_ok, D, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(pair_ok, axis=-1), 1
    )
    mean_d = jnp.where(obs_ok, mean_d, jnp.inf)
    rep = jnp.argmin(mean_d, axis=-1)  # (M,)
    new_desc = descs[jnp.arange(M), rep]
    any_obs = jnp.any(obs_ok, axis=-1)
    mp_desc = jnp.where(any_obs[:, None], new_desc, state.mp_desc)

    # Normals: mean unit vector from observing camera centers to the point.
    # Camera center in world = -R^T t.
    Twc_t = -jnp.einsum(
        "kij,ki->kj", state.kf_pose[:, :3, :3], state.kf_pose[:, :3, 3]
    )
    centers = Twc_t[obs_kf]  # (M, OBS_CAP, 3)
    vec = state.mp_pos[:, None, :] - centers
    vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(obs_ok[..., None], vec, 0.0), axis=1)
    n_obs = jnp.maximum(jnp.sum(obs_ok, axis=-1), 1)
    normal = normal / n_obs[:, None]
    norm_len = jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    mp_normal = jnp.where(any_obs[:, None], normal / norm_len, state.mp_normal)

    # Scale-invariance band from the reference observation (the rep's kf):
    # maxDist = dist * scale^level, minDist = maxDist / scale^(nlevels-1)
    # (src/MapPoint.cc:372-377).
    ref_kf = obs_kf[jnp.arange(M), rep]
    ref_slot = obs_slot[jnp.arange(M), rep]
    ref_center = Twc_t[ref_kf]
    dist = jnp.linalg.norm(state.mp_pos - ref_center, axis=-1)
    ref_level = state.kf_level[ref_kf, ref_slot]
    max_dist = dist * scale ** ref_level.astype(jnp.float32)
    min_dist = max_dist / scale ** 7.0
    return state._replace(
        mp_desc=mp_desc,
        mp_normal=mp_normal,
        mp_max_dist=jnp.where(any_obs, max_dist * 1.2, state.mp_max_dist),
        mp_min_dist=jnp.where(any_obs, min_dist * 0.8, state.mp_min_dist),
    )


@partial(jax.jit, donate_argnames=("state",))
def update_mp_stats_window(state: MapState, kf_id: jax.Array, scale: float = 1.2):
    """Refresh stats for ONLY the points observed by keyframe `kf_id`.

    Every point whose observation set changed during a mapping round
    (created, depth-densified, fuse winner, newly associated) appears in
    that keyframe's row, so this covers exactly the reference's update set
    (MapPoint::ComputeDistinctiveDescriptors / UpdateNormalAndDepth are
    called per touched point, src/LocalMapping.cc:168-171,404-407,530-537)
    at ~1/16 the cost of the full-map pass: the observation search runs over
    the OBS_CAP best covisible rows instead of argsorting all K*N slots.
    """
    from ..ops import hamming

    K, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    J = min(OBS_CAP, K)

    # Observing keyframes considered: kf_id + its best covisible neighbors
    # (a point in kf_id's row can only be observed by covisible keyframes).
    row_w = row_covisibility(state, kf_id).at[kf_id].set(1 << 20)
    _, obs_kfs = jax.lax.top_k(jnp.where(state.kf_valid, row_w, -1), J)  # (J,)

    # Per-row inverse index: point id -> keypoint slot within that row.
    rows_mp = state.kf_mp[obs_kfs]  # (J,N)
    rows_ok = (
        state.kf_kp_valid[obs_kfs]
        & (rows_mp >= 0)
        & state.kf_valid[obs_kfs][:, None]
    )
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (J, N), 0)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (J, N), 1)
    inv = (
        jnp.full((J, M + 1), N, jnp.int32)
        .at[j_iota, jnp.where(rows_ok, rows_mp, M)]
        .set(slot_iota)
    )

    sub = state.kf_mp[kf_id]  # (N,) point ids under refresh (-1 = none)
    sub_ok = (
        (sub >= 0)
        & state.kf_kp_valid[kf_id]
        & state.mp_valid[jnp.maximum(sub, 0)]
    )
    subc = jnp.maximum(sub, 0)
    obs_slot = inv[:, :M][jnp.arange(J)[:, None], subc[None, :]].T  # (N,J)
    obs_ok = (obs_slot < N) & sub_ok[:, None]
    obs_kf = jnp.broadcast_to(obs_kfs[None, :], (N, J))
    obs_slot_c = jnp.minimum(obs_slot, N - 1)

    descs = state.kf_desc[obs_kf, obs_slot_c]  # (N,J,8)
    pm1 = hamming.unpack_pm1(descs.reshape(-1, 8)).reshape(N, J, 256)
    D = jnp.einsum("mac,mbc->mab", pm1, pm1, preferred_element_type=jnp.float32)
    D = (256.0 - D) * 0.5
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    mean_d = jnp.sum(jnp.where(pair_ok, D, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(pair_ok, axis=-1), 1
    )
    mean_d = jnp.where(obs_ok, mean_d, jnp.inf)
    rep = jnp.argmin(mean_d, axis=-1)  # (N,)
    new_desc = descs[jnp.arange(N), rep]
    any_obs = jnp.any(obs_ok, axis=-1)

    Twc_t = -jnp.einsum(
        "kij,ki->kj",
        state.kf_pose[obs_kfs][:, :3, :3],
        state.kf_pose[obs_kfs][:, :3, 3],
    )  # (J,3) observing camera centers in world
    centers = Twc_t[None, :, :]  # (1,J,3) broadcast over points
    pos = state.mp_pos[subc]  # (N,3)
    vec = pos[:, None, :] - centers
    vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(obs_ok[..., None], vec, 0.0), axis=1)
    n_obs = jnp.maximum(jnp.sum(obs_ok, axis=-1), 1)
    normal = normal / n_obs[:, None]
    norm_len = jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    new_normal = normal / norm_len

    ref_j = rep
    ref_center = Twc_t[ref_j]  # (N,3)
    dist = jnp.linalg.norm(pos - ref_center, axis=-1)
    ref_level = state.kf_level[obs_kfs[ref_j], obs_slot_c[jnp.arange(N), ref_j]]
    max_dist = dist * scale ** ref_level.astype(jnp.float32)
    min_dist = max_dist / scale ** 7.0

    upd = any_obs & sub_ok
    tgt = jnp.where(upd, sub, M)  # park non-updates out of range
    return state._replace(
        mp_desc=state.mp_desc.at[tgt].set(new_desc, mode="drop"),
        mp_normal=state.mp_normal.at[tgt].set(new_normal, mode="drop"),
        mp_max_dist=state.mp_max_dist.at[tgt].set(max_dist * 1.2, mode="drop"),
        mp_min_dist=state.mp_min_dist.at[tgt].set(min_dist * 0.8, mode="drop"),
    )
