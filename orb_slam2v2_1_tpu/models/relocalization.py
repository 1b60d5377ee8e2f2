"""Relocalization after tracking loss.

Replaces `Tracking::Relocalization` (reference src/Tracking.cc:1486-1648):
BoW candidate retrieval -> per-candidate descriptor matching (ratio 0.75) ->
batched DLT-RANSAC pose (EPnP analog) -> motion-only optimization with the
reference's >=50-inlier acceptance.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ba, hamming, matching, pnp, vocab as vocab_ops
from .map_state import MapState
from .tracking import FrameData, INV_LEVEL_SIGMA2, N_LEVELS, make_obs_from_frame


@partial(jax.jit, static_argnames=())
def _match_and_pnp(state: MapState, frame: FrameData, kf: jax.Array, K: jax.Array,
                   bf: jax.Array, key: jax.Array):
    """Match frame <-> candidate KF map points, run PnP RANSAC + pose opt."""
    N = frame.xy.shape[0]
    d_kf = hamming.unpack_pm1(state.kf_desc[kf])
    kf_has = (state.kf_mp[kf] >= 0) & state.kf_kp_valid[kf]
    mask = kf_has[:, None] & frame.kp_valid[None, :]
    m = matching.match_nn(d_kf, frame.desc_pm1, mask,
                          max_dist=matching.TH_LOW, nn_ratio=0.75)
    m = matching.resolve_duplicates(m.idx, m.dist, m.ok, N)

    # 2D-3D correspondences on frame slots.
    frame_mp = jnp.full(N, -1, jnp.int32)
    frame_mp = frame_mp.at[jnp.where(m.ok, m.idx, N)].set(
        jnp.where(m.ok, state.kf_mp[kf], -1), mode="drop"
    )
    has = frame_mp >= 0
    pw = state.mp_pos[jnp.maximum(frame_mp, 0)]
    inv_s2 = INV_LEVEL_SIGMA2[jnp.clip(frame.level, 0, N_LEVELS - 1)]

    res = pnp.pnp_ransac(pw, frame.xy, inv_s2, has, K, key)

    # Refine with the 4-round gated pose optimization.
    obs = make_obs_from_frame(frame.xy, frame.ur, frame.level, frame_mp,
                              frame.kp_valid & res.inliers)
    Tcw, inlier_mask, n_inl = ba.pose_optimization(res.Tcw, state.mp_pos, obs, K, bf)
    frame_mp = jnp.where(inlier_mask | (frame_mp < 0), frame_mp, -1)

    # Guided widening cascade (src/Tracking.cc:1586-1633): with a coarse
    # pose in hand, project ALL the candidate keyframe's map points into the
    # frame (radius 10) to recover matches the ratio-test search missed,
    # then re-optimize. The reference runs this whenever the first pass
    # lands in (10, 50) inliers; running it unconditionally is the same
    # result with fixed-shape control flow.
    from ..ops.projection import project
    from .tracking import SCALE

    q_mp_kf = state.kf_mp[kf]
    q_ok = kf_has & state.mp_valid[jnp.maximum(q_mp_kf, 0)]
    pw_kf = state.mp_pos[jnp.maximum(q_mp_kf, 0)]
    uv = project(Tcw, pw_kf, K)
    z = (Tcw[2, :3] @ pw_kf.T) + Tcw[2, 3]
    M = state.mp_pos.shape[0]
    already = jnp.zeros(M + 1, bool).at[
        jnp.where(frame_mp >= 0, frame_mp, M)
    ].set(True)
    mm = matching.match_projection(
        q_desc=d_kf,
        q_xy_pred=uv,
        q_level_pred=state.kf_level[kf],
        q_valid=q_ok & (z > 0) & ~already[jnp.maximum(q_mp_kf, 0)],
        t_desc=frame.desc_pm1,
        t_xy=frame.xy,
        t_level=frame.level,
        t_valid=frame.kp_valid & (frame_mp < 0),
        radius=10.0 * SCALE ** jnp.clip(
            state.kf_level[kf], 0, N_LEVELS - 1
        ).astype(jnp.float32),
        max_dist=matching.TH_HIGH,
        nn_ratio=1.0,
    )
    frame_mp2 = frame_mp.at[jnp.where(mm.ok, mm.idx, N)].set(
        jnp.where(mm.ok, q_mp_kf, -1), mode="drop"
    )
    obs2 = make_obs_from_frame(frame.xy, frame.ur, frame.level, frame_mp2,
                               frame.kp_valid)
    Tcw2, inlier2, n_inl2 = ba.pose_optimization(Tcw, state.mp_pos, obs2, K, bf)
    frame_mp2 = jnp.where(inlier2 | (frame_mp2 < 0), frame_mp2, -1)
    better = n_inl2 >= n_inl
    Tcw = jnp.where(better, Tcw2, Tcw)
    frame_mp = jnp.where(better, frame_mp2, frame_mp)
    n_inl = jnp.maximum(n_inl2, n_inl)
    return res.success, Tcw, frame_mp, n_inl


def relocalize(state: MapState, db, voc, frame: FrameData, K, bf, frame_id: int):
    """Host loop over the strongest BoW candidates; accept at >=50 inliers
    (src/Tracking.cc:1637-1644). Returns (ok, Tcw, frame_mp, ref_kf)."""
    from . import keyframe_database as kdb

    words = vocab_ops.assign_words(voc, frame.desc_pm1)
    scores, cand = kdb.detect_reloc_candidates(
        db, state, words, frame.kp_valid, voc.word_weight
    )
    sc = np.asarray(scores)
    cand_ids = np.where(np.asarray(cand))[0]
    if len(cand_ids) == 0:
        return False, None, None, None
    order = cand_ids[np.argsort(-sc[cand_ids])][:5]
    for kf in order:
        success, Tcw, frame_mp, n_inl = _match_and_pnp(
            state, frame, jnp.int32(int(kf)), K, bf,
            jax.random.key(frame_id * 97 + int(kf)),
        )
        # Accept on the refined inlier count alone (reference nGood>=50,
        # src/Tracking.cc:1637-1644): 50 observations inside the chi2 gate
        # after 4 rounds of re-classification IS the pose verification; the
        # RANSAC convergence flag is a seed-dependent early-exit signal, not
        # a quality statement.
        if int(n_inl) >= 50:
            return True, Tcw, frame_mp, int(kf)
    return False, None, None, None
