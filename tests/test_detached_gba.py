"""Detached, abortable global BA (the reference's per-loop GBA thread with
mbStopGBA + mTcwGBA/mPosGBA staging, src/LoopClosing.cc:588,654-758):
chunked solve on a snapshot, cooperative abort, and merge-with-staging for
keyframes/points born during the solve."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import loop_closing
from orb_slam2v2_1_tpu.models.map_state import append_keyframe, refresh_covis
from orb_slam2v2_1_tpu.models.offline import _CellBox
from orb_slam2v2_1_tpu.ops import lie
from tests.test_dist_ba import synthetic_map_state, _copy_state, K, BF


def _with_born_keyframe(state, rng):
    """Append one keyframe AFTER the snapshot (the 'born during GBA' case):
    child of the newest existing keyframe, displaced by a known relative
    transform."""
    Kcap, N = state.kf_mp.shape
    newest = int(np.argmax(np.where(np.asarray(state.kf_valid),
                                    np.asarray(state.kf_seq), -1)))
    T_rel = np.asarray(lie.se3_exp(jnp.asarray([0.05, 0, 0, 0, 0.01, 0],
                                               jnp.float32)))
    pose = jnp.asarray(T_rel) @ state.kf_pose[newest]
    # Observe the same points as the parent so covisibility parents it there.
    mp_ids = state.kf_mp[newest]
    state2, kf_new = append_keyframe(
        state, pose, jnp.int32(999), state.kf_xy[newest],
        state.kf_level[newest], state.kf_angle[newest],
        state.kf_desc[newest], state.kf_kp_valid[newest],
        state.kf_ur[newest], mp_ids,
    )
    state2 = refresh_covis(state2)
    return state2, int(kf_new), newest, T_rel


class TestMergeStaging:
    def test_born_keyframe_rides_parent_correction(self, rng):
        state = synthetic_map_state(rng)
        snap = _copy_state(state)

        # Solve on the snapshot.
        prob = loop_closing.build_global_ba_problem(snap, K, BF)
        s_opt, _ = loop_closing.global_bundle_adjustment(_copy_state(snap), K, BF)

        # Meanwhile the live map gained a keyframe.
        live, kf_new, parent, T_rel = _with_born_keyframe(state, rng)
        assert int(live.kf_parent[kf_new]) == parent

        merged = loop_closing.merge_gba_into_live(
            live, snap.kf_seq, snap.kf_valid, snap.mp_first_seq,
            snap.mp_valid, s_opt.kf_pose, s_opt.mp_pos, prob.cam_fixed,
        )
        # Snapshot-era keyframes took their optimized poses.
        for i in range(8):
            if i == 0:
                continue  # anchor (fixed) keeps its pose
            np.testing.assert_allclose(
                np.asarray(merged.kf_pose[i]), np.asarray(s_opt.kf_pose[i]),
                atol=1e-6,
            )
        # The born keyframe was re-anchored: T_new = T_rel @ T_parent_new.
        expect = T_rel @ np.asarray(merged.kf_pose[parent])
        np.testing.assert_allclose(
            np.asarray(merged.kf_pose[kf_new]), expect, atol=1e-5
        )

    def test_slot_reuse_not_misidentified(self, rng):
        """A slot whose kf_seq changed (culled + reused during the solve)
        must NOT take the stale optimized pose for that slot."""
        state = synthetic_map_state(rng)
        snap = _copy_state(state)
        prob = loop_closing.build_global_ba_problem(snap, K, BF)
        s_opt, _ = loop_closing.global_bundle_adjustment(_copy_state(snap), K, BF)

        # Simulate reuse: slot 3 now holds a DIFFERENT keyframe (new seq),
        # parented to slot 2.
        reused_pose = jnp.asarray(
            np.asarray(lie.se3_exp(jnp.asarray([0.3, 0, 0, 0, 0, 0],
                                               jnp.float32))), jnp.float32
        ) @ state.kf_pose[2]
        live = state._replace(
            kf_pose=state.kf_pose.at[3].set(reused_pose),
            kf_seq=state.kf_seq.at[3].set(jnp.int32(100)),
            kf_parent=state.kf_parent.at[3].set(2),
        )
        merged = loop_closing.merge_gba_into_live(
            live, snap.kf_seq, snap.kf_valid, snap.mp_first_seq,
            snap.mp_valid, s_opt.kf_pose, s_opt.mp_pos, prob.cam_fixed,
        )
        # Slot 3 must NOT equal the optimized pose of the OLD keyframe; it
        # must ride its parent's correction instead.
        T_rel = np.asarray(reused_pose) @ np.linalg.inv(
            np.asarray(state.kf_pose[2])
        )
        expect = T_rel @ np.asarray(merged.kf_pose[2])
        np.testing.assert_allclose(
            np.asarray(merged.kf_pose[3]), expect, atol=1e-5
        )


class TestRunner:
    def test_completes_and_merges(self, rng):
        state = synthetic_map_state(rng)
        runner = loop_closing.GlobalBARunner(K, BF, chunk_iters=3)
        runner.start(state)
        runner.join()
        assert not runner.aborted
        assert runner.result is not None

        lc = loop_closing.LoopCloser(None, None, True, K, BF)
        lc.gba_runner = runner
        lc.detached_gba = True
        box = _CellBox(_copy_state(state))
        assert lc.service_gba(box)  # merged
        assert lc.n_gba_merged == 1
        # The merge actually moved the perturbed poses.
        assert (
            np.abs(np.asarray(box.state.kf_pose) - np.asarray(state.kf_pose)).max()
            > 1e-5
        )

    def test_abort_between_chunks(self, rng):
        # Big enough that the solve spans several chunks on CPU.
        state = synthetic_map_state(
            rng, n_kf=16, n_pts=2048, Kcap=32, Mcap=4096, N=256
        )
        runner = loop_closing.GlobalBARunner(K, BF, chunk_iters=1)
        runner.start(state)
        runner.abort()  # mbStopGBA
        runner.join()
        assert runner.aborted
        assert runner.result is None

    def test_second_loop_aborts_inflight(self, rng):
        """CorrectLoop arriving mid-GBA aborts the running solve and starts a
        fresh one on the corrected map (src/LoopClosing.cc:424-434)."""
        state = synthetic_map_state(
            rng, n_kf=16, n_pts=2048, Kcap=32, Mcap=4096, N=256
        )
        lc = loop_closing.LoopCloser(None, None, True, K, BF)
        lc.enable_detached_gba(chunk_iters=1)
        box = _CellBox(state)

        lc._gba_pending = True
        lc.service_gba(box)  # starts run 1
        assert lc.gba_runner.running or lc.gba_runner.result is not None

        lc._gba_pending = True  # a second loop closed
        lc.service_gba(box)  # aborts run 1 (if still going), starts run 2
        assert lc.gba_runner.n_runs == 2
        lc.finalize_gba(box)
        assert lc.n_gba_merged == 1  # only the second run's result lands
        assert np.isfinite(np.asarray(box.state.kf_pose)).all()
