"""Map lifecycle: slot reuse, spanning tree, keyframe erase, trajectory
redirect — the Map::EraseKeyFrame + KeyFrame::SetBadFlag free-list analog
(reference src/Map.cc:60-75, src/KeyFrame.cc:432-546)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.models import local_mapping
from orb_slam2v2_1_tpu.models.map_state import (
    append_keyframe,
    empty_map,
    refresh_covis,
)
from orb_slam2v2_1_tpu.utils.trajectory import Trajectory


def _mini_map(n_kf=4, n_shared=24):
    """A tiny map where every keyframe observes the same n_shared points
    (maximal redundancy)."""
    state = empty_map(8, 64, 32)
    state = state._replace(
        mp_pos=state.mp_pos.at[:n_shared].set(
            jnp.asarray(np.random.default_rng(0).normal(0, 1, (n_shared, 3)))
        ),
        mp_valid=state.mp_valid.at[:n_shared].set(True),
        n_mp=jnp.int32(n_shared),
    )
    N = 32
    mp_ids = jnp.full(N, -1, jnp.int32).at[:n_shared].set(jnp.arange(n_shared))
    for k in range(n_kf):
        pose = jnp.eye(4).at[0, 3].set(0.1 * k)
        state, kf = append_keyframe(
            state, pose, jnp.int32(k * 3), jnp.zeros((N, 2)),
            jnp.zeros(N, jnp.int32), jnp.zeros(N), jnp.zeros((N, 8), jnp.uint32),
            jnp.ones(N, bool), jnp.full(N, -1.0), mp_ids,
        )
        assert int(kf) == k
    return refresh_covis(state)


class TestSpanningTree:
    def test_parent_assignment(self):
        state = _mini_map(3)
        par = np.asarray(state.kf_parent[:3])
        assert par[0] == -1  # root
        assert par[1] in (0,)  # best (only) covisible
        assert par[2] in (0, 1)
        assert np.all(np.asarray(state.kf_seq[:3]) == np.arange(3))

    def test_seq_monotone_across_reuse(self):
        state = _mini_map(4)
        state, victim, parent, _ = local_mapping.cull_keyframes(state, jnp.int32(3))
        v = int(victim)
        assert v >= 1  # a redundant non-root was erased
        # Reuse: next append lands in the freed slot with a fresh seq.
        N = 32
        state2, kf = append_keyframe(
            state, jnp.eye(4), jnp.int32(99), jnp.zeros((N, 2)),
            jnp.zeros(N, jnp.int32), jnp.zeros(N), jnp.zeros((N, 8), jnp.uint32),
            jnp.ones(N, bool), jnp.full(N, -1.0), jnp.full(N, -1, jnp.int32),
        )
        assert int(kf) == v
        assert int(state2.kf_seq[v]) == 4  # 5th insertion ever
        assert int(state2.n_kf) == 4  # high-water unchanged


class TestKeyframeErase:
    def test_cull_erases_and_reparents(self):
        state = _mini_map(4)
        poses_before = np.asarray(state.kf_pose)  # cull donates `state`
        kf_id = jnp.int32(3)
        state2, victim, parent, T_red = local_mapping.cull_keyframes(state, kf_id)
        v = int(victim)
        assert v >= 0 and v != 3
        assert not bool(state2.kf_valid[v])
        assert int(state2.kf_seq[v]) == -1
        assert np.all(np.asarray(state2.kf_mp[v]) == -1)
        # No surviving child points at the victim.
        live = np.where(np.asarray(state2.kf_valid))[0]
        assert all(int(state2.kf_parent[k]) != v for k in live)
        # Redirect transform maps parent pose to victim pose.
        T = np.asarray(T_red) @ poses_before[int(parent)]
        np.testing.assert_allclose(T, poses_before[v], atol=1e-5)

    def test_root_and_current_protected(self):
        state = _mini_map(3)
        state2, victim, _, _ = local_mapping.cull_keyframes(state, jnp.int32(2))
        assert int(victim) not in (0, 2)

    def test_loop_edge_keyframes_protected(self):
        state = _mini_map(4)
        state = state._replace(
            loop_edges=state.loop_edges.at[0].set(jnp.asarray([1, 2], jnp.int32)),
            n_loop_edges=jnp.int32(1),
        )
        state2, victim, _, _ = local_mapping.cull_keyframes(state, jnp.int32(3))
        assert int(victim) not in (1, 2)


class TestTrajectoryRedirect:
    def test_redirect_preserves_absolute_poses(self):
        rng = np.random.default_rng(1)
        kf_poses = np.stack([np.eye(4) for _ in range(3)])
        kf_poses[1][:3, 3] = rng.normal(0, 1, 3)
        kf_poses[2][:3, 3] = rng.normal(0, 1, 3)

        traj = Trajectory()
        Tcw_f = np.eye(4)
        Tcw_f[:3, 3] = [0.5, 0, 0]
        traj.append(0.0, 1, Tcw_f, kf_poses[1])
        before = traj.absolute_poses(kf_poses)

        # Erase KF1, redirect onto KF2.
        T_red = kf_poses[1] @ np.linalg.inv(kf_poses[2])
        traj.redirect_kf(1, 2, T_red)
        after = traj.absolute_poses(kf_poses)
        np.testing.assert_allclose(before[0][1], after[0][1], atol=1e-9)
        assert traj.entries[0].ref_kf == 2


class TestLongRunCapacity:
    """Keyframe count stays bounded by CULLING, not capacity, on a dense
    revisit trajectory (VERDICT r2 item 2)."""

    def test_bounded_by_culling(self):
        from orb_slam2v2_1_tpu.models import offline
        from orb_slam2v2_1_tpu.utils import synthetic
        from orb_slam2v2_1_tpu.utils.config import SlamConfig

        cfg = SlamConfig(
            fx=200.0, fy=200.0, cx=80.0, cy=60.0, width=160, height=120,
            n_features=256, max_keyframes=24, max_map_points=4096, fps=5.0,
            bf=16.0, th_depth=40.0,
        )
        rng = np.random.default_rng(3)
        scene = synthetic.make_desk(rng)
        # Dense oscillation: revisits the same viewpoints over and over.
        K = jnp.asarray(cfg.K)
        n_frames = 60
        poses = []
        for i in range(n_frames):
            t = 0.05 * np.sin(i * 0.3)
            T = np.eye(4)
            T[0, 3] = t
            poses.append(T)
        imgs, deps = [], []
        for T in poses:
            img, dep = synthetic.render(scene, jnp.asarray(T), K, cfg.width, cfg.height)
            imgs.append(np.asarray(img))
            deps.append(np.asarray(dep))
        poses_est, ok, state = offline.track_sequence_rgbd(
            np.stack(imgs), np.stack(deps), cfg
        )
        assert int(ok.sum()) >= n_frames * 0.9
        n_live = int(np.asarray(state.kf_valid).sum())
        # Redundant revisit keyframes must be culled: the map never hits
        # the capacity wall (24 - 2).
        assert n_live < cfg.max_keyframes - 2
        assert int(state.n_seq) > n_live  # culling actually happened
