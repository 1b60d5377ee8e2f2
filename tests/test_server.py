"""Multi-session map server tests (SURVEY §2.3 L7: delta streaming, per-client
ServerMap mirrors, cross-session merge)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models.map_state import empty_map, append_keyframe
from orb_slam2v2_1_tpu.ops import lie
from orb_slam2v2_1_tpu.parallel import server as srv

K = jnp.array([500.0, 500.0, 320.0, 240.0])


def _session_map(rng, T_world, n_kf=3, n_pts=64, seed_desc=None, shared_pts=None):
    """Build a small map of a shared synthetic scene observed from poses
    offset by T_world (simulating two sessions with different origins)."""
    state = empty_map(16, 512, 64)
    pts_w = shared_pts if shared_pts is not None else np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-1, 1, n_pts), rng.uniform(3, 6, n_pts)],
        -1,
    ).astype(np.float32)
    descs = seed_desc if seed_desc is not None else rng.integers(
        0, 2**32, (n_pts, 8), dtype=np.uint64
    ).astype(np.uint32)
    # Transform the shared world into this session's frame.
    pts = pts_w @ np.asarray(T_world)[:3, :3].T + np.asarray(T_world)[:3, 3]
    # Scale-invariance band as UpdateNormalAndDepth would set it for a
    # level-0 observation from the origin camera (src/MapPoint.cc:340-383).
    dist = np.linalg.norm(pts, axis=-1).astype(np.float32)
    normal = (pts / np.maximum(dist[:, None], 1e-9)).astype(np.float32)
    state = state._replace(
        mp_pos=state.mp_pos.at[:n_pts].set(jnp.asarray(pts)),
        mp_valid=state.mp_valid.at[:n_pts].set(True),
        mp_desc=state.mp_desc.at[:n_pts].set(jnp.asarray(descs)),
        mp_normal=state.mp_normal.at[:n_pts].set(jnp.asarray(normal)),
        mp_max_dist=state.mp_max_dist.at[:n_pts].set(jnp.asarray(dist)),
        mp_min_dist=state.mp_min_dist.at[:n_pts].set(
            jnp.asarray(dist / 1.2**7)
        ),
        n_mp=jnp.int32(n_pts),
    )
    from orb_slam2v2_1_tpu.ops.projection import project

    for k in range(n_kf):
        Tcw = np.asarray(
            lie.se3_exp(jnp.asarray([0.2 * k, 0, 0, 0, 0.02 * k, 0], jnp.float32))
        ).astype(np.float32)
        uv = project(jnp.asarray(Tcw), jnp.asarray(pts), K)
        state, _ = append_keyframe(
            state, jnp.asarray(Tcw), jnp.int32(k),
            uv, jnp.zeros(n_pts, jnp.int32), jnp.zeros(n_pts),
            jnp.asarray(descs), jnp.ones(n_pts, bool), jnp.full(n_pts, -1.0),
            jnp.arange(n_pts, dtype=jnp.int32),
        )
    return state, pts_w, descs


class TestDeltaStreaming:
    def test_insert_and_update_roundtrip(self, rng):
        state, _, _ = _session_map(rng, np.eye(4, dtype=np.float32))
        server = srv.SlamServer(max_kf=16, max_mp=512, n_kp=64)
        stream = srv.DeltaStream(server, cid=1)
        stream.flush(state, n_kf=3)

        mirror = server.client_map(1)
        assert int(mirror.n_kf) == 3
        np.testing.assert_allclose(
            np.asarray(mirror.kf_pose[:3]), np.asarray(state.kf_pose[:3]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(mirror.mp_pos[:64]), np.asarray(state.mp_pos[:64]), atol=1e-6
        )
        # A pose update propagates.
        state2 = state._replace(
            kf_pose=state.kf_pose.at[1, 0, 3].add(0.5)
        )
        server.receive(1, srv.encode_pose_update(state2, np.array([0, 1, 2])))
        mirror = server.client_map(1)
        np.testing.assert_allclose(
            float(mirror.kf_pose[1, 0, 3]), float(state2.kf_pose[1, 0, 3]), atol=1e-6
        )

    def test_erase(self, rng):
        state, _, _ = _session_map(rng, np.eye(4, dtype=np.float32))
        server = srv.SlamServer(max_kf=16, max_mp=512, n_kp=64)
        stream = srv.DeltaStream(server, cid=7)
        stream.flush(state, n_kf=3)
        server.receive(7, srv.encode_keyframe_delta(state, 1, srv.ERASE))
        assert not bool(server.client_map(7).kf_valid[1])
        assert bool(server.client_map(7).kf_valid[0])


class TestMerge:
    def test_two_sessions_align(self, rng):
        # Session A observes the shared scene at identity; session B's world
        # frame is offset by a known rigid transform.
        T_offset = np.asarray(
            lie.se3_exp(jnp.asarray([0.4, -0.2, 0.1, 0.05, 0.1, -0.03], jnp.float32))
        ).astype(np.float32)
        shared_desc = rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
        map_a, pts_w, _ = _session_map(rng, np.eye(4, dtype=np.float32), seed_desc=shared_desc)
        map_b, _, _ = _session_map(
            rng, T_offset, seed_desc=shared_desc, shared_pts=pts_w
        )

        server = srv.SlamServer(max_kf=16, max_mp=512, n_kp=64)
        srv.DeltaStream(server, 1).flush(map_a, 3)
        srv.DeltaStream(server, 2).flush(map_b, 3)

        merged = server.merge_clients(1, 2, K, jax.random.key(0), joint_optimize=False)
        assert merged is not None
        assert int(merged.n_kf) == 6
        assert int(merged.n_mp) == 128
        # B's points must land on A's (same physical scene).
        pa = np.asarray(merged.mp_pos[:64])
        pb = np.asarray(merged.mp_pos[64:128])
        np.testing.assert_allclose(pb, pa, atol=2e-2)

    def test_merge_v2_fuses_duplicates(self, rng):
        """Merge v2 (VERDICT r3 item 5): BoW-ranked candidates, then
        CorrectLoop-style seam treatment — duplicates across the seam are
        fused (the B-side copies die), and the result stays consistent."""
        T_offset = np.asarray(
            lie.se3_exp(jnp.asarray([0.4, -0.2, 0.1, 0.05, 0.1, -0.03], jnp.float32))
        ).astype(np.float32)
        shared_desc = rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
        map_a, pts_w, _ = _session_map(rng, np.eye(4, dtype=np.float32), seed_desc=shared_desc)
        map_b, _, _ = _session_map(
            rng, T_offset, seed_desc=shared_desc, shared_pts=pts_w
        )
        server = srv.SlamServer(max_kf=16, max_mp=512, n_kp=64)
        srv.DeltaStream(server, 1).flush(map_a, 3)
        srv.DeltaStream(server, 2).flush(map_b, 3)

        merged = server.merge_clients(1, 2, K, jax.random.key(0))
        assert merged is not None
        # Both sessions observed the SAME 64 physical points: fusion must
        # kill duplicates on the B side.
        assert server.last_merge_fused > 0
        b_alive = int(np.asarray(merged.mp_valid[64:128]).sum())
        assert b_alive < 64, "no B-side duplicates were merged away"
        # B keyframes now reference A-side points across the seam.
        b_rows = np.asarray(merged.kf_mp[3:6])
        assert (b_rows[(b_rows >= 0)] < 64).any()
        assert np.isfinite(np.asarray(merged.kf_pose)).all()

    def test_merge_capacity_guard(self, rng):
        """Concat past capacity raises instead of silently truncating."""
        import pytest

        state, pts_w, desc = _session_map(rng, np.eye(4, dtype=np.float32), n_kf=9)
        server = srv.SlamServer(max_kf=16, max_mp=512, n_kp=64)
        srv.DeltaStream(server, 1).flush(state, 9)
        srv.DeltaStream(server, 2).flush(state, 9)
        with pytest.raises(ValueError, match="capacity"):
            server.merge_clients(1, 2, K, jax.random.key(0))
