"""Networked map streaming over the native TCP transport (parallel/stream.py):
the ROS-topic client/server path (SURVEY §3.5) end-to-end on loopback."""

import io

import numpy as np
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import lie
from orb_slam2v2_1_tpu.parallel.stream import MapServerNode, StreamClient
from orb_slam2v2_1_tpu.utils import serialization

from test_server import K, _session_map


def test_client_streams_keyframes_to_server(rng):
    state, _, _ = _session_map(rng, np.eye(4, dtype=np.float32))
    node = MapServerNode(port=0, max_kf=16, max_mp=512, n_kp=64)
    try:
        client = StreamClient("127.0.0.1", node.port, cid=1)
        for k in range(3):
            client.send_keyframe(state, k)
        client.send_pose_update(state, np.array([0, 1, 2]))
        client.flush()
        # Server applies asynchronously; wait for all 4 deltas.
        import time

        for _ in range(200):
            if node.n_deltas >= 4:
                break
            time.sleep(0.01)
        mirror = node.server.client_map(1)
        assert int(mirror.n_kf) == 3
        np.testing.assert_allclose(
            np.asarray(mirror.kf_pose[:3]), np.asarray(state.kf_pose[:3]), atol=1e-6
        )
        client.close()
    finally:
        node.stop()


def test_fetch_merged_map_over_tcp(rng):
    T_offset = np.asarray(
        lie.se3_exp(jnp.asarray([0.4, -0.2, 0.1, 0.05, 0.1, -0.03], jnp.float32))
    ).astype(np.float32)
    shared_desc = rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
    map_a, pts_w, _ = _session_map(rng, np.eye(4, dtype=np.float32), seed_desc=shared_desc)
    map_b, _, _ = _session_map(rng, T_offset, seed_desc=shared_desc, shared_pts=pts_w)

    node = MapServerNode(port=0, max_kf=16, max_mp=512, n_kp=64)
    node.set_intrinsics(K)
    try:
        ca = StreamClient("127.0.0.1", node.port, cid=1)
        cb = StreamClient("127.0.0.1", node.port, cid=2)
        for k in range(3):
            ca.send_keyframe(map_a, k)
            cb.send_keyframe(map_b, k)

        # The GET_MAP handshake (CREATE_MAP_REQUEST -> SendMap -> CLIENT_MAP).
        payload = ca.request_map(merge_with=2)
        merged, meta = serialization.load_map(io.BytesIO(payload))
        assert int(merged.n_kf) == 6
        pa = np.asarray(merged.mp_pos[:64])
        pb = np.asarray(merged.mp_pos[64:128])
        np.testing.assert_allclose(pb, pa, atol=2e-2)
        ca.close()
        cb.close()
    finally:
        node.stop()


def test_operator_session(rng, tmp_path):
    """Scripted operator session (the ServerViewer menu as a protocol,
    src/ServerViewer.cc:56-139): list -> save -> send(merge) -> client polls
    the pushed map -> reset."""
    from orb_slam2v2_1_tpu.parallel.stream import OperatorClient

    T_offset = np.asarray(
        lie.se3_exp(jnp.asarray([0.4, -0.2, 0.1, 0.05, 0.1, -0.03], jnp.float32))
    ).astype(np.float32)
    shared_desc = rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
    map_a, pts_w, _ = _session_map(rng, np.eye(4, dtype=np.float32), seed_desc=shared_desc)
    map_b, _, _ = _session_map(rng, T_offset, seed_desc=shared_desc, shared_pts=pts_w)

    node = MapServerNode(port=0, max_kf=16, max_mp=512, n_kp=64)
    node.set_intrinsics(K)
    try:
        ca = StreamClient("127.0.0.1", node.port, cid=1)
        cb = StreamClient("127.0.0.1", node.port, cid=2)
        for k in range(3):
            ca.send_keyframe(map_a, k)
            cb.send_keyframe(map_b, k)
        ca.flush()
        cb.flush()
        import time

        for _ in range(200):
            if node.n_deltas >= 6:
                break
            time.sleep(0.01)

        op = OperatorClient("127.0.0.1", node.port)
        # list
        out = op.list_clients()
        assert out["ok"] and set(out["clients"]) == {"1", "2"}
        assert out["clients"]["1"]["kf"] == 3
        # save
        path = str(tmp_path / "client1.npz")
        assert op.save(1, path)["ok"]
        st, _ = serialization.load_map(path)
        assert int(st.n_kf) == 3
        # no push pending yet
        assert ca.poll_push() is None
        # send: stage a merged map push for client 1
        out = op.send_merge(1, merge_with=2)
        assert out["ok"] and out["bytes"] > 0
        payload = ca.poll_push()
        assert payload is not None
        merged, _ = serialization.load_map(io.BytesIO(payload))
        assert int(merged.n_kf) == 6
        # the push is one-shot
        assert ca.poll_push() is None
        # reset client 2
        assert op.reset(2)["ok"]
        out = op.list_clients()
        assert "2" not in out["clients"]
        # load back into a fresh client slot
        assert op.load(3, path)["ok"]
        assert op.list_clients()["clients"]["3"]["kf"] == 3
        op.close()
        ca.close()
        cb.close()
    finally:
        node.stop()
