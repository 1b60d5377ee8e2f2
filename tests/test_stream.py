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
