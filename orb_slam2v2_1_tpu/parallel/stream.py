"""Networked map streaming: the ROS pub/sub transport analog.

The reference streams every map mutation from each SLAM client to a central
server over ROS topics (`KEYFRAME_<cid>`/`MAPPOINT_<cid>`,
src/StreamThread.cc:13-16) and broadcasts merged maps back on
`CLIENT_MAP<cid>` (src/ros_server.cc:156-168). Here the transport is the
native length-prefixed TCP layer (native/runtime.cc, the TCPROS analog):

* `StreamClient` — client side of `SendClassToServer` (src/StreamThread.cc:
  195-243): a native queue drained by a native worker thread into the socket,
  so tracking never blocks on the network. Deltas are the npz messages from
  parallel/server.py.
* `MapServerNode` — the `server_node` process (src/ros_server.cc): accepts
  clients, applies their deltas to a `SlamServer`, answers map requests
  (GET_MAP = the CREATE_MAP_REQUEST/SendMap handshake) with a serialized
  merged map the client can hot-swap via `System.load_map` — the
  `ReceiveMapCallback` analog (src/System.cc:1003-1066).

Wire format per message: u32-LE length prefix (transport) | u8 kind |
u32-LE cid | payload. Kinds: DELTA, GET_MAP, MAP, OK.
"""

from __future__ import annotations

import io
import struct
import threading

import numpy as np

from ..runtime.native import NativeQueue, NativeWorker, TcpClient, TcpServer
from . import server as server_mod

KIND_DELTA = 0
KIND_GET_MAP = 1  # payload: u32 other_cid to merge with (0xFFFFFFFF = own map)
KIND_MAP = 2
KIND_OK = 3
# Operator surface (the ServerViewer menu analog, src/ServerViewer.cc:56-139):
# JSON commands list/reset/save/load/send + the client-side poll that stands
# in for the CLIENT_MAP<cid> subscription (pull transport, same semantics).
KIND_OP = 4
KIND_OP_REPLY = 5
KIND_POLL = 6

_HDR = struct.Struct("<BI")
NO_MERGE = 0xFFFFFFFF


def _pack(kind: int, cid: int, payload: bytes = b"") -> bytes:
    return _HDR.pack(kind, cid) + payload


def _unpack(msg: bytes):
    kind, cid = _HDR.unpack_from(msg)
    return kind, cid, msg[_HDR.size:]


class StreamClient:
    """Client-side streaming thread (SendClassToServer analog).

    Deltas are queued by the tracking/mapping threads and shipped by a
    native worker so SLAM never waits on the socket. `request_map()` is the
    synchronous map-fetch handshake (the reference's CLIENT_MAP subscription,
    src/System.cc:996-1001).
    """

    def __init__(self, host: str, port: int, cid: int, queue_cap: int = 256):
        self.cid = cid
        self._conn = TcpClient(host, port)
        self._q = NativeQueue(queue_cap)
        self._lock = threading.Lock()  # socket shared with request_map
        self.n_sent = 0

        def ship(msg: bytes) -> bool:
            with self._lock:
                self._conn.send(_pack(KIND_DELTA, self.cid, msg))
            self.n_sent += 1
            return True

        self._worker = NativeWorker(self._q, ship, max_msg=1 << 26)

    # -- producer side ------------------------------------------------------
    def send_keyframe(self, state, kf_id: int):
        self._q.push(server_mod.encode_keyframe_delta(state, kf_id))

    def send_pose_update(self, state, kf_ids):
        self._q.push(server_mod.encode_pose_update(state, np.asarray(kf_ids)))

    def send_raw_delta(self, delta: bytes):
        self._q.push(delta)

    # -- map fetch ----------------------------------------------------------
    def request_map(self, merge_with: int | None = None, timeout_ms: int = 60000) -> bytes:
        """Fetch the server's map for this client (optionally merged with
        another client's session). Returns serialized map bytes loadable via
        utils.serialization / System.load_map."""
        self.flush()
        other = NO_MERGE if merge_with is None else merge_with
        with self._lock:
            self._conn.send(_pack(KIND_GET_MAP, self.cid, struct.pack("<I", other)))
            reply = self._conn.recv(timeout_ms=timeout_ms, max_len=1 << 28)
        kind, _, payload = _unpack(reply)
        if kind != KIND_MAP:
            raise OSError(f"unexpected reply kind {kind}")
        return payload

    def poll_push(self, timeout_ms: int = 10000) -> bytes | None:
        """Check for an operator-initiated map push (the Send button /
        CREATE_MAP_REQUEST path, src/ServerViewer.cc:132-137 ->
        src/ros_server.cc:119-168). Returns serialized map bytes or None."""
        with self._lock:
            self._conn.send(_pack(KIND_POLL, self.cid))
            reply = self._conn.recv(timeout_ms=timeout_ms, max_len=1 << 28)
        kind, _, payload = _unpack(reply)
        return payload if kind == KIND_MAP else None

    def flush(self, timeout_s: float = 30.0):
        """Block until the delta queue is drained (the Shutdown barrier)."""
        import time

        t0 = time.time()
        while len(self._q) > 0 and time.time() - t0 < timeout_s:
            time.sleep(0.002)

    def close(self):
        self.flush()
        self._q.close()
        self._worker.join()
        self._conn.close()


class OperatorClient:
    """Operator-side control connection (the ServerViewer menu,
    src/ServerViewer.cc:56-139, as a scriptable client)."""

    def __init__(self, host: str, port: int):
        self._conn = TcpClient(host, port)

    def command(self, op: dict, timeout_ms: int = 60000) -> dict:
        import json

        self._conn.send(_pack(KIND_OP, 0, json.dumps(op).encode()))
        reply = self._conn.recv(timeout_ms=timeout_ms, max_len=1 << 24)
        kind, _, payload = _unpack(reply)
        if kind != KIND_OP_REPLY:
            raise OSError(f"unexpected reply kind {kind}")
        return json.loads(payload.decode())

    def list_clients(self) -> dict:
        return self.command({"op": "list"})

    def reset(self, cid: int) -> dict:
        return self.command({"op": "reset", "cid": cid})

    def save(self, cid: int, path: str) -> dict:
        return self.command({"op": "save", "cid": cid, "path": path})

    def load(self, cid: int, path: str) -> dict:
        return self.command({"op": "load", "cid": cid, "path": path})

    def send_merge(self, cid: int, merge_with: int | None = None) -> dict:
        """Stage a (merged) map push for `cid` — the Send button."""
        op = {"op": "send", "cid": cid}
        if merge_with is not None:
            op["merge_with"] = merge_with
        return self.command(op)

    def close(self):
        self._conn.close()


class MapServerNode:
    """The server_node process analog: TCP accept loop + per-client readers
    feeding one SlamServer (src/ros_server.cc:201-210)."""

    def __init__(self, port: int = 0, max_kf: int = 256, max_mp: int = 32768,
                 n_kp: int = 1024):
        self.server = server_mod.SlamServer(max_kf, max_mp, n_kp)
        self._listener = TcpServer(port)
        self.port = self._listener.port
        self._lock = threading.Lock()  # serializes SlamServer mutations
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._pending_push: dict[int, bytes] = {}
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()
        self.n_deltas = 0

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn = self._listener.accept(timeout_ms=200)
            except TimeoutError:
                continue
            t = threading.Thread(target=self._serve_conn, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve_conn(self, conn):
        try:
            while not self._stop.is_set():
                try:
                    msg = conn.recv(timeout_ms=200, max_len=1 << 26)
                except TimeoutError:
                    continue
                kind, cid, payload = _unpack(msg)
                if kind == KIND_DELTA:
                    with self._lock:
                        self.server.receive(cid, payload)
                        self.n_deltas += 1
                elif kind == KIND_GET_MAP:
                    (other,) = struct.unpack("<I", payload)
                    conn.send(_pack(KIND_MAP, cid, self._map_bytes(cid, other)))
                elif kind == KIND_POLL:
                    pushed = self._pending_push.pop(cid, None)
                    if pushed is not None:
                        conn.send(_pack(KIND_MAP, cid, pushed))
                    else:
                        conn.send(_pack(KIND_OK, cid))
                elif kind == KIND_OP:
                    import json

                    reply = self._handle_op(json.loads(payload.decode()))
                    conn.send(
                        _pack(KIND_OP_REPLY, cid, json.dumps(reply).encode())
                    )
        except OSError:
            pass  # client went away
        finally:
            conn.close()

    # -- operator surface (ServerViewer menu analog) ------------------------
    def _handle_op(self, op: dict) -> dict:
        from ..utils import serialization

        kind = op.get("op")
        try:
            if kind == "list":
                with self._lock:
                    return {
                        "ok": True,
                        "clients": {
                            str(cid): {
                                "kf": int(cm.state.n_kf),
                                "mp": int(cm.state.mp_valid.sum()),
                                "deltas": cm.n_deltas,
                            }
                            for cid, cm in self.server.clients.items()
                        },
                    }
            cid = int(op["cid"])
            if kind == "reset":
                # ServerViewer "Reset" (src/ServerViewer.cc:100-107).
                with self._lock:
                    self.server.clients.pop(cid, None)
                return {"ok": True}
            if kind == "save":
                # ServerViewer "Save" (boost archive -> npz snapshot).
                with self._lock:
                    serialization.save_map(
                        self.server.client_map(cid), op["path"],
                        metadata={"n_kf_host": int(self.server.client_map(cid).n_kf)},
                    )
                return {"ok": True, "path": op["path"]}
            if kind == "load":
                with self._lock:
                    state, _ = serialization.load_map(op["path"])
                    self.server._client(cid).state = state
                return {"ok": True}
            if kind == "send":
                # ServerViewer "Send": build the (optionally merged) map and
                # stage it for the client's next poll (the CREATE_MAP_REQUEST
                # -> SendMap -> CLIENT_MAP path, src/ros_server.cc:119-168).
                other = int(op.get("merge_with", NO_MERGE))
                self._pending_push[cid] = self._map_bytes(cid, other)
                return {"ok": True, "bytes": len(self._pending_push[cid])}
            return {"ok": False, "error": f"unknown op {kind!r}"}
        except Exception as e:  # noqa: BLE001 — operator gets the error text
            return {"ok": False, "error": str(e)}

    def _map_bytes(self, cid: int, other: int) -> bytes:
        from ..utils import serialization

        import jax

        with self._lock:
            if other != NO_MERGE:
                merged = self.server.merge_clients(cid, other, self._default_K(),
                                                   jax.random.key(0))
                state = merged if merged is not None else self.server.client_map(cid)
            else:
                state = self.server.client_map(cid)
            buf = io.BytesIO()
            serialization.save_map(
                state, buf,
                metadata={"n_kf_host": int(state.n_kf), "ref_kf": 0, "frame_id": 0},
            )
            return buf.getvalue()

    @staticmethod
    def _default_K():
        import jax.numpy as jnp

        # The merge solver needs intrinsics for reprojection gating; clients
        # stream undistorted pixel coords, so any consistent K works — use
        # the configured one when available.
        return jnp.asarray([550.0, 550.0, 320.0, 240.0], jnp.float32)

    def set_intrinsics(self, K):
        import jax.numpy as jnp

        self._K = jnp.asarray(K)
        self._default_K = lambda: self._K  # type: ignore[method-assign]

    def stop(self):
        self._stop.set()
        self._accept_thread.join(timeout=2)
        for t in self._threads:
            t.join(timeout=2)
        self._listener.close()
