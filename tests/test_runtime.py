"""Native runtime: queues, flags, workers, TCP transport, async pipeline.

Covers the TPU-native replacement for the reference's std::thread runtime
(queues: src/LocalMapping.cc:122-134; cancellation: src/LocalMapping.cc:126;
transport: src/StreamThread.cc:13-16).
"""

import struct
import threading
import time

import pytest

from orb_slam2v2_1_tpu.runtime import (
    NativeFlag,
    NativeQueue,
    NativeWorker,
    TcpClient,
    TcpServer,
    now_ns,
)
from orb_slam2v2_1_tpu.runtime.pipeline import AsyncMapper, MapBox


def test_queue_fifo_and_close():
    q = NativeQueue(8)
    for i in range(5):
        assert q.push(struct.pack("<i", i))
    assert len(q) == 5
    for i in range(5):
        assert q.pop(timeout_ms=100) == struct.pack("<i", i)
    assert q.pop(timeout_ms=10) is None  # timeout, empty
    q.close()
    with pytest.raises(EOFError):
        q.pop(timeout_ms=100)
    q.free()


def test_queue_bounded_blocks_until_pop():
    q = NativeQueue(1)
    assert q.push(b"a")
    assert not q.push(b"b", timeout_ms=30)  # full -> timeout
    popped = []
    t = threading.Thread(target=lambda: popped.append(q.pop(timeout_ms=1000)))
    t.start()
    assert q.push(b"b", timeout_ms=1000)  # unblocked by the pop
    t.join()
    assert popped == [b"a"]
    q.close()
    q.free()


def test_flag_exchange():
    f = NativeFlag()
    assert not f
    f.set(2)
    assert f.get() == 2
    assert f.exchange(0) == 2
    assert f.get() == 0
    f.free()


def test_worker_drains_then_joins():
    q = NativeQueue(64)
    got = []
    w = NativeWorker(q, lambda m: got.append(m))
    for i in range(20):
        q.push(struct.pack("<i", i))
    q.close()  # close-with-drain: worker processes all 20 first
    w.join()
    assert got == [struct.pack("<i", i) for i in range(20)]
    assert w.done()
    w.free()
    q.free()


def test_worker_exception_propagates_on_join():
    q = NativeQueue(4)

    def boom(msg):
        raise ValueError("bad message")

    w = NativeWorker(q, boom)
    q.push(b"x")
    with pytest.raises(ValueError, match="bad message"):
        w.join()
    q.close()
    w.free()
    q.free()


def test_tcp_roundtrip():
    s = TcpServer()
    result = {}

    def srv():
        c = s.accept()
        m = c.recv()
        c.send(m[::-1])
        result["n"] = len(m)
        c.close()

    t = threading.Thread(target=srv)
    t.start()
    cl = TcpClient("127.0.0.1", s.port)
    payload = bytes(range(256)) * 100
    cl.send(payload)
    assert cl.recv() == payload[::-1]
    cl.close()
    t.join()
    s.close()
    assert result["n"] == len(payload)


def test_now_ns_monotone():
    a = now_ns()
    b = now_ns()
    assert b >= a > 0


# ---------------------------------------------------------------------------
# Async pipeline
# ---------------------------------------------------------------------------


def test_mapbox_versioned_publish():
    box = MapBox("v0")
    st, ver = box.read()
    assert (st, ver) == ("v0", 0)
    assert box.publish("v1")
    assert not box.publish("stale", expected_version=0)  # lost the race
    assert box.publish("v2", expected_version=1)
    assert box.read() == ("v2", 2)


def test_async_mapper_processes_and_skips_ba_under_pressure():
    box = MapBox({"kfs": []})
    slow = threading.Event()

    def mapping_fn(state, kf_id, allow_ba):
        if not slow.is_set():
            time.sleep(0.05)  # force a backlog so later BAs get skipped
        return {"kfs": state["kfs"] + [(kf_id, allow_ba)]}

    m = AsyncMapper(box, mapping_fn)
    for i in range(8):
        m.submit_keyframe(i)
    slow.set()
    m.shutdown(drain=True)
    state, _ = box.read()
    assert [k for k, _ in state["kfs"]] == list(range(8))
    assert m.n_processed == 8
    # With a backlog, at least one BA round was skipped (mbAbortBA analog).
    assert m.n_ba_skipped >= 1
    m.raise_worker_errors()


def test_async_mapper_loop_worker_publishes_on_closure():
    box = MapBox(0)

    def mapping_fn(state, kf_id, allow_ba):
        return state + 1

    def loop_fn(snapshot, kf_id):
        # Detection half: read-only on the snapshot; "closes a loop" on kf 3
        # by returning the mutation to apply under the structural lock.
        if kf_id == 3:
            return lambda state: state + 100
        return None

    m = AsyncMapper(box, mapping_fn, loop_fn=loop_fn)
    for i in range(5):
        m.submit_keyframe(i)
    m.shutdown(drain=True)
    assert m.n_processed == 5
    assert m.n_loops == 1
    state, _ = box.read()
    assert state >= 100  # the closure mutation landed
    m.raise_worker_errors()
