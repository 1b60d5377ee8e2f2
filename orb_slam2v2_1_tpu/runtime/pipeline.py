"""Async SLAM pipeline: native worker threads + versioned map snapshots.

The reference runs Tracking in the caller's thread and LocalMapping /
LoopClosing as std::threads sharing one pointer-graph map under mutexes
(src/System.cc:124-143). Here the shared state is an immutable MapState
pytree in a versioned `MapBox`; workers compute on snapshots and publish new
versions, and the tracking thread's advisory updates (visibility statistics)
publish only if nobody else published first — the lock is held for pointer
swaps only, never during device work.

Cooperative cancellation mirrors `mbAbortBA` (src/LocalMapping.cc:126): when
tracking enqueues a new keyframe while the mapping worker is mid-pipeline,
the worker skips the local-BA stage for that round and catches up — the
same "interrupt BA, keyframe insertion has priority" policy.
"""

from __future__ import annotations

import struct
import threading

from .native import NativeFlag, NativeQueue, NativeWorker


class MapBox:
    """Versioned published snapshot of the map state.

    Two writer classes, mirroring the reference's mutex split
    (Map::mMutexMap vs mMutexMapUpdate, include/Map.h):

    * **structural** writers (keyframe append, mapping pipeline, loop
      correction) serialize on `mutate()` — read-modify-publish under the
      structural lock, so no structural update is ever lost;
    * **advisory** writers (tracking's per-frame visibility statistics)
      use `publish(expected_version=...)` and simply lose the race if a
      structural update landed in between — the stats are monotone counters
      whose occasional loss is harmless (the reference tolerates the same
      via its unlocked Increase{Visible,Found} windows).
    """

    def __init__(self, state):
        self._lock = threading.Lock()
        self._struct_lock = threading.Lock()
        self._state = state
        self._version = 0

    def read(self):
        with self._lock:
            return self._state, self._version

    def publish(self, state, expected_version=None) -> bool:
        """Swap in a new state. With expected_version, only publish if nobody
        published in between (tracking's advisory stat updates lose races)."""
        with self._lock:
            if expected_version is not None and self._version != expected_version:
                return False
            self._state = state
            self._version += 1
            return True

    def mutate(self, fn):
        """Serialized structural read-modify-publish: fn(state) -> new_state
        (exactly the state — auxiliary results go through closures; the state
        itself is often a NamedTuple, so no tuple-unpacking heuristics).
        The structural lock is held across the device work — structural
        writers are few (keyframe cadence, not frame cadence) and must not
        clobber each other."""
        with self._struct_lock:
            state, _ = self.read()
            new_state = fn(state)
            self.publish(new_state)
            return new_state

    @property
    def version(self):
        with self._lock:
            return self._version


class AsyncMapper:
    """Local-mapping + loop-closing workers behind native queues.

    mapping_fn(state, kf_id, allow_ba) -> state
    loop_fn(snapshot, kf_id) -> None | (state -> state)  [optional]
      Detection half runs lock-free on the snapshot; a non-None return is
      the closure-application function, run under the structural lock.
    """

    def __init__(self, box: MapBox, mapping_fn, loop_fn=None, queue_cap: int = 32,
                 loop_service_fn=None):
        self.box = box
        self._mapping_fn = mapping_fn
        self._loop_fn = loop_fn
        # Runs after each loop round OUTSIDE the structural lock (the
        # detached-GBA start/abort/merge hook; see LoopCloser.service_gba).
        self._loop_service_fn = loop_service_fn
        self.abort_ba = NativeFlag()
        self.map_q = NativeQueue(queue_cap)
        self.loop_q = NativeQueue(queue_cap) if loop_fn else None
        self.n_ba_skipped = 0
        self.n_processed = 0
        self.n_loops = 0
        self._map_worker = NativeWorker(self.map_q, self._map_step)
        self._loop_worker = (
            NativeWorker(self.loop_q, self._loop_step) if loop_fn else None
        )

    # -- tracking side ------------------------------------------------------
    def submit_keyframe(self, kf_id: int):
        """Queue mapping work for a just-appended keyframe and interrupt any
        in-flight local BA (LocalMapping::InsertKeyFrame + mbAbortBA)."""
        self.abort_ba.set(1)
        self.map_q.push(struct.pack("<i", kf_id))

    # -- worker side --------------------------------------------------------
    def _map_step(self, msg: bytes):
        (kf_id,) = struct.unpack("<i", msg)
        self.abort_ba.clear()
        # Skip BA when a newer keyframe is already waiting (interrupted-BA
        # semantics); the culling/triangulation/fusion stages always run.
        allow_ba = len(self.map_q) == 0 and not self.abort_ba

        def step(state):
            return self._mapping_fn(state, kf_id, allow_ba)

        self.box.mutate(step)
        if not allow_ba:
            self.n_ba_skipped += 1
        self.n_processed += 1
        if self.loop_q is not None:
            self.loop_q.push(msg)

    def _loop_step(self, msg: bytes):
        (kf_id,) = struct.unpack("<i", msg)
        # Detection is READ-ONLY on the map (BoW registration mutates only
        # the loop thread's own database): run it on a snapshot OUTSIDE the
        # structural lock, so keyframe insertion and mapping never wait on
        # the detector's device round-trips. Only an accepted closure takes
        # the lock, for the correction itself (the reference's split between
        # DetectLoop and CorrectLoop's map-update mutex,
        # src/LoopClosing.cc:113,462).
        snapshot, _ = self.box.read()
        apply_fn = self._loop_fn(snapshot, kf_id)
        if apply_fn is not None:
            self.box.mutate(apply_fn)
            self.n_loops += 1
        if self._loop_service_fn is not None:
            self._loop_service_fn()

    # -- shutdown (System::Shutdown barrier, src/System.cc:570-596) ----------
    def shutdown(self, drain: bool = True):
        if not drain:
            self.map_q.clear()
            if self.loop_q is not None:
                self.loop_q.clear()
        self.map_q.close()
        self._map_worker.join()
        if self.loop_q is not None:
            self.loop_q.close()
            self._loop_worker.join()

    def raise_worker_errors(self):
        for w in (self._map_worker, self._loop_worker):
            if w is not None and w.exception is not None:
                raise w.exception
