"""Multi-session map server: delta streaming, per-client maps, map merge.

TPU-native replacement for the reference's ROS client/server layer
(SURVEY §2.3, L7): `SendClassToServer` (src/StreamThread.cc) becomes a
client-side delta log; the `Communicator`/`ServerMap` node (src/ros_server.cc,
src/ServerMap.cc) becomes `SlamServer` holding one array-state map per
client; `CLIENT_MAP<cid>` broadcast + `System::ReceiveMapCallback`
(src/System.cc:1003-1066) becomes `merged_map()` -> client `load_map`
hot-swap. Transport is pluggable bytes (in-process queue, files, or sockets)
— the wire format is a compressed npz per delta, replacing boost-serialized
ROS messages.

Commands mirror the reference: INSERT=0, ERASE=1, UPDATE=2
(src/ros_server.cc:20-22).
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.map_state import MapState, empty_map

INSERT, ERASE, UPDATE = 0, 1, 2


# ---------------------------------------------------------------------------
# Delta encoding (the KF.msg / MP.msg analog)
# ---------------------------------------------------------------------------

def encode_keyframe_delta(state: MapState, kf_id: int, command: int = INSERT) -> bytes:
    """Marshal one keyframe + its observed points (RunKeyFrame,
    src/StreamThread.cc:50-137: pose, descriptors, keypoints, covisibility
    implied by observations)."""
    buf = io.BytesIO()
    mp_ids = np.asarray(state.kf_mp[kf_id])
    observed = np.unique(mp_ids[mp_ids >= 0])
    np.savez_compressed(
        buf,
        command=np.int32(command),
        kf_id=np.int32(kf_id),
        frame_id=np.asarray(state.kf_frame_id[kf_id]),
        parent=np.asarray(state.kf_parent[kf_id]),
        seq=np.asarray(state.kf_seq[kf_id]),
        pose=np.asarray(state.kf_pose[kf_id]),
        xy=np.asarray(state.kf_xy[kf_id]),
        level=np.asarray(state.kf_level[kf_id]),
        angle=np.asarray(state.kf_angle[kf_id]),
        desc=np.asarray(state.kf_desc[kf_id]),
        kp_valid=np.asarray(state.kf_kp_valid[kf_id]),
        ur=np.asarray(state.kf_ur[kf_id]),
        kf_mp=mp_ids,
        mp_ids=observed,
        mp_pos=np.asarray(state.mp_pos)[observed],
        mp_desc=np.asarray(state.mp_desc)[observed],
        # Scale-invariance band + viewing normal (MapPoint::UpdateNormalAndDepth,
        # src/MapPoint.cc:340-383): without these the server-side merge
        # fusion cannot predict octaves/radii for projection matching.
        mp_normal=np.asarray(state.mp_normal)[observed],
        mp_min_dist=np.asarray(state.mp_min_dist)[observed],
        mp_max_dist=np.asarray(state.mp_max_dist)[observed],
    )
    return buf.getvalue()


def encode_pose_update(state: MapState, kf_ids: np.ndarray) -> bytes:
    """Marshal refined poses + point positions after BA / loop correction
    (the UPDATE command path, src/StreamThread.cc:225-236)."""
    buf = io.BytesIO()
    valid = np.asarray(state.mp_valid)
    np.savez_compressed(
        buf,
        command=np.int32(UPDATE),
        kf_ids=np.asarray(kf_ids, np.int32),
        poses=np.asarray(state.kf_pose)[kf_ids],
        mp_ids=np.where(valid)[0].astype(np.int32),
        mp_pos=np.asarray(state.mp_pos)[valid],
    )
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------

@dataclass
class ClientMap:
    """Server-side mirror of one client's map (ServerMap analog)."""

    max_kf: int
    max_mp: int
    n_kp: int
    state: MapState = None
    # client-local id -> server-map id (UID analog, src/MapPoint.cc:40-43)
    mp_remap: dict = field(default_factory=dict)
    n_deltas: int = 0

    def __post_init__(self):
        if self.state is None:
            self.state = empty_map(self.max_kf, self.max_mp, self.n_kp)


@jax.jit
def _bow_rows(state: MapState, voc):
    """tf-idf BoW vector per keyframe slot, (K, W) — the server-side BoW
    database used for cross-session retrieval (one matmul ranks all pairs)."""
    from ..ops import hamming, vocab as vocab_ops

    def row(desc, kp_valid):
        pm1 = hamming.unpack_pm1(desc)
        words = vocab_ops.assign_words(voc, pm1)
        return vocab_ops.bow_vector(
            words, kp_valid, voc.word_weight, voc.word_weight.shape[0]
        )

    return jax.vmap(row)(state.kf_desc, state.kf_kp_valid)


class SlamServer:
    """Central map server (ros_server Communicator analog)."""

    def __init__(self, max_kf: int = 256, max_mp: int = 32768, n_kp: int = 1024):
        self.clients: dict[int, ClientMap] = {}
        self.dims = (max_kf, max_mp, n_kp)

    def _client(self, cid: int) -> ClientMap:
        if cid not in self.clients:
            self.clients[cid] = ClientMap(*self.dims)
        return self.clients[cid]

    def receive(self, cid: int, delta: bytes):
        """Apply one delta to the client's server-side map
        (Communicator::KeyFrameData/MapPointData, src/ros_server.cc:48-102)."""
        data = np.load(io.BytesIO(delta))
        cm = self._client(cid)
        cmd = int(data["command"])
        if cmd == INSERT:
            self._apply_insert(cm, data)
        elif cmd == UPDATE:
            self._apply_update(cm, data)
        elif cmd == ERASE:
            kf = int(data["kf_id"])
            cm.state = cm.state._replace(
                kf_valid=cm.state.kf_valid.at[kf].set(False)
            )
        cm.n_deltas += 1

    def _apply_insert(self, cm: ClientMap, data):
        st = cm.state
        kf = int(data["kf_id"])
        # Points first (so kf_mp references resolve).
        mp_ids = data["mp_ids"]
        mp_pos = data["mp_pos"]
        mp_desc = data["mp_desc"]
        pos_buf = np.array(st.mp_pos)
        val_buf = np.array(st.mp_valid)
        desc_buf = np.array(st.mp_desc)
        if len(mp_ids):
            pos_buf[mp_ids] = mp_pos
            val_buf[mp_ids] = True
            desc_buf[mp_ids] = mp_desc
        extra = {}
        if "mp_min_dist" in data.files and len(mp_ids):
            mn = np.array(st.mp_min_dist)
            mx = np.array(st.mp_max_dist)
            nr = np.array(st.mp_normal)
            mn[mp_ids] = data["mp_min_dist"]
            mx[mp_ids] = data["mp_max_dist"]
            nr[mp_ids] = data["mp_normal"]
            extra = dict(
                mp_min_dist=jnp.asarray(mn),
                mp_max_dist=jnp.asarray(mx),
                mp_normal=jnp.asarray(nr),
            )
        st = st._replace(
            mp_pos=jnp.asarray(pos_buf),
            mp_valid=jnp.asarray(val_buf),
            mp_desc=jnp.asarray(desc_buf),
            **extra,
            kf_pose=st.kf_pose.at[kf].set(jnp.asarray(data["pose"])),
            kf_valid=st.kf_valid.at[kf].set(True),
            kf_frame_id=st.kf_frame_id.at[kf].set(int(data["frame_id"])),
            kf_xy=st.kf_xy.at[kf].set(jnp.asarray(data["xy"])),
            kf_level=st.kf_level.at[kf].set(jnp.asarray(data["level"])),
            kf_angle=st.kf_angle.at[kf].set(jnp.asarray(data["angle"])),
            kf_desc=st.kf_desc.at[kf].set(jnp.asarray(data["desc"])),
            kf_kp_valid=st.kf_kp_valid.at[kf].set(jnp.asarray(data["kp_valid"])),
            kf_ur=st.kf_ur.at[kf].set(jnp.asarray(data["ur"])),
            kf_mp=st.kf_mp.at[kf].set(jnp.asarray(data["kf_mp"])),
            kf_parent=st.kf_parent.at[kf].set(
                int(data["parent"]) if "parent" in data.files else -1
            ),
            kf_seq=st.kf_seq.at[kf].set(
                int(data["seq"]) if "seq" in data.files else kf
            ),
            n_seq=jnp.maximum(
                st.n_seq,
                (int(data["seq"]) if "seq" in data.files else kf) + 1,
            ),
            n_kf=jnp.maximum(st.n_kf, kf + 1),
            n_mp=jnp.maximum(st.n_mp, int(mp_ids.max()) + 1 if len(mp_ids) else st.n_mp),
        )
        cm.state = st

    def _apply_update(self, cm: ClientMap, data):
        st = cm.state
        kf_ids = jnp.asarray(data["kf_ids"])
        st = st._replace(
            kf_pose=st.kf_pose.at[kf_ids].set(jnp.asarray(data["poses"])),
            mp_pos=st.mp_pos.at[jnp.asarray(data["mp_ids"])].set(
                jnp.asarray(data["mp_pos"])
            ),
        )
        cm.state = st

    # ------------------------------------------------------------------
    def client_map(self, cid: int) -> MapState:
        return self._client(cid).state

    def _get_vocab(self):
        if not hasattr(self, "_vocab"):
            import os

            from ..ops import vocab as vocab_ops

            path = os.path.join(
                os.path.dirname(__file__), "..", "data", "vocab.npz"
            )
            self._vocab = (
                vocab_ops.load_vocabulary(np.load(path))
                if os.path.exists(path)
                else None
            )
        return self._vocab

    def merge_clients(
        self, cid_a: int, cid_b: int, K, key, vocab=None, top_pairs: int = 5,
        joint_optimize: bool = True,
    ) -> Optional[MapState]:
        """Merge client B's map into client A's frame — the analog of the
        operator-triggered `SendMap` merge (src/ros_server.cc:119-168), at
        loop-closing quality:

        1. cross-session candidate retrieval through the BoW vocabulary —
           ONE (Ka,W)x(W,Kb) tf-idf similarity matmul ranks all keyframe
           pairs (no O(Ka*Kb) descriptor-matching loops);
        2. descriptor match + Horn Sim3 RANSAC on the best pairs (>=20
           inliers to accept, the loop-closing threshold);
        3. rigid-align B, concatenate (capacity-guarded);
        4. seam treatment like CorrectLoop: persistent seam edge +
           essential-graph optimization + SearchAndFuse duplicate merge
           (src/LoopClosing.cc:453-622)."""
        from ..ops import hamming, matching, sim3solver, vocab as vocab_ops
        from ..ops.lie import sim3_inverse

        a = self._client(cid_a).state
        b = self._client(cid_b).state
        n_a = int(a.n_kf)
        n_b = int(b.n_kf)
        if n_a == 0 or n_b == 0:
            return None

        # --- 1. BoW candidate ranking (one matmul) ---
        vocab = vocab or self._get_vocab()
        pairs = []
        if vocab is not None:
            Va = np.asarray(_bow_rows(a, vocab))
            Vb = np.asarray(_bow_rows(b, vocab))
            S = Va @ Vb.T  # tf-idf similarity ranking
            S = np.where(
                np.asarray(a.kf_valid)[:, None] & np.asarray(b.kf_valid)[None, :],
                S, -1.0,
            )
            flat = np.argsort(-S.reshape(-1))[:top_pairs]
            pairs = [
                (int(i // S.shape[1]), int(i % S.shape[1]))
                for i in flat
                if S.reshape(-1)[i] > 0
            ]
        if not pairs:  # no vocabulary: fall back to strongest covis KFs
            pairs = [
                (ka, kb)
                for ka in range(min(n_a, 3))
                for kb in range(min(n_b, 3))
            ][:top_pairs]

        # --- 2. Sim3 on the ranked pairs ---
        accepted = None
        for ka, kb in pairs:
            m = matching.match_nn(
                hamming.unpack_pm1(a.kf_desc[ka]),
                hamming.unpack_pm1(b.kf_desc[kb]),
                (a.kf_kp_valid[ka] & (a.kf_mp[ka] >= 0))[:, None]
                & (b.kf_kp_valid[kb] & (b.kf_mp[kb] >= 0))[None, :],
                max_dist=matching.TH_LOW,
                nn_ratio=0.75,
            )
            if int(m.ok.sum()) < 20:
                continue
            pose_a = a.kf_pose[ka]
            pose_b = b.kf_pose[kb]
            mp_a = jnp.maximum(a.kf_mp[ka], 0)
            mp_b = jnp.maximum(b.kf_mp[kb][m.idx], 0)
            p1 = (a.mp_pos[mp_a] @ pose_a[:3, :3].T) + pose_a[:3, 3]
            p2 = (b.mp_pos[mp_b] @ pose_b[:3, :3].T) + pose_b[:3, 3]
            res = sim3solver.sim3_ransac(
                p1, p2, a.kf_xy[ka], b.kf_xy[kb][m.idx],
                jnp.ones(p1.shape[0]), jnp.ones(p1.shape[0]), m.ok, K, key,
                fix_scale=True,
            )
            if bool(res.success) and int(res.n_inliers) >= 20:
                accepted = (ka, kb, res.S12)
                break
        if accepted is None:
            return None
        ka, kb, S12 = accepted

        # --- 3. rigid-align B into A's world + concatenate ---
        pose_a = a.kf_pose[ka]
        pose_b = b.kf_pose[kb]
        T_ab = sim3_inverse(pose_a) @ S12 @ pose_b
        merged = self._concat(a, b, T_ab)  # raises on capacity overflow

        # --- 4. seam edge + essential graph + duplicate fusion ---
        if joint_optimize:
            from ..models import loop_closing as lc
            from ..models.map_state import refresh_covis

            kb_new = n_a + kb
            # Seam roles: B's keyframe is the "current" side, A's the fixed
            # "loop" side — the essential graph anchors A's frame and A's
            # (base-map) landmarks win the duplicate fusion, so B's copies
            # die (pRep->Replace semantics, src/LoopClosing.cc:596-622).
            # After the rigid alignment the seam measurement is the live
            # relative pose (the Sim3 residual was absorbed by T_ab).
            S_seam = merged.kf_pose[kb_new] @ jnp.linalg.inv(merged.kf_pose[ka])
            merged = lc.correct_loop(
                merged, jnp.int32(kb_new), jnp.int32(ka), S_seam
            )
            fuse_kfs, mp_cap = lc._fuse_caps(merged, kb_new, ka)
            merged, n_fused = lc.search_and_fuse(
                merged, jnp.int32(kb_new), jnp.int32(ka), jnp.asarray(K),
                fuse_kfs=fuse_kfs, mp_cap=mp_cap,
            )
            merged = refresh_covis(merged)
            self.last_merge_fused = int(n_fused)
        return merged

    @staticmethod
    def _concat(a: MapState, b: MapState, T_ab) -> MapState:
        """Concatenate two maps (B transformed by T_ab into A's world).
        Raises ValueError when the combined maps exceed A's capacity —
        silent truncation would drop keyframes/points without trace."""
        from ..ops import lie

        n_kf_a = int(a.n_kf)
        n_kf_b = int(b.n_kf)
        n_mp_a = int(a.n_mp)
        n_mp_b = int(b.n_mp)
        Kcap = a.kf_pose.shape[0]
        Mcap = a.mp_pos.shape[0]
        if n_kf_a + n_kf_b > Kcap or n_mp_a + n_mp_b > Mcap:
            raise ValueError(
                f"merge exceeds capacity: {n_kf_a}+{n_kf_b} keyframes vs "
                f"{Kcap}, {n_mp_a}+{n_mp_b} points vs {Mcap}; "
                "grow the server map capacity or cull before merging"
            )
        T_ba = np.asarray(lie.se3_inverse(jnp.asarray(T_ab)))

        st = a
        # Points of B -> A world (positions and viewing normals rotate; the
        # scale-invariance band is metric and T_ab is rigid here).
        R_ab = np.asarray(T_ab)[:3, :3]
        pb = np.asarray(b.mp_pos[:n_mp_b]) @ R_ab.T + np.asarray(T_ab)[:3, 3]
        nb = np.asarray(b.mp_normal[:n_mp_b]) @ R_ab.T
        st = st._replace(
            mp_pos=st.mp_pos.at[n_mp_a : n_mp_a + n_mp_b].set(jnp.asarray(pb)),
            mp_valid=st.mp_valid.at[n_mp_a : n_mp_a + n_mp_b].set(
                b.mp_valid[:n_mp_b]
            ),
            mp_desc=st.mp_desc.at[n_mp_a : n_mp_a + n_mp_b].set(b.mp_desc[:n_mp_b]),
            mp_normal=st.mp_normal.at[n_mp_a : n_mp_a + n_mp_b].set(jnp.asarray(nb)),
            mp_min_dist=st.mp_min_dist.at[n_mp_a : n_mp_a + n_mp_b].set(
                b.mp_min_dist[:n_mp_b]
            ),
            mp_max_dist=st.mp_max_dist.at[n_mp_a : n_mp_a + n_mp_b].set(
                b.mp_max_dist[:n_mp_b]
            ),
            mp_visible=st.mp_visible.at[n_mp_a : n_mp_a + n_mp_b].set(
                b.mp_visible[:n_mp_b]
            ),
            mp_found=st.mp_found.at[n_mp_a : n_mp_a + n_mp_b].set(
                b.mp_found[:n_mp_b]
            ),
            n_mp=jnp.int32(n_mp_a + n_mp_b),
        )
        # Keyframes of B: pose_new = pose_b @ T_ba (world changes to A's).
        poses_b = np.asarray(b.kf_pose[:n_kf_b]) @ T_ba[None]
        remap = np.where(
            np.asarray(b.kf_mp[:n_kf_b]) >= 0,
            np.asarray(b.kf_mp[:n_kf_b]) + n_mp_a,
            -1,
        )
        st = st._replace(
            kf_pose=st.kf_pose.at[n_kf_a : n_kf_a + n_kf_b].set(jnp.asarray(poses_b)),
            kf_valid=st.kf_valid.at[n_kf_a : n_kf_a + n_kf_b].set(b.kf_valid[:n_kf_b]),
            kf_frame_id=st.kf_frame_id.at[n_kf_a : n_kf_a + n_kf_b].set(
                b.kf_frame_id[:n_kf_b]
            ),
            kf_xy=st.kf_xy.at[n_kf_a : n_kf_a + n_kf_b].set(b.kf_xy[:n_kf_b]),
            kf_level=st.kf_level.at[n_kf_a : n_kf_a + n_kf_b].set(b.kf_level[:n_kf_b]),
            kf_angle=st.kf_angle.at[n_kf_a : n_kf_a + n_kf_b].set(b.kf_angle[:n_kf_b]),
            kf_desc=st.kf_desc.at[n_kf_a : n_kf_a + n_kf_b].set(b.kf_desc[:n_kf_b]),
            kf_kp_valid=st.kf_kp_valid.at[n_kf_a : n_kf_a + n_kf_b].set(
                b.kf_kp_valid[:n_kf_b]
            ),
            kf_ur=st.kf_ur.at[n_kf_a : n_kf_a + n_kf_b].set(b.kf_ur[:n_kf_b]),
            kf_mp=st.kf_mp.at[n_kf_a : n_kf_a + n_kf_b].set(jnp.asarray(remap)),
            n_kf=jnp.int32(n_kf_a + n_kf_b),
        )
        # Spanning tree / sequence bookkeeping: B's slots shift by n_kf_a,
        # B's insertion sequence shifts after all of A's.
        par_b = np.asarray(b.kf_parent[:n_kf_b])
        par_b = np.where(par_b >= 0, par_b + n_kf_a, -1)
        seq_b = np.asarray(b.kf_seq[:n_kf_b])
        n_seq_a = int(a.n_seq)
        seq_b = np.where(seq_b >= 0, seq_b + n_seq_a, -1)
        le_b = np.asarray(b.loop_edges)
        le_b = np.where(le_b >= 0, le_b + n_kf_a, -1)
        cap = st.loop_edges.shape[0]
        n_le_a = min(int(a.n_loop_edges), cap)
        n_le_b = min(int(b.n_loop_edges), cap)
        le = np.asarray(st.loop_edges)
        take = min(n_le_b, cap - n_le_a)
        if take > 0:
            le[n_le_a : n_le_a + take] = le_b[:take]
        st = st._replace(
            kf_parent=st.kf_parent.at[n_kf_a : n_kf_a + n_kf_b].set(
                jnp.asarray(par_b)
            ),
            kf_seq=st.kf_seq.at[n_kf_a : n_kf_a + n_kf_b].set(jnp.asarray(seq_b)),
            mp_first_seq=st.mp_first_seq.at[n_mp_a : n_mp_a + n_mp_b].set(
                jnp.asarray(
                    np.asarray(b.mp_first_seq[:n_mp_b]) + n_seq_a
                )
            ),
            loop_edges=jnp.asarray(le),
            n_loop_edges=jnp.int32(n_le_a + take),
            n_seq=jnp.int32(n_seq_a + int(b.n_seq)),
        )
        from ..models.map_state import refresh_covis

        return refresh_covis(st)


class DeltaStream:
    """Client-side delta log (SendClassToServer analog): collects keyframe
    insertions + periodic pose updates for the server."""

    def __init__(self, server: SlamServer, cid: int):
        self.server = server
        self.cid = cid
        # Keyed by (slot, seq): culled slots are REUSED by new keyframes
        # (map_state.append_keyframe), so a bare slot id is not an identity.
        self._sent_kfs: dict[int, int] = {}

    def flush(self, state: MapState, n_kf: int):
        """Push any new keyframes + a pose/point update (drained every 5 ms
        in the reference, src/StreamThread.cc:195-243; here called after
        keyframe insertion). Erased/reused slots are re-announced."""
        kf_valid = np.asarray(state.kf_valid[:n_kf])
        kf_seq = np.asarray(state.kf_seq[:n_kf])
        for k in range(n_kf):
            if kf_valid[k] and self._sent_kfs.get(k) != int(kf_seq[k]):
                self.server.receive(self.cid, encode_keyframe_delta(state, k, INSERT))
                self._sent_kfs[k] = int(kf_seq[k])
        live = [k for k in sorted(self._sent_kfs) if k < n_kf and kf_valid[k]]
        if live:
            ids = np.asarray(live, np.int32)
            self.server.receive(self.cid, encode_pose_update(state, ids))
