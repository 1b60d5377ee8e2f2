"""Map persistence: save/load the full map state as array snapshots.

Replaces the reference's boost binary serialization of Map +
KeyFrameDatabase (src/System.cc:807-994, BoostArchiver.h, per-class
`serialize` methods): the struct-of-arrays MapState IS the serialization
format — one compressed npz with a version header. On load the BoW database
is rebuilt by re-quantizing keyframe descriptors, mirroring the reference's
BoW recomputation on load (src/System.cc:867-875).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..models.map_state import MapState

FORMAT_VERSION = 1


def save_map(state: MapState, path: str | Path, metadata: dict | None = None):
    arrays = {f"map_{k}": np.asarray(v) for k, v in state._asdict().items()}
    arrays["format_version"] = np.int32(FORMAT_VERSION)
    for k, v in (metadata or {}).items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path: str | Path) -> tuple[MapState, dict]:
    data = np.load(path)
    version = int(data["format_version"])
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported map format {version}")
    fields = {}
    for name in MapState._fields:
        arr = data[f"map_{name}"]
        fields[name] = jnp.asarray(arr)
    meta = {
        k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
    }
    return MapState(**fields), meta


def rebuild_database(state: MapState, voc, max_kf: int, n_kp: int):
    """Re-quantize all keyframes into a fresh BoW database (the load-time
    BoW recomputation, src/System.cc:867-875)."""
    import jax

    from ..models import keyframe_database as kdb

    db = kdb.empty_database(max_kf, n_kp, voc.n_words)
    n_kf = int(state.n_kf)
    for k in range(n_kf):
        if bool(state.kf_valid[k]):
            db = kdb.add_keyframe(
                db, voc, jnp.int32(k), state.kf_desc[k], state.kf_kp_valid[k]
            )
    return db
