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
    missing = [n for n in MapState._fields if f"map_{n}" not in data.files]
    defaults = None
    if missing:
        # Older snapshot: take shapes/defaults for absent fields from a
        # fresh map of the same capacity, then refresh derived caches.
        from ..models.map_state import empty_map

        defaults = empty_map(
            int(data["map_kf_valid"].shape[0]),
            int(data["map_mp_valid"].shape[0]),
            int(data["map_kf_mp"].shape[1]),
        )
    fields = {}
    for name in MapState._fields:
        key = f"map_{name}"
        if key in data.files:
            fields[name] = jnp.asarray(data[key])
        else:
            fields[name] = getattr(defaults, name)
    meta = {
        k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
    }
    state = MapState(**fields)
    if missing:
        from ..models.map_state import refresh_covis

        # Derive what we can: covis from observations; seq from slot order
        # (old snapshots never culled, so slot order == insertion order).
        if "kf_seq" in missing:
            order = jnp.where(
                state.kf_valid, jnp.arange(state.kf_valid.shape[0]), -1
            ).astype(jnp.int32)
            state = state._replace(
                kf_seq=order, n_seq=jnp.int32(int(state.n_kf))
            )
        state = refresh_covis(state)
    return state, meta


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
