"""Map save/load + reuse tests (SURVEY §5 checkpoint/resume)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models.map_state import empty_map, append_keyframe
from orb_slam2v2_1_tpu.utils import serialization


def _toy_map(rng):
    state = empty_map(8, 64, 32)
    for k in range(3):
        state, _ = append_keyframe(
            state,
            jnp.eye(4).at[0, 3].set(float(k)),
            jnp.int32(k * 5),
            jnp.asarray(rng.uniform(0, 640, (32, 2)).astype(np.float32)),
            jnp.zeros(32, jnp.int32),
            jnp.zeros(32),
            jnp.asarray(rng.integers(0, 2**32, (32, 8), dtype=np.uint64).astype(np.uint32)),
            jnp.ones(32, bool),
            jnp.full(32, -1.0),
            jnp.arange(32, dtype=jnp.int32) % 16,
        )
    state = state._replace(
        mp_pos=state.mp_pos.at[:16].set(
            jnp.asarray(rng.normal(0, 1, (16, 3)).astype(np.float32))
        ),
        mp_valid=state.mp_valid.at[:16].set(True),
        n_mp=jnp.int32(16),
    )
    return state


def test_roundtrip(tmp_path, rng):
    state = _toy_map(rng)
    path = tmp_path / "map.npz"
    serialization.save_map(state, path, metadata={"ref_kf": 2})
    loaded, meta = serialization.load_map(path)
    assert int(meta["ref_kf"]) == 2
    for name in state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, name)), np.asarray(getattr(loaded, name)),
            err_msg=name,
        )


def test_version_guard(tmp_path, rng):
    state = _toy_map(rng)
    path = tmp_path / "map.npz"
    serialization.save_map(state, path)
    # Corrupt the version.
    data = dict(np.load(path))
    data["format_version"] = np.int32(999)
    np.savez_compressed(path, **data)
    try:
        serialization.load_map(path)
        assert False, "should have raised"
    except ValueError as e:
        assert "999" in str(e)
