"""Visualization (utils/viz.py): PNG encoding, frame overlay, map rendering —
the FrameDrawer/MapDrawer analogs (reference src/FrameDrawer.cc, MapDrawer.cc).
"""

import struct
import zlib

import numpy as np
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models.map_state import append_keyframe, empty_map
from orb_slam2v2_1_tpu.utils import viz


def _tiny_map(rng, n_kf=3, n_pts=40, n_kp=32):
    state = empty_map(8, 128, n_kp)
    pts = np.stack(
        [rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts), rng.uniform(2, 4, n_pts)],
        -1,
    )
    state = state._replace(
        mp_pos=state.mp_pos.at[:n_pts].set(jnp.asarray(pts)),
        mp_valid=state.mp_valid.at[:n_pts].set(True),
        n_mp=jnp.int32(n_pts),
    )
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * k
        state, _ = append_keyframe(
            state, jnp.asarray(T), jnp.int32(k),
            jnp.zeros((n_kp, 2)), jnp.zeros(n_kp, jnp.int32), jnp.zeros(n_kp),
            jnp.zeros((n_kp, 8), jnp.uint32), jnp.ones(n_kp, bool),
            jnp.full(n_kp, -1.0), jnp.arange(n_kp, dtype=jnp.int32) % n_pts,
        )
    return state


def test_write_png_valid_signature_and_dims(tmp_path, rng):
    img = (rng.uniform(0, 255, (13, 17, 3))).astype(np.uint8)
    path = tmp_path / "x.png"
    viz.write_png(path, img)
    raw = path.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (17, 13)
    # IDAT decompresses to H rows of 1 filter byte + W*3 pixels.
    idat_start = raw.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", raw[raw.index(b"IDAT") - 4:raw.index(b"IDAT")])[0]
    data = zlib.decompress(raw[idat_start:idat_start + idat_len])
    assert len(data) == 13 * (1 + 17 * 3)


def test_draw_frame_marks_tracked_features(rng):
    gray = np.zeros((48, 64))
    xy = np.array([[10.0, 10.0], [40.0, 30.0]])
    out = viz.draw_frame(gray, xy, np.array([True, False]), np.ones(2, bool), "OK")
    assert out.shape == (48 + 14, 64, 3)
    # Green square around the tracked feature.
    assert (out[7:14, 7:14, 1] == 255).any()
    # Blue-ish square around the untracked one.
    assert (out[28:33, 38:43, 2] == 255).any()


def test_draw_map_renders_points_and_keyframes(rng):
    state = _tiny_map(rng)
    img = viz.draw_map(state, size=200, cur_pose=np.eye(4))
    assert img.shape == (200, 200, 3)
    assert img.sum() > 0  # something was drawn
    # red current-camera marker present
    assert ((img[:, :, 0] == 255) & (img[:, :, 1] == 60)).any()


def test_frame_recorder_writes_files(tmp_path, rng):
    state = _tiny_map(rng)

    class F:
        xy = np.zeros((4, 2))
        mp = np.array([0, 1, -1, -1])
        kp_valid = np.ones(4, bool)
        pose = np.eye(4)

    rec = viz.FrameRecorder(tmp_path, every=1, map_every=2)
    for _ in range(3):
        rec.record(np.zeros((32, 32)), F(), state, "OK")
    assert len(list(tmp_path.glob("frame_*.png"))) == 3
    assert len(list(tmp_path.glob("map_*.png"))) == 2
