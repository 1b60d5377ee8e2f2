"""Pipelined online tracking: deferred-decision hot path.

The pipelined mode (SlamSystem(pipelined=True)) removes every per-frame
device->host round trip: frame programs are dispatched without waiting for
their statistics, and the state machine decides about frame k when its stats
arrive (<= pipeline_depth frames later). These tests pin the invariants that
make that safe: no frame is ever dropped from the trajectory, keyframes and
loop closures still happen, export APIs flush the in-flight window, and the
lazy trajectory materialization preserves redirect semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor, TrackState
from orb_slam2v2_1_tpu.utils.config import SlamConfig
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.trajectory import Trajectory


def _cfg(**kw):
    base = dict(
        fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
        n_features=1000, max_keyframes=32, max_map_points=8192, fps=10.0,
        bf=44.0, th_depth=100.0,
    )
    base.update(kw)
    return SlamConfig(**base)


def _desk_frames(n):
    rng = np.random.default_rng(7)
    scene = synthetic.make_desk(rng)
    poses = synthetic.desk_trajectory(n)
    poses = [p @ np.linalg.inv(poses[0]) for p in poses]
    cfg = _cfg()
    K = jnp.asarray(cfg.K)
    return cfg, poses, [
        synthetic.render(scene, jnp.asarray(T), K, cfg.width, cfg.height)
        for T in poses
    ]


def test_pipelined_requires_async():
    with pytest.raises(ValueError):
        SlamSystem(config=_cfg(), sensor=Sensor.RGBD, pipelined=True)


def test_pipelined_tracks_and_flushes():
    cfg, poses, frames = _desk_frames(14)
    slam = SlamSystem(
        config=cfg, sensor=Sensor.RGBD, async_mapping=True, pipelined=True
    )
    outs = [
        slam.track_rgbd(im, d, timestamp=i / 10.0)
        for i, (im, d) in enumerate(frames)
    ]
    slam.flush()
    assert not slam._pending
    assert slam.state == TrackState.OK
    assert slam.n_resets == 0
    # Every frame produced a pose and a trajectory entry (none dropped by
    # the in-flight window).
    assert sum(o is not None for o in outs) == len(frames)
    assert len(slam.trajectory.entries) == len(frames)
    assert slam.n_kf_host >= 2  # keyframe policy fired through the drain
    # Deferred decisions must not cost accuracy: poses stay near ground
    # truth on this clean sequence.
    errs = [
        float(np.linalg.norm(np.asarray(o)[:3, 3] - poses[k][:3, 3]))
        for k, o in enumerate(outs)
    ]
    assert max(errs) < 0.6, errs

    st = slam.stats()
    assert st["state"] == "OK"
    assert st["track_ms_p50"] is not None and st["track_ms_p50"] > 0
    assert st["n_kf"] == slam.n_kf_host
    assert st["in_flight"] == 0

    # Export APIs flush + materialize the lazy trajectory.
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        slam.save_trajectory_tum(td + "/t.txt")
        lines = open(td + "/t.txt").read().splitlines()
        assert len(lines) == len(frames)
    slam.shutdown()


def test_health_gate_defers_pipelining():
    """Pipelining must NOT engage while the map is young: the first frames
    (init + early keyframes) take the synchronous path so keyframe decisions
    have zero lag exactly when the track is fragile."""
    cfg, _, frames = _desk_frames(8)
    slam = SlamSystem(
        config=cfg, sensor=Sensor.RGBD, async_mapping=True, pipelined=True
    )
    slam.track_rgbd(*frames[0], timestamp=0.0)
    assert not slam._pipelining_active()  # n_kf < 5: still sync
    for i, (im, d) in enumerate(frames[1:4], start=1):
        slam.track_rgbd(im, d, timestamp=i / 10.0)
    # The deque only ever fills once health was established.
    if slam._pending:
        assert slam.n_kf_host >= 5
    slam.shutdown()


def test_trajectory_lazy_materialize_and_redirect():
    tr = Trajectory()
    T_dev = jnp.asarray(np.diag([1.0, 1.0, 1.0, 1.0]))
    tr.append_rel(0.0, 3, T_dev)  # device array: stays lazy
    tr.append_rel(0.1, 3, np.eye(4))  # np: eager
    shift = np.eye(4)
    shift[0, 3] = 2.0
    tr.redirect_kf(3, 1, shift)
    assert all(e.ref_kf == 1 for e in tr.entries)
    # Lazy entry accumulated the redirect as `post`; eager applied it.
    assert tr.entries[0].post is not None
    assert np.allclose(tr.entries[1].T_rel[0, 3], 2.0)
    tr._materialize()
    assert tr.entries[0].post is None
    assert np.allclose(tr.entries[0].T_rel[0, 3], 2.0)
    # Absolute poses resolve through the (identity) keyframe pose.
    kf_poses = np.broadcast_to(np.eye(4), (4, 4, 4)).copy()
    out = tr.absolute_poses(kf_poses)
    assert len(out) == 2
