"""Monocular-initialization acceptance threshold: 70 vs the reference's 100.

SlamSystem accepts two-view init at >=70 matches (vs src/Tracking.cc:741's
100) on the argument that the parallax gate in twoview.py already rejects
degenerate small-baseline pairs. This pins both halves of that argument on
marginal-baseline pairs (VERDICT r4 leftover):
  * pairs in the 70..99 match band that pass the gate reconstruct the true
    relative motion accurately (the extra 30 matches buy nothing);
  * a near-zero-baseline pair with MANY matches is still rejected.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models import initialization, tracking
from orb_slam2v2_1_tpu.ops import orb, twoview
from orb_slam2v2_1_tpu.utils import synthetic

K = jnp.asarray([550.0, 550.0, 320.0, 240.0])
W, H = 640, 480
OCFG = orb.OrbConfig(n_features=1000)


def _frame(scene, Tcw, fid):
    img, _ = synthetic.render(scene, jnp.asarray(Tcw), K, W, H)
    f = orb.extract_orb(img, OCFG)
    n = f.xy.shape[0]
    return tracking.FrameData(
        xy=f.xy, level=f.level, angle=f.angle, desc=f.desc,
        desc_pm1=f.desc_pm1, kp_valid=f.valid,
        ur=jnp.full(n, -1.0, jnp.float32), depth=jnp.full(n, -1.0, jnp.float32),
        pose=jnp.eye(4), mp=jnp.full(n, -1, jnp.int32), frame_id=jnp.int32(fid),
    )


def _pose(x, yaw=0.0):
    from orb_slam2v2_1_tpu.ops import lie

    xi = np.array([x, 0.0, 0.0, 0.0, yaw, 0.0], np.float32)
    Twc = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    return np.linalg.inv(Twc).astype(np.float32)


def test_marginal_match_band_reconstructs_true_motion():
    # Match count decays with baseline (viewpoint drift); wide-baseline desk
    # pairs walk the count down through the marginal band the 70-threshold
    # admits and the reference's 100 would reject.
    scene = synthetic.make_desk(np.random.default_rng(7))
    f0 = _frame(scene, _pose(0.0), 0)
    checked = 0
    for bl in (0.24, 0.28, 0.30, 0.33, 0.36, 0.40):
        gtT = _pose(bl, yaw=-np.arctan2(bl, 2.2) * 0.6)
        f1 = _frame(scene, gtT, 1)
        m = initialization.match_for_initialization(f0, f1)
        n_matches = int(m.ok.sum())
        if not (70 <= n_matches < 100):
            continue
        res = jax.jit(twoview.initialize_two_view)(
            f0.xy, f1.xy[m.idx], m.ok, K, jax.random.key(3)
        )
        if not bool(res.success):
            continue  # the gate may reject; that is its prerogative
        # Translation direction must match ground truth (scale is free).
        t = np.asarray(res.t)
        gt = gtT[:3, 3]
        cos = abs(t @ gt) / (np.linalg.norm(t) * np.linalg.norm(gt) + 1e-9)
        assert cos > 0.98, (bl, n_matches, cos)
        checked += 1
    assert checked >= 1, "no marginal-band pair both matched and initialized"


def test_tiny_baseline_rejected_despite_many_matches():
    scene = synthetic.make_desk(np.random.default_rng(7))
    f0 = _frame(scene, _pose(0.0), 0)
    f1 = _frame(scene, _pose(0.002), 1)  # 2 mm: no usable parallax
    m = initialization.match_for_initialization(f0, f1)
    assert int(m.ok.sum()) >= 70  # plenty of matches...
    res = jax.jit(twoview.initialize_two_view)(
        f0.xy, f1.xy[m.idx], m.ok, K, jax.random.key(3)
    )
    assert not bool(res.success)  # ...and still rejected by the gate
