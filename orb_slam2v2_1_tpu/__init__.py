"""orb_slam2v2_1_tpu — a TPU-native sparse visual SLAM framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
ORB_SLAM2v2 system (monocular / stereo / RGB-D real-time SLAM with ORB
features, covisibility-graph mapping, loop closing, relocalization, map
persistence and a multi-session map server).

Architecture stance (vs. the reference's pointer-graph + mutex C++ design):
  * All map state is struct-of-arrays with static capacity + validity masks.
  * All hot-path computation is batched, jitted device code (Pallas kernels
    for ORB extraction / Hamming matching; XLA for the LM/BA linear algebra).
  * Data-dependent control flow (RANSAC, candidate cascades) is reformulated
    as fixed-shape batched hypothesis evaluation with masking.
  * Concurrency is a host-side scheduler dispatching device programs, not
    mutexes; distribution is jax.sharding over a Mesh, not ROS pub/sub.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry estimation is precision-critical: TPU MXU default-precision f32
# matmuls cost ~1e-2 relative error, enough to lose tracking (measured:
# 25/40 vs 40/40 frames on the same sequence). Descriptor Hamming matmuls
# are exact integers at any precision, so the only cost is a slightly slower
# MXU path on ops that are microseconds anyway.
_jax.config.update("jax_default_matmul_precision", "highest")
