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
