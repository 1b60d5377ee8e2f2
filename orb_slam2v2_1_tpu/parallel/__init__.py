"""Multi-device execution: observation-sharded bundle adjustment over a Mesh.

The reference's "distribution" is ROS pub/sub map streaming (SURVEY §2.3);
the TPU-native analog for the *compute* is sharding the BA observation set
across devices and all-reducing the Schur-reduced camera system over ICI
(`psum`), exactly as a data-parallel training step all-reduces gradients.
"""
