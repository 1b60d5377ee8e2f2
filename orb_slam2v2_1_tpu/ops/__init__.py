"""Device-side numerical primitives (Lie groups, LM/Schur, ORB kernels, matching)."""
