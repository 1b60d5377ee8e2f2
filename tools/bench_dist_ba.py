"""Distributed-BA scaling measurement: LM-step throughput vs mesh size.

Runs the sharded LM chunk (3 iterations, the GBA runner's chunk unit) on the
production-scale problem (C=128, P=16384, O=65536) over 1/2/4/8-device
meshes and prints a step-throughput table. On the CI host the devices are
XLA virtual CPU devices sharing physical cores, so the numbers measure
partition overhead (collective insertion, shard bookkeeping), not real ICI
scaling — on TPU hardware each mesh column maps to real chips and the
per-device observation work shrinks as O/n.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/bench_dist_ba.py
"""

import os
import sys
import time

# Force-set: the container sitecustomize presets JAX_PLATFORMS=axon and
# XLA_FLAGS before user code runs; setdefault would lose.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

from __graft_entry__ import _make_problem
from orb_slam2v2_1_tpu.parallel import dist_ba


def main():
    rng = np.random.default_rng(0)
    C, Pn, O = 128, 16384, 65536
    prob = _make_problem(rng, C, Pn, O)
    iters = 3

    print(f"problem: C={C} P={Pn} O={O}, chunk={iters} LM iters (cg_iters=24)")
    print(f"{'devices':>8} {'ms/chunk':>10} {'LM steps/s':>11} {'speedup':>8} {'eff':>6}")
    base = None
    for n in (1, 2, 4, 8):
        if n > jax.device_count():
            break
        mesh = Mesh(np.array(jax.devices()[:n]), ("obs",))
        chunk = dist_ba.get_sharded_lm_chunk(mesh, iters=iters, robust=True, cg_iters=24)
        lam = jnp.float32(1e-4)
        out = chunk(prob.poses, prob.points, prob.obs, prob.cam_fixed, prob.K, prob.bf, lam)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = chunk(
                prob.poses, prob.points, prob.obs, prob.cam_fixed, prob.K,
                prob.bf, lam,
            )
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        sps = iters / dt
        if base is None:
            base = dt
        print(
            f"{n:>8} {dt * 1e3:>10.1f} {sps:>11.2f} {base / dt:>8.2f}"
            f" {base / dt / n:>6.2f}"
        )


if __name__ == "__main__":
    main()
