"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (SURVEY §4 "multi-host
without a cluster").

Note: the container's sitecustomize registers the axon TPU backend into every
Python process and presets JAX_PLATFORMS=axon; backend *initialization* (the
slow TPU claim) is lazy, so overriding jax_platforms here — before any
computation — keeps tests hermetic and fast on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache():
    """Drop compiled executables after each test module.

    The suite compiles many LARGE fused programs (whole-sequence scans,
    keyframe-insertion pipelines, sharded solves); keeping them all resident
    in one process eventually aborts the XLA CPU compiler mid-suite
    (observed as 'Fatal Python error: Aborted' in backend_compile around the
    55% mark). Per-module clearing bounds residency; within-module caching —
    the reuse that matters — is unaffected."""
    yield
    jax.clear_caches()
