"""Test configuration: CPU backend with 8 virtual devices + fp64.

Tests validate numerics in fp64 against the reference's fp64 semantics and
exercise multi-device sharding on a virtual CPU mesh (no multi-chip TPU
hardware in this environment). The axon TPU plugin's sitecustomize forces
`jax_platforms="axon,cpu"` at interpreter start, so we must override via
jax.config (env vars alone are ignored) before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _jax_cache_fence():
    """Clear XLA compilation caches between test MODULES.

    A single pytest process running the whole suite used to SEGFAULT in
    XLA-CPU compilation after ~200 tests: compiled-executable memory
    accumulates monotonically across modules (each module compiles many
    distinctly-shaped programs) until the compiler allocator falls over.
    Clearing per module bounds resident compiled programs by the largest
    single module, which lets the suite run in a few big chunks
    (tools/run_tests.sh) instead of 10 isolated processes."""
    yield
    jax.clear_caches()
