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
