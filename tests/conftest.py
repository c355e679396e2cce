"""Test harness: force JAX onto 8 virtual CPU devices.

All unit/integration tests run on the CPU backend with an 8-device virtual
topology so sharding/collective code paths are exercised without TPU
hardware (SURVEY.md §4 test strategy). Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
