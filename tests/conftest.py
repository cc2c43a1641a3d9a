"""Test configuration: force an 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). Must run before any jax import in
tests, so we configure here at collection time."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself via JAX_PLATFORMS=axon (sitecustomize);
# tests must run hermetically on CPU.
jax.config.update("jax_platforms", "cpu")
