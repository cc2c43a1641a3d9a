"""Test configuration: force an 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). Must run before any jax import in
tests, so we configure here at collection time."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# tests are XLA-CPU compile-bound on the 1-core box; backend optimization
# level 0 cuts compile ~30% with identical test results (it only changes
# how fast the compiled code runs, and test programs are tiny)
if "xla_backend_optimization_level" not in _flags:
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The axon TPU plugin force-registers itself via JAX_PLATFORMS=axon (sitecustomize);
# tests must run hermetically on CPU.
jax.config.update("jax_platforms", "cpu")
