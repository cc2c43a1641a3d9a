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

# The suite is XLA-CPU compile-bound on the 1-core driver box. Many tests
# compile the SAME tiny-model program through different closures — the
# in-process jit cache misses (it keys on function identity) but the
# persistent cache keys on HLO fingerprint and dedupes them, both within one
# invocation and across runs. Keyed off the repo so `pytest` from any cwd
# shares it; harmless if creation fails (read-only checkouts).
try:
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache_cpu_tests")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass
