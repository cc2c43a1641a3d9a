"""Multi-host SPMD bring-up (reference torchrun + NCCL init, dist.py:31-100).

On a multi-host TPU slice each host runs the SAME program; call
`initialize_multihost()` first — it wires `jax.distributed.initialize`
(coordinator discovery comes from the TPU runtime on Cloud TPU, or explicit
args elsewhere), after which `jax.devices()` spans the slice and every mesh in
`parallel.mesh` lays out (data, fsdp, tensor) over ICI within the slice and
DCN across slices automatically.

Data side: per-host input pipelines should shard/resample independently —
pass `process_index()`/`process_count()` as (shard_id, num_shards) into the
dataset builders (matching the reference's per-worker independent shard
resampling, unified_datasets.py:371-373).
"""

from __future__ import annotations

from typing import Optional

import jax

# set the first time initialize_multihost succeeds (or falls back to
# single-process); public signal so re-entry is a no-op without touching
# JAX internals
_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime. No-ops when single-process.

    On Cloud TPU pods all three args are discovered automatically; on other
    clusters pass them explicitly (the analogue of torchrun's env rank vars the
    reference reads in dist.py:78-90).

    NOTE: must run before anything touches the XLA backend, so the re-entry
    check can't call jax.process_count() (which would initialize the backend
    and make jax.distributed.initialize fail). We track our own flag and
    additionally treat JAX's own "already initialized" RuntimeError as a
    benign no-op (covers initialization done outside this function)."""
    global _initialized
    if _initialized:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        if "already initialized" in str(e).lower():
            _initialized = True
            return
        # single-process runs (tests, one chip) land here — keep going
        if num_processes not in (None, 1):
            raise
        print(f"[dist] single-process mode ({e})")
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for logging/checkpoint side effects (reference
    dist.py:31-43 patches print; we gate explicitly)."""
    return jax.process_index() == 0
