"""Seeding and profiling helpers.

Seeds: reference fourm/utils/seeds.py (per-worker deterministic seeds). Profiling:
the reference has none (SURVEY.md §5); here jax.profiler traces + a simple
step-time context replace it.
"""

from __future__ import annotations

import contextlib
import hashlib
import time
from typing import Optional

import numpy as np


def seed_everything(seed: int):
    """Seed python + numpy (JAX uses explicit keys)."""
    import random

    random.seed(seed)
    np.random.seed(seed % (2**32))


def worker_seed(base_seed: int, worker_id: int, host_id: int = 0) -> int:
    """Deterministic per-worker seed (reference seeds.py:16 style hash)."""
    digest = hashlib.sha256(f"{base_seed}-{host_id}-{worker_id}".encode()).hexdigest()
    return int(digest, 16) % (2**31)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope; viewable in TensorBoard / Perfetto."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str, results: Optional[dict] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
