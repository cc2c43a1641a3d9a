"""Multiprocess sample loading — the TPU-side analogue of torch DataLoader
workers (reference uses num_workers>0 DataLoaders everywhere,
unified_datasets.py:385-395).

The Dirichlet/span masking + transforms are host-side Python (SURVEY.md hard
part #5): on a many-core host they must run in parallel processes to feed a
v5e-8. `MultiprocessLoader` spawns N workers, each building its own dataset
iterator via a picklable factory with a distinct seed/offset (matching the
reference's per-worker independent shard resampling semantics,
unified_datasets.py:371-373), and interleaves their batches through a bounded
queue.
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
import queue as queue_mod
from typing import Any, Callable, Iterator, Optional

_SENTINEL = "__fourm_loader_end__"


def _worker(factory, worker_id: int, num_workers: int, q, max_items: Optional[int]):
    try:
        it = factory(worker_id, num_workers)
        if max_items is not None:
            it = itertools.islice(it, max_items)
        for item in it:
            q.put(item)
    except Exception as e:  # surface worker crashes to the consumer
        q.put((_SENTINEL, f"worker {worker_id} failed: {e!r}"))
        return
    q.put((_SENTINEL, None))


class MultiprocessLoader:
    """Iterate items produced by `factory(worker_id, num_workers)` across
    `num_workers` processes.

    factory must be picklable (module-level function / functools.partial of
    one). Each worker should derive its RNG from worker_id so streams differ —
    exactly how the reference's webdataset workers independently resample
    shards. num_workers=0 runs inline (debug parity with torch DataLoader).
    """

    def __init__(self, factory: Callable[[int, int], Iterator[Any]],
                 num_workers: int = 4, prefetch: int = 8,
                 max_items_per_worker: Optional[int] = None,
                 mp_context: str = "spawn"):
        self.factory = factory
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.max_items_per_worker = max_items_per_worker
        self.ctx = mp.get_context(mp_context)

    def __iter__(self):
        if self.num_workers == 0:
            yield from self.factory(0, 1)
            return
        q = self.ctx.Queue(maxsize=max(self.prefetch, self.num_workers))
        procs = [
            self.ctx.Process(
                target=_worker,
                args=(self.factory, i, self.num_workers, q, self.max_items_per_worker),
                daemon=True,
            )
            for i in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        finished = 0
        error = None
        try:
            while finished < self.num_workers:
                try:
                    item = q.get(timeout=300)
                except queue_mod.Empty:
                    raise RuntimeError("data workers stalled for 300s") from None
                if isinstance(item, tuple) and len(item) == 2 and item[0] == _SENTINEL:
                    finished += 1
                    if item[1] is not None and error is None:
                        error = item[1]
                    continue
                yield item
        finally:
            for p in procs:
                p.terminate()
        if error is not None:
            raise RuntimeError(error)
