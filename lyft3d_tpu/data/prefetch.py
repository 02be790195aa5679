"""Background-thread batch prefetching.

Capability of the reference's DataLoader worker processes (SURVEY.md §2.7
"CPU data-loading parallelism": ``num_workers = os.cpu_count()*2`` etc.) —
host-side sample assembly overlaps device steps so the TPU never starves
(the reference's measured bottleneck was exactly this, the ``voxel_gene_time``
telemetry). Threads (not processes) suffice here because the heavy lifting
is numpy/C++ releasing the GIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

__all__ = ["ThreadedPrefetcher", "prefetch"]

_SENTINEL = object()


class ThreadedPrefetcher:
    """Wrap an iterator; ``depth`` batches are produced ahead by workers."""

    def __init__(self, make_iter: Callable[[], Iterable], depth: int = 4,
                 num_workers: int = 1):
        self.make_iter = make_iter
        self.depth = depth
        self.num_workers = num_workers

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        src = iter(self.make_iter())
        lock = threading.Lock()
        stop = threading.Event()
        errors: list = []

        def worker():
            while not stop.is_set():
                try:
                    with lock:
                        item = next(src)
                except StopIteration:
                    q.put(_SENTINEL)
                    return
                except Exception as e:  # surface loader errors to the consumer
                    errors.append(e)
                    q.put(_SENTINEL)
                    return
                q.put(item)

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        finished = 0
        try:
            while finished < self.num_workers:
                item = q.get()
                if item is _SENTINEL:
                    finished += 1
                    continue
                yield item
            if errors:
                raise errors[0]
        finally:
            stop.set()


def prefetch(iterable: Iterable, depth: int = 4) -> Iterator:
    """One-shot convenience wrapper."""
    return iter(ThreadedPrefetcher(lambda: iterable, depth=depth))
