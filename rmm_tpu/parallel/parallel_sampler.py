"""Parallel host sampling: overlap C++ k-hop sampling across a thread pool.

The reference parallelizes batch assembly with DataLoader worker PROCESSES
(``main.py:288``); here the sampler is C++ behind ctypes (which releases
the GIL), so plain threads scale it across host cores with zero pickling.
Feeds the scan-dispatch groups: while the device runs group k, the pool
samples group k+1.
"""
from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterable, Iterator


class ParallelBatchIterator:
    """Map ``build_batch`` over ``items`` with a thread pool, preserving
    order, keeping at most ``prefetch`` results in flight."""

    def __init__(self, items: Iterable, build_batch: Callable,
                 num_threads: int = 4, prefetch: int = 16):
        self._items = iter(items)
        self._build = build_batch
        self._pool = cf.ThreadPoolExecutor(max_workers=num_threads)
        self._prefetch = max(prefetch, num_threads)
        self._queue: list[cf.Future] = []
        self._fill()

    def _fill(self):
        while len(self._queue) < self._prefetch:
            try:
                item = next(self._items)
            except StopIteration:
                return
            self._queue.append(self._pool.submit(self._build, item))

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if not self._queue:
            self._pool.shutdown(wait=False)
            raise StopIteration
        fut = self._queue.pop(0)
        self._fill()
        return fut.result()

    def close(self):
        for f in self._queue:
            f.cancel()
        self._pool.shutdown(wait=False)
