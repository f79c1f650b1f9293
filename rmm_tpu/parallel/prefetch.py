"""Host-side prefetch pipeline.

Replaces the reference's ``DataLoader(num_workers=4, pin_memory=True)``
(``main.py:288``, ``benchmark.py:141``): a background thread runs the C++
sampler + batch assembly for upcoming steps and issues ``jax.device_put``
ahead of time so the device never waits on the host (double buffering over
the host→device DMA instead of pinned-memory copies).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


class Prefetcher:
    def __init__(self, batch_iter: Iterable, depth: int = 2,
                 device_put: bool = True, sharding=None):
        self._iter = iter(batch_iter)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._device_put = device_put
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._iter:
                if self._device_put:
                    item = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, self._sharding)
                        if x is not None else None, item)
                self._q.put(item)
        except BaseException as e:  # surfaced on next()
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
