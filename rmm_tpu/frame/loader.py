"""DataLoader over a TensorFrame.

Replaces ``torch_frame.data.DataLoader`` usage in the reference
(``main.py:288-290``, ``benchmark.py:141-143``). TPU-native differences:
batches are padded to a fixed ``batch_size`` (static shapes → one XLA
compile), with a ``valid`` count carried alongside; shuffling is seeded and
reproducible.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np

from .tensor_frame import TensorFrame


class DataLoader:
    def __init__(
        self,
        tensor_frame: TensorFrame,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_to_batch: bool = True,
        seed: int = 0,
    ):
        self.tf = tensor_frame.to_numpy()
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_to_batch = pad_to_batch
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = self.tf.num_rows
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[TensorFrame, int]]:
        n = self.tf.num_rows
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_to_batch and len(idx) > 0:
                    pad = np.broadcast_to(
                        idx[-1:], (self.batch_size - len(idx),))
                    valid = len(idx)
                    idx = np.concatenate([idx, pad])
                    yield self.tf[idx], valid
                    return
            yield self.tf[idx], len(idx)
