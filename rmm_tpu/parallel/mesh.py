"""Device mesh construction.

The reference has NO multi-device parallelism (SURVEY §2.3: single-GPU Slurm
tasks, no torch.distributed). The TPU-native scale-out is a
``jax.sharding.Mesh`` with a ``data`` axis: per-chip sampler feeds,
gradient ``pmean`` over ICI (§2.3 table, DP row). TP/PP are structurally
unnecessary for these ≤ few-M-param models; the mesh API still exposes a
``model`` axis for sharded embedding tables if a dataset's categorical
vocabulary ever outgrows one chip.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
