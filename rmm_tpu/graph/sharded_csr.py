"""Graph-partition parallelism: edge-chunk sharding of the HBM CSR.

SURVEY §2.3's graph-partition row — the reference keeps the full graph
host-resident (``src/datasets/util/graph.py:31-53``); this framework's
device sampler keeps it HBM-resident but REPLICATED per chip. For giant
graphs whose O(E) adjacency outgrows one chip's HBM, this module shards
the edge payload across a mesh axis the TPU-native way:

* nodes are partitioned into ``n_shards`` CONTIGUOUS row ranges with
  boundaries at equal EDGE quantiles of the CSR indptr (edge-chunk
  balancing — each shard holds ~E/D adjacency entries no matter how
  skewed the degree distribution);
* each shard stores its chunk of ``nbr``/``eid`` (the O(E) payload)
  plus a full-length LOCAL indptr whose rows outside the owned range
  have degree 0 — O(N) int32, the cheap part — so the ranked-expansion
  kernel (:func:`~rmm_tpu.graph.device_sampler._expand_ranked`) runs
  UNCHANGED on a shard: rank allocation simply assigns no lanes to
  rows the shard does not own;
* per hop, the fixed-size per-shard candidate buffers ``all_gather``
  over the mesh axis (ICI) and the overflow counters psum — see
  ``_expand_all(axis_name=...)``. Every shard then computes identical
  frontiers from the gathered (replicated) arrays, so the hop loop
  needs exactly ONE collective pair per hop.

The global ``src``/``dst`` endpoint lookups stay replicated (O(E) int32
but read-only id maps; shard them with the feature tables via the TP row
sharding if they too outgrow a chip).

Consumed under ``shard_map``: :func:`shard_parts` returns (parts, specs)
whose leaves shard dim 0 over the graph axis, and
:func:`local_device_graph` rebuilds the per-device
:class:`~rmm_tpu.graph.device_sampler.DeviceGraph` view inside the
program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .device_sampler import DeviceGraph


@dataclasses.dataclass
class ShardedDeviceGraph:
    """Stacked per-shard CSR chunks ([D, ...] leaves) + replicated id maps."""

    indptr: jnp.ndarray        # [D, N+1] local indptr (0-degree off-shard)
    nbr: jnp.ndarray           # [D, Emax] padded edge chunks
    eid: jnp.ndarray           # [D, Emax]
    src: jnp.ndarray           # [E_total] replicated global endpoints
    dst: jnp.ndarray           # [E_total]
    out_indptr: Optional[jnp.ndarray] = None   # undirected expansion
    out_nbr: Optional[jnp.ndarray] = None
    out_eid: Optional[jnp.ndarray] = None
    n_shards: int = 1

    @property
    def has_out(self) -> bool:
        return self.out_indptr is not None

    @classmethod
    def from_device_graph(cls, dg: DeviceGraph,
                          n_shards: int) -> "ShardedDeviceGraph":
        """Partition a replicated :class:`DeviceGraph` into ``n_shards``
        edge-balanced row-range chunks."""
        indptr, nbr, eid = _split_csr(dg.indptr, dg.nbr, dg.eid, n_shards)
        out = (None, None, None)
        if dg.out_indptr is not None:
            out = _split_csr(dg.out_indptr, dg.out_nbr, dg.out_eid,
                             n_shards)
        return cls(indptr=indptr, nbr=nbr, eid=eid, src=dg.src, dst=dg.dst,
                   out_indptr=out[0], out_nbr=out[1], out_eid=out[2],
                   n_shards=n_shards)

    # -- shard_map plumbing --------------------------------------------
    def shard_parts(self, axis: str) -> Tuple[tuple, tuple]:
        """(parts, in_specs) for passing this graph through ``shard_map``:
        the [D, ...] chunk leaves shard dim 0 over ``axis``; the global id
        maps replicate."""
        from jax.sharding import PartitionSpec as P

        parts = [self.indptr, self.nbr, self.eid, self.src, self.dst]
        specs = [P(axis), P(axis), P(axis), P(), P()]
        if self.has_out:
            parts += [self.out_indptr, self.out_nbr, self.out_eid]
            specs += [P(axis), P(axis), P(axis)]
        return tuple(parts), tuple(specs)

    @staticmethod
    def local_device_graph(parts: tuple) -> DeviceGraph:
        """Rebuild the per-device local view inside ``shard_map`` (each
        sharded leaf arrives as [1, ...])."""
        has_out = len(parts) == 8
        return DeviceGraph(
            indptr=parts[0][0], nbr=parts[1][0], eid=parts[2][0],
            src=parts[3], dst=parts[4],
            out_indptr=parts[5][0] if has_out else None,
            out_nbr=parts[6][0] if has_out else None,
            out_eid=parts[7][0] if has_out else None)

    def chunk_sizes(self) -> np.ndarray:
        """Per-shard adjacency entry counts (edge-balance diagnostic)."""
        ip = np.asarray(self.indptr)
        return ip[:, -1].astype(np.int64)


def _split_csr(indptr, nbr, eid, n_shards: int):
    """Edge-quantile row partition of one CSR view.

    Boundary row b_k = first row whose cumulative edge count reaches
    k·E/D (binary search on indptr), so chunk k covers rows
    [b_k, b_{k+1}) and adjacency entries [indptr[b_k], indptr[b_{k+1}}).
    The local indptr is ``clip(indptr, e0, e1) - e0``: zero degree
    outside the owned range, chunk-relative offsets inside."""
    ip = np.asarray(indptr, np.int64)
    nb = np.asarray(nbr)
    ei = np.asarray(eid)
    n_rows = ip.shape[0] - 1
    E = int(ip[-1])
    targets = [(E * k) // n_shards for k in range(n_shards + 1)]
    bounds = np.searchsorted(ip, targets, side="left").astype(np.int64)
    bounds[0], bounds[-1] = 0, n_rows
    e_lo = ip[bounds[:-1]]
    e_hi = ip[bounds[1:]]
    emax = int(max((e_hi - e_lo).max(), 1))
    lp = np.empty((n_shards, n_rows + 1), np.int32)
    nbs = np.zeros((n_shards, emax), np.int32)
    eis = np.zeros((n_shards, emax), np.int32)
    for k in range(n_shards):
        lo, hi = int(e_lo[k]), int(e_hi[k])
        lp[k] = (np.clip(ip, lo, hi) - lo).astype(np.int32)
        nbs[k, : hi - lo] = nb[lo:hi]
        eis[k, : hi - lo] = ei[lo:hi]
    return jnp.asarray(lp), jnp.asarray(nbs), jnp.asarray(eis)
