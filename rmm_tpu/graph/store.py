"""Per-split graph store: train/val/test CSR graphs + samplers.

Rebuilds ``create_graph`` (``src/datasets/util/graph.py:8-61``): the train
graph holds split-0 edges, val holds splits {0,1}, test holds all edges;
each split gets its own :class:`~rmm_tpu.graph.sampler.NeighborSampler`, and
every edge keeps its GLOBAL row id into the edge table so sampled ids gather
features directly. Also provides port numbering
(``util/graph.py:81-102``) and ego-ID marking (``util/graph.py:112-145``)
as array ops.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from .build import load_library
from .sampler import NeighborSampler, SampledSubgraph


class GraphStore:
    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        split: Optional[np.ndarray] = None,
        timestamps: Optional[np.ndarray] = None,
        fanouts: Sequence[int] = (100, 100),
        num_nodes: Optional[int] = None,
        undirected: bool = False,
        seed: int = 0,
        use_native: bool = True,
    ):
        self.src = np.ascontiguousarray(src, np.int64)
        self.dst = np.ascontiguousarray(dst, np.int64)
        self.timestamps = (np.ascontiguousarray(timestamps, np.int64)
                           if timestamps is not None else None)
        self.num_edges = len(self.src)
        self.num_nodes = (int(num_nodes) if num_nodes is not None
                          else int(max(self.src.max(initial=-1),
                                       self.dst.max(initial=-1))) + 1)
        self.edge_ids = np.arange(self.num_edges, dtype=np.int64)
        self.fanouts = tuple(fanouts)
        self._use_native = use_native

        def make(mask, s):
            ei = np.stack([self.src[mask], self.dst[mask]])
            return NeighborSampler(ei, self.edge_ids[mask], self.num_nodes,
                                   fanouts=fanouts, undirected=undirected,
                                   seed=s, use_native=use_native)

        if split is not None:
            split = np.asarray(split)
            self.train_sampler = make(split == 0, seed)
            self.val_sampler = make(np.isin(split, (0, 1)), seed + 1)
            self.test_sampler = make(np.ones_like(split, dtype=bool), seed + 2)
        else:
            # no split: one shared graph (util/graph.py:55-61 behavior)
            self.test_sampler = make(np.ones(self.num_edges, dtype=bool), seed)
            self.train_sampler = self.test_sampler
            self.val_sampler = self.test_sampler

    def sampler(self, mode: str) -> NeighborSampler:
        try:
            return {"train": self.train_sampler, "val": self.val_sampler,
                    "test": self.test_sampler}[mode]
        except KeyError:
            raise ValueError(
                "Invalid sampling mode! Valid values: ['train', 'val', 'test']")

    # ------------------------------------------------------------------
    def sample_edges(self, seed_edges: np.ndarray, mode: str, max_edges: int,
                     max_nodes: int, rng_seed=None) -> SampledSubgraph:
        """seed_edges: [B, 3] rows (src, dst, edge_id) — the packed ``link``
        target of the reference (``util/graph.py:27-29``)."""
        se = np.asarray(seed_edges, dtype=np.int64)
        return self.sampler(mode).sample_edges(
            se[:, 0], se[:, 1], se[:, 2], max_edges, max_nodes, rng_seed)

    def sample_nodes(self, seed_nodes: np.ndarray, mode: str, max_edges: int,
                     max_nodes: int, rng_seed=None) -> SampledSubgraph:
        return self.sampler(mode).sample_nodes(
            np.asarray(seed_nodes, np.int64).reshape(-1), max_edges,
            max_nodes, rng_seed)

    # ------------------------------------------------------------------
    def in_degree_histogram(self) -> np.ndarray:
        """PNA degree histogram over the TRAIN graph (``main.py:283-286``)."""
        return self.train_sampler.in_degree_histogram()

    def ports(self) -> tuple[np.ndarray, np.ndarray]:
        """(in_ports, out_ports) per edge over the full graph
        (``util/graph.py:96-102`` computes them on the test graph)."""
        lib = load_library() if self._use_native else None
        if lib is not None:
            in_p = np.zeros(self.num_edges, dtype=np.float64)
            out_p = np.zeros(self.num_edges, dtype=np.float64)

            def p64(a):
                return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

            ts = (self.timestamps if self.timestamps is not None
                  else np.zeros(self.num_edges, dtype=np.int64))
            lib.rmm_ports(p64(self.src), p64(self.dst), p64(ts),
                          self.num_edges, self.num_nodes,
                          in_p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                          out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            return in_p, out_p
        return (_ports_numpy(self.dst, self.src, self.timestamps,
                             self.num_edges),
                _ports_numpy(self.src, self.dst, self.timestamps,
                             self.num_edges))


def _ports_numpy(key, other, ts, num_edges) -> np.ndarray:
    out = np.zeros(num_edges, dtype=np.float64)
    t = ts if ts is not None else np.zeros(num_edges, dtype=np.int64)
    order = np.lexsort((t, key))  # group by node, time-sorted within
    rank: dict[int, int] = {}
    prev_key = None
    nxt = 0
    for i in order:
        k = int(key[i])
        if k != prev_key:
            rank = {}
            nxt = 0
            prev_key = k
        u = int(other[i])
        if u not in rank:
            rank[u] = nxt
            nxt += 1
        out[i] = rank[u]
    return out


def add_ego_ids(node_feats: np.ndarray, seed_edge_index: np.ndarray,
                column: Optional[int] = None) -> np.ndarray:
    """Mark nodes incident to the seed edges with 1 (reference
    ``addEgoIDs``, ``src/utils/batch_processing.py:151-157``).

    If ``column`` is None a new column is appended; otherwise that column is
    overwritten (the reference's in-place EgoID column variant,
    ``util/graph.py:127-145``).
    """
    ids = np.zeros((node_feats.shape[0], 1), dtype=node_feats.dtype)
    nodes = np.unique(seed_edge_index.reshape(-1))
    nodes = nodes[(nodes >= 0) & (nodes < node_feats.shape[0])]
    ids[nodes] = 1
    if column is None:
        return np.concatenate([node_feats, ids], axis=1)
    out = node_feats.copy()
    out[:, column] = ids[:, 0]
    return out
