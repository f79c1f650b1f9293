"""Static-shape k-hop neighbor sampling (C++ engine + NumPy fallback).

Rebuilds the reference's sampling stack TPU-first: per-split
``NeighborSampler`` objects (``src/datasets/util/graph.py:31-53``) become a
:class:`NeighborSampler` over an immutable CSR; sampling emits PADDED
fixed-capacity subgraphs (:class:`SampledSubgraph`) whose shapes never
change across batches, so the downstream train step compiles exactly once.

Ordering contracts preserved from the reference:
  * edge-seeded: seed edges first, in input order
    (``ibm_transactions_for_aml.py:63-66,102-112``);
  * edge-seeded node ids: sorted-unique (``torch.unique`` relabel at
    ``ibm_transactions_for_aml.py:168-173``);
  * node-seeded: seed nodes first, then sorted rest
    (``src/utils/batch_processing.py:40-47``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .build import load_library


@dataclasses.dataclass
class SampledSubgraph:
    """Padded k-hop subgraph with static shapes.

    edge_ids:   [E_cap] global edge-table row ids (−1 pad)
    edge_index: [2, E_cap] local (relabeled) src/dst node ids (0 pad, masked)
    edge_mask:  [E_cap] bool
    node_ids:   [N_cap] global node ids (−1 pad)
    node_mask:  [N_cap] bool
    num_seeds:  number of seed edges (edge-seeded) or seed nodes
    num_edges / num_nodes: valid counts; num_dropped: capacity overflow count
    """

    edge_ids: np.ndarray
    edge_index: np.ndarray
    edge_mask: np.ndarray
    node_ids: np.ndarray
    node_mask: np.ndarray
    num_seeds: int
    num_edges: int
    num_nodes: int
    num_dropped: int


class NeighborSampler:
    """Uniform k-hop neighbor sampler over a static graph.

    Samples incoming edges per hop (message-flow direction, the pyg
    ``NeighborSampler`` behavior the reference relies on); ``undirected=True``
    additionally expands over outgoing edges.
    """

    def __init__(
        self,
        edge_index: np.ndarray,          # [2, E] global node ids
        edge_ids: Optional[np.ndarray],  # [E] global edge-table row ids
        num_nodes: int,
        fanouts: Sequence[int] = (100, 100),
        undirected: bool = False,
        seed: int = 0,
        use_native: bool = True,
    ):
        edge_index = np.ascontiguousarray(edge_index, dtype=np.int64)
        self.src = edge_index[0].copy()
        self.dst = edge_index[1].copy()
        self.edge_ids = (
            np.arange(edge_index.shape[1], dtype=np.int64)
            if edge_ids is None else np.ascontiguousarray(edge_ids, np.int64))
        self.num_nodes = int(num_nodes)
        self.fanouts = np.asarray(list(fanouts), dtype=np.int64)
        self.undirected = undirected
        self._seed = seed
        self._counter = 0

        self._lib = load_library() if use_native else None
        self._handle = None
        if self._lib is not None:
            import ctypes
            self._handle = self._lib.rmm_graph_create(
                self.src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self.dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self.edge_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(self.src), self.num_nodes)
        else:
            self._build_numpy_csr()

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            try:
                self._lib.rmm_graph_destroy(self._handle)
            except Exception:
                pass

    # -- NumPy fallback CSR -------------------------------------------------
    def _build_numpy_csr(self):
        def csr(key, other):
            order = np.argsort(key, kind="stable")
            sorted_key = key[order]
            offsets = np.zeros(self.num_nodes + 1, dtype=np.int64)
            np.add.at(offsets, sorted_key + 1, 1)
            np.cumsum(offsets, out=offsets)
            return offsets, other[order], self.edge_ids[order]

        self._in_csr = csr(self.dst, self.src)
        self._out_csr = csr(self.src, self.dst)

    def in_degrees(self) -> np.ndarray:
        if self._handle is not None:
            import ctypes
            out = np.zeros(self.num_nodes, dtype=np.int64)
            self._lib.rmm_in_degrees(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return out
        offsets = self._in_csr[0]
        return offsets[1:] - offsets[:-1]

    def in_degree_histogram(self) -> np.ndarray:
        """Histogram for PNA degree scalers (reference ``utils.py:179-182``)."""
        deg = self.in_degrees()
        return np.bincount(deg, minlength=int(deg.max(initial=0)) + 1)

    # -- sampling -----------------------------------------------------------
    def _next_seed(self, rng_seed) -> int:
        if rng_seed is not None:
            return int(rng_seed)
        self._counter += 1
        return (self._seed * 1_000_003 + self._counter) & 0x7FFFFFFFFFFFFFFF

    def sample_edges(self, seed_src, seed_dst, seed_ids, max_edges: int,
                     max_nodes: int, rng_seed: Optional[int] = None
                     ) -> SampledSubgraph:
        seed_src = np.ascontiguousarray(seed_src, np.int64)
        seed_dst = np.ascontiguousarray(seed_dst, np.int64)
        seed_ids = np.ascontiguousarray(seed_ids, np.int64)
        n_seeds = len(seed_ids)
        s = self._next_seed(rng_seed)
        if self._handle is not None:
            return self._native_sample("rmm_sample_from_edges",
                                       (seed_src, seed_dst, seed_ids), n_seeds,
                                       s, max_edges, max_nodes)
        return self._numpy_sample_edges(seed_src, seed_dst, seed_ids, s,
                                        max_edges, max_nodes)

    def sample_nodes(self, seed_nodes, max_edges: int, max_nodes: int,
                     rng_seed: Optional[int] = None) -> SampledSubgraph:
        seed_nodes = np.ascontiguousarray(seed_nodes, np.int64)
        s = self._next_seed(rng_seed)
        if self._handle is not None:
            return self._native_sample("rmm_sample_from_nodes",
                                       (seed_nodes,), len(seed_nodes), s,
                                       max_edges, max_nodes)
        return self._numpy_sample_nodes(seed_nodes, s, max_edges, max_nodes)

    def _native_sample(self, fn_name, seeds, n_seeds, rng_seed, max_edges,
                       max_nodes) -> SampledSubgraph:
        import ctypes

        def p(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

        edge_ids = np.empty(max_edges, dtype=np.int64)
        src_l = np.empty(max_edges, dtype=np.int64)
        dst_l = np.empty(max_edges, dtype=np.int64)
        node_ids = np.empty(max_nodes, dtype=np.int64)
        counts = np.zeros(3, dtype=np.int64)
        fn = getattr(self._lib, fn_name)
        args = [self._handle] + [p(a) for a in seeds] + [
            n_seeds, p(self.fanouts), len(self.fanouts),
            ctypes.c_uint64(rng_seed), 1 if self.undirected else 0,
            max_edges, max_nodes, p(edge_ids), p(src_l), p(dst_l),
            p(node_ids), p(counts),
        ]
        rc = fn(*args)
        if rc != 0:
            raise RuntimeError(
                f"sampler node capacity exceeded (max_nodes={max_nodes}); "
                "raise max_nodes or lower fanouts")
        return SampledSubgraph(
            edge_ids=edge_ids,
            edge_index=np.stack([src_l, dst_l]),
            edge_mask=edge_ids >= 0,
            node_ids=node_ids,
            node_mask=node_ids >= 0,
            num_seeds=n_seeds,
            num_edges=int(counts[0]),
            num_nodes=int(counts[1]),
            num_dropped=int(counts[2]),
        )

    # -- NumPy reference implementation (same contract) ---------------------
    def _expand(self, frontier, seen_edges, rng):
        """Return (edge_ids, esrc, edst) lists added by k-hop expansion."""
        out_e, out_s, out_d = [], [], []
        fseen = set(frontier)
        for fanout in self.fanouts:
            nxt = []
            for v in frontier:
                views = [(self._in_csr, True)]
                if self.undirected:
                    views.append((self._out_csr, False))
                for (offsets, nbrs, eids), incoming in views:
                    beg, end = offsets[v], offsets[v + 1]
                    deg = end - beg
                    if deg <= 0:
                        continue
                    if fanout < 0 or deg <= fanout:
                        sel = np.arange(beg, end)
                    else:
                        sel = beg + rng.choice(deg, size=int(fanout),
                                               replace=False)
                    for pidx in sel:
                        e = int(eids[pidx])
                        u = int(nbrs[pidx])
                        if e not in seen_edges:
                            seen_edges.add(e)
                            out_e.append(e)
                            if incoming:
                                out_s.append(u)
                                out_d.append(v)
                            else:
                                out_s.append(v)
                                out_d.append(u)
                        if u not in fseen:
                            fseen.add(u)
                            nxt.append(u)
            frontier = nxt
        return out_e, out_s, out_d

    def _pack(self, edge_ids, esrc, edst, node_order, n_seeds, max_edges,
              max_nodes) -> SampledSubgraph:
        total = len(edge_ids)
        kept = min(total, max_edges)
        local = {v: i for i, v in enumerate(node_order)}
        if len(node_order) > max_nodes:
            raise RuntimeError(
                f"sampler node capacity exceeded (max_nodes={max_nodes})")
        out_eid = np.full(max_edges, -1, dtype=np.int64)
        out_src = np.zeros(max_edges, dtype=np.int64)
        out_dst = np.zeros(max_edges, dtype=np.int64)
        out_eid[:kept] = edge_ids[:kept]
        out_src[:kept] = [local[v] for v in esrc[:kept]]
        out_dst[:kept] = [local[v] for v in edst[:kept]]
        out_nodes = np.full(max_nodes, -1, dtype=np.int64)
        out_nodes[: len(node_order)] = node_order
        return SampledSubgraph(
            edge_ids=out_eid,
            edge_index=np.stack([out_src, out_dst]),
            edge_mask=out_eid >= 0,
            node_ids=out_nodes,
            node_mask=out_nodes >= 0,
            num_seeds=n_seeds,
            num_edges=kept,
            num_nodes=len(node_order),
            num_dropped=total - kept,
        )

    def _numpy_sample_edges(self, seed_src, seed_dst, seed_ids, rng_seed,
                            max_edges, max_nodes) -> SampledSubgraph:
        rng = np.random.RandomState(rng_seed % (2**32))
        seen = set(int(e) for e in seed_ids)
        frontier = list(dict.fromkeys(
            list(map(int, seed_src)) + list(map(int, seed_dst))))
        e2, s2, d2 = self._expand(frontier, seen, rng)
        edge_ids = list(map(int, seed_ids)) + e2
        esrc = list(map(int, seed_src)) + s2
        edst = list(map(int, seed_dst)) + d2
        kept = min(len(edge_ids), max_edges)
        node_order = sorted(set(esrc[:kept]) | set(edst[:kept]))
        return self._pack(edge_ids, esrc, edst, node_order, len(seed_ids),
                          max_edges, max_nodes)

    def _numpy_sample_nodes(self, seed_nodes, rng_seed, max_edges,
                            max_nodes) -> SampledSubgraph:
        rng = np.random.RandomState(rng_seed % (2**32))
        seen: set[int] = set()
        e2, s2, d2 = self._expand(list(map(int, seed_nodes)), seen, rng)
        kept = min(len(e2), max_edges)
        node_order = list(dict.fromkeys(map(int, seed_nodes)))
        in_seed = set(node_order)
        rest = sorted((set(s2[:kept]) | set(d2[:kept])) - in_seed)
        node_order.extend(rest)
        return self._pack(e2, s2, d2, node_order, len(seed_nodes), max_edges,
                          max_nodes)
