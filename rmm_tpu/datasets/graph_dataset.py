"""GraphTableDataset: the shared edges-table + nodes-table + sampler wiring
every dataset family builds on.

Mirrors the reference's per-dataset pattern (pandas CSV → stype schema →
split → graph + per-split samplers → optional ports/ego → optional
mask/link targets → materialized Dataset + encoder; e.g.
``src/datasets/ibm_transactions_for_aml.py:203-294``) once, so each dataset
is just a schema + column declaration.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..frame.dataset import Dataset
from ..frame.stats import StatType
from ..frame.stype import Stype
from ..graph.store import GraphStore
from ..utils.batch import GraphBatch, graph_inputs, lp_inputs, mcm_inputs, \
    node_inputs
from .base import (
    PretrainType,
    apply_split,
    blank_masked_cells,
    build_mask_target,
    create_mask,
    pack_link_column,
    pack_target,
)


class EdgeTable(Dataset):
    """Edges table with graph + packed targets.

    Parameters mirror the reference dataset ctors
    (``ibm_transactions_for_aml.py:203``): ``pretrain`` ⊆ {MASK, MASK_VECTOR,
    LINK_PRED}; empty set = supervised.
    """

    def __init__(
        self,
        df: pd.DataFrame,
        col_to_stype: dict,
        src_col: str,
        dst_col: str,
        timestamp_col: Optional[str],
        supervised_col: Optional[str],
        masked_numerical_columns: Sequence[str] = (),
        masked_categorical_columns: Sequence[str] = (),
        pretrain: Optional[set] = None,
        split_type: str = "temporal_daily",
        splits: Sequence[float] = (0.6, 0.2, 0.2),
        khop_neighbors: Sequence[int] = (100, 100),
        ports: bool = False,
        cache_root: Optional[str] = None,
        mask_type: str = "replace",
        seed: int = 0,
        use_native_sampler: bool = True,
    ):
        self.src_col, self.dst_col = src_col, dst_col
        self.timestamp_col = timestamp_col
        self.khop_neighbors = tuple(khop_neighbors)
        self.pretrain = set(pretrain or ())
        self.mask_type = mask_type
        self.masked_numerical_columns = list(masked_numerical_columns)
        self.masked_categorical_columns = list(masked_categorical_columns)
        col_to_stype = dict(col_to_stype)

        df = apply_split(df, split_type, list(splits), timestamp_col)

        src = df[src_col].to_numpy(dtype=np.int64)
        dst = df[dst_col].to_numpy(dtype=np.int64)
        ts = (df[timestamp_col].to_numpy(dtype=np.int64)
              if timestamp_col else None)
        self.graph = GraphStore(src, dst, split=df["split"].to_numpy(),
                                timestamps=ts, fanouts=khop_neighbors,
                                seed=seed, use_native=use_native_sampler)
        link = pack_link_column(src, dst)

        if ports:
            in_p, out_p = self.graph.ports()
            df["in_port"] = in_p
            df["out_port"] = out_p
            col_to_stype["in_port"] = Stype.numerical
            col_to_stype["out_port"] = Stype.numerical

        mask_target = None
        self.maskable_columns = None
        if PretrainType.MASK in self.pretrain:
            self.maskable_columns = (self.masked_numerical_columns
                                     + self.masked_categorical_columns)
            mask_col = create_mask(cache_root, df, self.maskable_columns,
                                   seed)
            cat_codes = {}
            for c in self.masked_categorical_columns:
                counts = df[c].dropna().value_counts()
                cat_codes[c] = {v: i for i, v in enumerate(counts.index)}
            mask_target = build_mask_target(
                df, mask_col, self.masked_numerical_columns,
                self.masked_categorical_columns, cat_codes)
            if mask_type == "replace":
                blank_masked_cells(df, mask_col)

        supervised = (df[supervised_col].astype(float).to_numpy()
                      if supervised_col else None)
        y = pack_target(self.pretrain, link, mask_target, supervised)
        target_col = None
        if y is not None:
            df = df.copy()
            df["target"] = list(y)
            target_col = "target"
            col_to_stype["target"] = Stype.relation

        super().__init__(df, col_to_stype, split_col="split",
                         target_col=target_col,
                         maskable_columns=self.maskable_columns)

    def masked_categorical_cardinalities(self) -> list[int]:
        """Head sizes for MCM (reference ``main.py:303`` computes them from
        StatType.COUNT over maskable categorical columns). Cardinalities are
        recomputed from the raw values because masking blanks some cells."""
        out = []
        for c in self.masked_categorical_columns:
            if c in self.col_stats and StatType.COUNT in self.col_stats[c]:
                out.append(len(self.col_stats[c][StatType.COUNT][0]))
            else:
                out.append(0)
        return out


class NodeTable(Dataset):
    """Synthetic or feature-rich nodes table
    (``IBMTransactionsAMLNodes``, ``ibm_transactions_for_aml.py:296-318``)."""

    def __init__(self, df: pd.DataFrame, col_to_stype: dict,
                 target_col: Optional[str] = None,
                 split_col: Optional[str] = None):
        self.masked_numerical_columns = []
        self.masked_categorical_columns = []
        super().__init__(df, col_to_stype, split_col=split_col,
                         target_col=target_col)

    @staticmethod
    def synthetic(num_nodes: int, ego: bool = False) -> "NodeTable":
        df = pd.DataFrame({"node_id": np.arange(num_nodes + 1)})
        df["node_attr"] = 1.0
        schema = {"node_attr": Stype.relation}
        if ego:
            df["ego"] = 1.0
            schema["ego"] = Stype.relation
        return NodeTable(df, schema)


class GraphTableDataset:
    """Top-level dataset object: ``.edges`` + ``.nodes`` + batch builders.

    Public surface mirrors the reference
    (``dataset.edges/.nodes/.split()/sample_neighbors/get_graph_inputs``,
    SURVEY §1 L2)."""

    def __init__(self, edges: EdgeTable, nodes: NodeTable,
                 edge_capacity: int = 0, node_capacity: int = 0,
                 frontier_capacity: int = 0):
        """``edge_capacity``/``node_capacity`` <= 0 means auto-calibrate on
        first use (:meth:`calibrate_capacities`) — the reference keeps every
        sampled edge (``ibm_transactions_for_aml.py:102-112``), so parity
        requires caps sized to the actual neighborhood, not a fixed guess."""
        self.edges = edges
        self.nodes = nodes
        self.edge_capacity = edge_capacity
        self.node_capacity = node_capacity
        self.frontier_capacity = frontier_capacity
        edges.materialize()
        nodes.materialize()

    def calibrate_capacities(self, batch_size: int, n_probe: int = 4,
                             safety: float = 1.5) -> tuple[int, int]:
        """Size the static subgraph buffers from probe samples.

        Draws ``n_probe`` random seed batches per split, measures the TRUE
        sampled subgraph size (kept + dropped edges), and sets capacities to
        ``safety`` × the observed max, rounded up to a multiple of 256 (XLA
        retiles anyway; round shapes keep the compile cache small). Drops
        observed during training are still counted and surfaced per epoch
        (``drop_rate``)."""
        g = self.graph
        rng = np.random.RandomState(0)
        B = max(int(batch_size), 1)
        cap_e = cap_n = 1 << 16
        need_e = need_n = need_f = 1
        for mode in ("train", "test"):
            for p in range(n_probe):
                take = min(B, g.num_edges)
                if take == 0:
                    continue
                idx = rng.choice(g.num_edges, size=take, replace=False)
                seeds = np.stack([g.src[idx], g.dst[idx], idx], axis=1)
                while True:
                    try:
                        sub = g.sample_edges(seeds, mode, cap_e, cap_n,
                                             rng_seed=p + 1)
                    except RuntimeError:   # node capacity exceeded
                        cap_n *= 2
                        continue
                    if sub.num_dropped > 0:
                        cap_e = 2 * (sub.num_edges + sub.num_dropped)
                        continue
                    break
                need_e = max(need_e, sub.num_edges)
                need_n = max(need_n, sub.num_nodes)
                need_f = max(need_f, self._frontier_need(
                    mode, np.unique(seeds[:, :2])))

        def rnd(x):
            # power-of-two above 1k: distinct datasets land on the SAME
            # buffer shapes, so XLA/Mosaic compile caches transfer across
            # runs (cold compiles cost minutes through the TPU relay)
            need = max(int(x * safety), 256)
            if need <= 1024:
                return -(-need // 256) * 256
            return 1 << (need - 1).bit_length()

        self.edge_capacity = max(rnd(need_e), B)
        self.node_capacity = max(rnd(need_n), B)
        # the frontier buffer never needs to exceed the node buffer
        self.frontier_capacity = min(max(rnd(need_f), 256),
                                     self.node_capacity)
        return self.edge_capacity, self.node_capacity

    def _frontier_need(self, mode: str, seed_nodes: np.ndarray) -> int:
        """Upper bound on the device sampler's DISTINCT inter-hop frontier
        for one probe batch: per hop, the union of (up to fanout)
        neighbors of the current frontier, minus already-seen nodes —
        exactly `_expand_all`'s dedup semantics. Uses a host CSR over the
        split's edges (built once per mode and cached)."""
        s = self.graph.sampler(mode)
        key = ("_fr_csr", mode)
        cache = self.__dict__.setdefault("_frontier_csr", {})
        if key not in cache:
            def csr(k, o):
                order = np.argsort(k, kind="stable")
                indptr = np.zeros(self.graph.num_nodes + 1, np.int64)
                np.add.at(indptr, np.asarray(k, np.int64) + 1, 1)
                np.cumsum(indptr, out=indptr)
                return indptr, np.asarray(o)[order]
            views = [csr(s.dst, s.src)]
            if s.undirected:
                views.append(csr(s.src, s.dst))
            cache[key] = views
        views = cache[key]
        fanouts = [int(f) for f in s.fanouts]
        seen = np.unique(seed_nodes)
        frontier = seen
        need = 1
        for fanout in fanouts[:-1]:
            parts = []
            draw_bound = 0
            for indptr, nbr in views:
                p0 = indptr[frontier]
                deg = indptr[frontier + 1] - p0
                draw_bound += int(np.minimum(deg, fanout).sum())
                # random draws are a SUBSET of the full neighbor list, so
                # the union of full lists bounds the distinct draw count;
                # so does the total number of draws (sum of min(deg, f))
                for start, d in zip(p0, deg):
                    if d > 0:
                        parts.append(nbr[start:start + d])
            nxt = (np.unique(np.concatenate(parts))
                   if parts else np.empty(0, np.int64))
            nxt = np.setdiff1d(nxt, seen, assume_unique=True)
            need = max(need, min(len(nxt), draw_bound))
            seen = np.union1d(seen, nxt)
            frontier = nxt
        return need

    def _ensure_caps(self, batch_size: int):
        if self.edge_capacity <= 0 or self.node_capacity <= 0:
            self.calibrate_capacities(batch_size)

    @property
    def graph(self) -> GraphStore:
        return self.edges.graph

    def sample_neighbors(self, seed_edges, mode="train"):
        self._ensure_caps(len(seed_edges))
        return self.graph.sample_edges(seed_edges, mode, self.edge_capacity,
                                       self.node_capacity)

    def get_graph_inputs(self, batch_y, valid, mode="train",
                         rng_seed=None) -> GraphBatch:
        self._ensure_caps(len(batch_y))
        return graph_inputs(batch_y, valid, self.graph, mode,
                            self.edge_capacity, self.node_capacity, rng_seed)

    def get_node_inputs(self, node_ids, y, valid, mode="train",
                        rng_seed=None) -> GraphBatch:
        self._ensure_caps(len(node_ids))
        return node_inputs(node_ids, y, valid, self.graph, mode,
                           self.edge_capacity, self.node_capacity, rng_seed)

    def get_mcm_inputs(self, batch_y, valid, mode="train",
                       rng_seed=None) -> GraphBatch:
        self._ensure_caps(len(batch_y))
        return mcm_inputs(batch_y, valid, self.graph, mode,
                          self.edge_capacity, self.node_capacity, rng_seed)

    def get_lp_inputs(self, batch_y, valid, mode="train", num_neg_samples=64,
                      rng_seed=None, neg_seed=0) -> GraphBatch:
        self._ensure_caps(len(batch_y))
        return lp_inputs(batch_y, valid, self.graph, mode,
                         self.edge_capacity, self.node_capacity,
                         num_neg_samples, rng_seed, neg_seed)

    def in_degree_histogram(self) -> np.ndarray:
        return self.graph.in_degree_histogram()
