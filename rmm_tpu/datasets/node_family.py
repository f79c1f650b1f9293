"""Shared template for node-classification dataset families.

The reference repeats one pattern across five files (SURVEY §2 items
28-30): a feature-rich ``nodes.csv`` (all-numerical features + a packed
``relation`` target ``[label, node_id]``) and an ``edges.csv`` with dummy or
port attributes; classification batches are node-seeded k-hop samples.
This template implements that pattern once.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..frame.stype import Stype
from .base import (
    PretrainType,
    apply_split,
    blank_masked_cells,
    build_mask_target,
    create_mask,
    pack_target,
)
from .graph_dataset import EdgeTable, GraphTableDataset, NodeTable


class FeatureNodeTable(NodeTable):
    """nodes.csv → all-numerical features + relation target [label, id]
    (the ``OgbnArxivNodes`` template, ``ogbn_arxiv.py:217-263``)."""

    def __init__(self, df: pd.DataFrame, label_col: str, id_col: str,
                 exclude: Sequence[str] = (), split_type: str = "temporal",
                 splits=(0.6, 0.2, 0.2), timestamp_col: Optional[str] = None,
                 pretrain: Optional[set] = None, ego: bool = False,
                 cache_root: Optional[str] = None, seed: int = 0):
        pretrain = set(pretrain or ())
        df = df.copy().reset_index(drop=True)
        feat_cols = [c for c in df.columns
                     if c not in set(exclude) | {label_col, id_col}]
        col_to_stype = {c: Stype.numerical for c in feat_cols}
        self.num_columns = list(feat_cols)
        self.cat_columns: list[str] = []
        self.masked_numerical_columns = list(feat_cols)
        self.masked_categorical_columns = []

        if timestamp_col is not None and split_type != "none":
            df = apply_split(df, split_type, list(splits), timestamp_col)
        elif "split" not in df.columns:
            df = apply_split(df, "random", list(splits), timestamp_col)

        mask_target = None
        maskable = None
        if PretrainType.MASK in pretrain:
            maskable = self.num_columns
            mask_col = create_mask(cache_root, df, maskable, seed)
            mask_target = build_mask_target(df, mask_col, self.num_columns,
                                            [], {})
            blank_masked_cells(df, mask_col)

        if pretrain:
            y = pack_target(pretrain, None, mask_target, None)
            df["target"] = list(y)
        else:
            df["target"] = [
                [float(l), float(i)]
                for l, i in zip(df[label_col], df[id_col])]
        col_to_stype["target"] = Stype.relation
        if ego:
            df["EgoID"] = 0.0
            col_to_stype["EgoID"] = Stype.relation
        super(NodeTable, self).__init__(
            df, col_to_stype, split_col="split", target_col="target",
            maskable_columns=maskable)


class SimpleEdgeTable(EdgeTable):
    """edges.csv with a dummy attribute or port features
    (``EllipticBitcoinTransactions`` / ``OgbnArxivEdges`` pattern)."""

    def __init__(self, df: pd.DataFrame, src_col: str, dst_col: str,
                 attr_stype: Stype = Stype.numerical, ports: bool = False,
                 khop_neighbors=(100, 100), num_nodes: Optional[int] = None,
                 use_native_sampler: bool = True, seed: int = 0):
        df = df.copy().reset_index(drop=True)
        # node-classification graphs have no split: all samplers share the
        # full graph (util/graph.py:55-61)
        self.src_col, self.dst_col = src_col, dst_col
        self.timestamp_col = None
        self.khop_neighbors = tuple(khop_neighbors)
        self.pretrain = set()
        self.masked_numerical_columns = []
        self.masked_categorical_columns = []
        self.maskable_columns = None

        from ..graph.store import GraphStore

        src = df[src_col].to_numpy(dtype=np.int64)
        dst = df[dst_col].to_numpy(dtype=np.int64)
        self.graph = GraphStore(src, dst, split=None, fanouts=khop_neighbors,
                                num_nodes=num_nodes, seed=seed,
                                use_native=use_native_sampler)
        col_to_stype = {}
        if ports:
            in_p, out_p = self.graph.ports()
            df["in_port"] = in_p
            df["out_port"] = out_p
            col_to_stype["in_port"] = attr_stype
            col_to_stype["out_port"] = attr_stype
        else:
            df["edge_attr"] = 1.0
            col_to_stype["edge_attr"] = attr_stype

        # skip EdgeTable.__init__ graph/target plumbing: call Dataset's
        from ..frame.dataset import Dataset

        Dataset.__init__(self, df, col_to_stype, split_col=None,
                         target_col=None)

    def masked_categorical_cardinalities(self):
        return []


class NodeClassificationDataset(GraphTableDataset):
    """Top-level family object; ``ignore_label`` marks an "unknown" class
    excluded from loss/metrics (Elliptic's ``y != 2`` mask,
    ``elliptic_bitcoin.py:179``)."""

    ignore_label: Optional[int] = None

    def __init__(self, edges, nodes, edge_capacity=0, node_capacity=0,
                 ignore_label: Optional[int] = None, n_classes: int = 2):
        super().__init__(edges, nodes, edge_capacity, node_capacity)
        self.ignore_label = ignore_label
        self.n_classes = n_classes
