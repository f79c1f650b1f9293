"""Elliptic Bitcoin dataset (``src/datasets/elliptic_bitcoin.py``).

Feature-rich nodes (all numerical, ``:237-241``), dummy-attribute edges,
class remap {'2'→0 licit, 'unknown'→2}, temporal split on the first
feature column (time step), unknown class masked out of loss/metrics
(``:179``).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from .node_family import (
    FeatureNodeTable,
    NodeClassificationDataset,
    SimpleEdgeTable,
)


class EllipticBitcoin(NodeClassificationDataset):
    def __init__(self, root: str, pretrain: Optional[set] = None,
                 split_type: str = "temporal",
                 splits: Sequence[float] = (0.6, 0.2, 0.2),
                 khop_neighbors=(100, 100), ports: bool = False,
                 ego: bool = False, channels: int = 64,
                 edge_capacity: int = 0, node_capacity: int = 0,
                 use_native_sampler: bool = True):
        nodes_df = pd.read_csv(os.path.join(root, "nodes.csv"), header=0)
        edges_df = pd.read_csv(os.path.join(root, "edges.csv"), header=0)

        cls = nodes_df["class"].astype(str)
        nodes_df["class"] = np.where(
            cls == "2", 0, np.where(cls == "unknown", 2, cls)).astype(int)

        # remap tx ids → contiguous node ids
        ids = nodes_df["txId"].to_numpy()
        remap = {v: i for i, v in enumerate(ids)}
        nodes_df["txId"] = np.arange(len(ids))
        edges_df["txId1"] = edges_df["txId1"].map(remap)
        edges_df["txId2"] = edges_df["txId2"].map(remap)
        edges_df = edges_df.dropna().astype({"txId1": int, "txId2": int})

        # temporal split over the time-step feature (the reference uses the
        # column literally named '1', elliptic_bitcoin.py:228)
        ts_col = ("1" if "1" in nodes_df.columns
                  else (nodes_df.columns[2] if len(nodes_df.columns) > 2
                        else None))
        nodes = FeatureNodeTable(
            nodes_df, label_col="class", id_col="txId",
            exclude=("index",), split_type=split_type, splits=splits,
            timestamp_col=ts_col, pretrain=pretrain, ego=ego,
            cache_root=os.path.join(root, "nodes"))
        edges = SimpleEdgeTable(
            edges_df, "txId1", "txId2", ports=ports,
            khop_neighbors=khop_neighbors, num_nodes=len(ids),
            use_native_sampler=use_native_sampler)
        super().__init__(edges, nodes, edge_capacity, node_capacity,
                         ignore_label=2, n_classes=2)
