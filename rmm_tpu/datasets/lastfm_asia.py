"""LastFM Asia dataset (``src/datasets/lastfm_asia.py``): user features +
18-class country label, friendship edges."""
from __future__ import annotations

import os
from typing import Optional, Sequence

import pandas as pd

from .node_family import (
    FeatureNodeTable,
    NodeClassificationDataset,
    SimpleEdgeTable,
)


class LastFMAsia(NodeClassificationDataset):
    def __init__(self, root: str, pretrain: Optional[set] = None,
                 split_type: str = "random",
                 splits: Sequence[float] = (0.6, 0.2, 0.2),
                 khop_neighbors=(100, 100), ports: bool = False,
                 ego: bool = False, channels: int = 64,
                 edge_capacity: int = 0, node_capacity: int = 0,
                 n_classes: int = 18,
                 use_native_sampler: bool = True):
        nodes_df = pd.read_csv(os.path.join(root, "nodes.csv"), header=0)
        edges_df = pd.read_csv(os.path.join(root, "edges.csv"), header=0)
        nodes = FeatureNodeTable(
            nodes_df, label_col="target", id_col="id", exclude=("index",),
            split_type=split_type, splits=splits, timestamp_col=None,
            pretrain=pretrain, ego=ego,
            cache_root=os.path.join(root, "nodes"))
        edges = SimpleEdgeTable(
            edges_df, "node_1", "node_2", ports=ports,
            khop_neighbors=khop_neighbors, num_nodes=len(nodes_df),
            use_native_sampler=use_native_sampler)
        super().__init__(edges, nodes, edge_capacity, node_capacity,
                         n_classes=n_classes)
