"""Ethereum phishing dataset (``src/datasets/eth_phishing_transactions.py``).

nodes.csv: account labels + first-transaction timestamps → cutoff split
whose day boundaries propagate to the edges table (``:50-54``, the
``use_cutoffs`` path). edges.csv: 4 numerical features (nonce, value, gas,
gas_price) + block_timestamp; all four are maskable for MCM
(``:260-261``). Supports node-seeded classification batches
(``get_graph_inputs:166``) and edge-seeded MCM batches
(``get_mcm_inputs:192``).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..frame.stype import Stype
from .graph_dataset import EdgeTable, NodeTable
from .node_family import NodeClassificationDataset

ETH_EDGE_SCHEMA = {
    "nonce": Stype.numerical,
    "value": Stype.numerical,
    "gas": Stype.numerical,
    "gas_price": Stype.numerical,
    "block_timestamp": Stype.timestamp,
}


class EthereumPhishingNodes(NodeTable):
    def __init__(self, df: pd.DataFrame, splits=(0.65, 0.15, 0.2),
                 ego: bool = False):
        df = df.copy().reset_index(drop=True)
        df["target"] = [[float(l), float(n)]
                        for l, n in zip(df["label"], df["node"])]
        # cutoff timestamps at the split-ratio quantiles of
        # first_transaction (get_split_timestamps, eth:340-356)
        ts = np.sort(df["first_transaction"].to_numpy())
        n = len(ts)
        self.cutoffs = [ts[max(int(n * splits[0]) - 1, 0)],
                        ts[max(int(n * (splits[0] + splits[1])) - 1, 0)]]
        split = np.ones(n, dtype=np.int64)
        ft = df["first_transaction"].to_numpy()
        split[ft < self.cutoffs[0]] = 0
        split[ft > self.cutoffs[1]] = 2
        df["split"] = split

        schema = {"target": Stype.relation}
        if ego:
            df["EgoID"] = 0.0
            schema["EgoID"] = Stype.relation
        else:
            df["node_attr"] = 1.0
            schema["node_attr"] = Stype.relation
        super().__init__(df, schema, target_col="target", split_col="split")


class EthereumPhishing(NodeClassificationDataset):
    def __init__(self, root: str, mask_type: str = "replace",
                 pretrain: Optional[set] = None,
                 split_type: str = "temporal_daily",
                 splits: Sequence[float] = (0.65, 0.15, 0.2),
                 khop_neighbors=(100, 100), ports: bool = False,
                 ego: bool = False, channels: int = 64,
                 use_cutoffs: bool = False,
                 edge_capacity: int = 0, node_capacity: int = 0,
                 use_native_sampler: bool = True):
        nodes_df = pd.read_csv(os.path.join(root, "nodes.csv"), header=0)
        edges_df = pd.read_csv(os.path.join(root, "edges.csv"), header=0)

        nodes = EthereumPhishingNodes(nodes_df, splits=splits, ego=ego)
        edges = EdgeTable(
            edges_df, ETH_EDGE_SCHEMA,
            src_col="from_address", dst_col="to_address",
            timestamp_col="block_timestamp", supervised_col=None,
            masked_numerical_columns=["nonce", "value", "gas", "gas_price"],
            masked_categorical_columns=[],
            pretrain=pretrain,
            split_type="cutoff" if use_cutoffs else split_type,
            splits=(list(nodes.cutoffs) if use_cutoffs else list(splits)),
            khop_neighbors=khop_neighbors, ports=ports,
            cache_root=os.path.join(root, "edges"), mask_type=mask_type,
            use_native_sampler=use_native_sampler)
        super().__init__(edges, nodes, edge_capacity, node_capacity,
                         n_classes=2)
