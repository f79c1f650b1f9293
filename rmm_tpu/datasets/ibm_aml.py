"""IBM Transactions for AML dataset.

Rebuilds ``src/datasets/ibm_transactions_for_aml.py``: the transaction CSV
(schema at ``:212-252``) becomes the edges table — 3 categorical columns
(Receiving/Payment Currency, Payment Format), 1 numerical (Amount Paid) and
the Timestamp — with a synthetic id-only nodes table
(``IBMTransactionsAMLNodes:296``). Maskable columns: Amount Paid +
the three categoricals (``:251-252``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd

from ..frame.stype import Stype
from .graph_dataset import EdgeTable, GraphTableDataset, NodeTable

AML_COLUMNS = [
    "Timestamp", "From Bank", "From ID", "To Bank", "To ID",
    "Amount Received", "Receiving Currency", "Amount Paid",
    "Payment Currency", "Payment Format", "Is Laundering",
]

AML_SCHEMA = {
    "Payment Currency": Stype.categorical,
    "Receiving Currency": Stype.categorical,
    "Payment Format": Stype.categorical,
    "Timestamp": Stype.timestamp,
    "Amount Paid": Stype.numerical,
}


class IBMTransactionsAML(GraphTableDataset):
    def __init__(
        self,
        root: str,
        mask_type: str = "replace",
        pretrain: Optional[set] = None,
        split_type: str = "temporal_daily",
        splits: Sequence[float] = (0.6, 0.2, 0.2),
        khop_neighbors: Sequence[int] = (100, 100),
        ports: bool = False,
        ego: bool = False,
        channels: int = 64,
        edge_capacity: int = 0,
        node_capacity: int = 0,
        use_native_sampler: bool = True,
    ):
        self.root = root
        self.channels = channels
        df = pd.read_csv(root, header=0)
        if list(df.columns)[:3] != AML_COLUMNS[:3]:
            df.columns = AML_COLUMNS[: len(df.columns)]
        edges = EdgeTable(
            df,
            AML_SCHEMA,
            src_col="From ID",
            dst_col="To ID",
            timestamp_col="Timestamp",
            supervised_col="Is Laundering" if not pretrain else None,
            masked_numerical_columns=["Amount Paid"],
            masked_categorical_columns=[
                "Receiving Currency", "Payment Currency", "Payment Format"],
            pretrain=pretrain,
            split_type=split_type,
            splits=splits,
            khop_neighbors=khop_neighbors,
            ports=ports,
            cache_root=root,
            mask_type=mask_type,
            use_native_sampler=use_native_sampler,
        )
        num_nodes = edges.graph.num_nodes
        nodes = NodeTable.synthetic(num_nodes - 1, ego=ego)
        super().__init__(edges, nodes, edge_capacity, node_capacity)
