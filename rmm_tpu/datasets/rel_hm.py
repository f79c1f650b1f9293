"""Rel-H&M dataset (``src/datasets/rel_hm.py``): H&M transactions joined
with article metadata (schema ``:95-114`` — 12 categorical columns + price
+ t_dat timestamp), customer→article bipartite graph (``:123-124``).
Maskable columns: price + {product_type_name, department_name,
perceived_colour_value_name} (``:115-116``).

The reference passes a nonexistent supervised column to ``set_target_col``
(``rel_hm.py:144`` — a copy-paste from AML); this rebuild supports the
dataset's actual use: self-supervised pretraining targets.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..frame.stype import Stype
from .graph_dataset import EdgeTable, GraphTableDataset, NodeTable

HM_SCHEMA = {
    "t_dat": Stype.timestamp,
    "price": Stype.numerical,
    "postal_code": Stype.categorical,
    "product_type_name": Stype.categorical,
    "product_group_name": Stype.categorical,
    "graphical_appearance_name": Stype.categorical,
    "colour_group_name": Stype.categorical,
    "perceived_colour_value_name": Stype.categorical,
    "perceived_colour_master_name": Stype.categorical,
    "department_name": Stype.categorical,
    "index_name": Stype.categorical,
    "index_group_name": Stype.categorical,
    "section_name": Stype.categorical,
    "garment_group_name": Stype.categorical,
}


class RelHM(GraphTableDataset):
    def __init__(self, root: str, mask_type: str = "replace",
                 pretrain: Optional[set] = None,
                 split_type: str = "temporal_daily",
                 splits: Sequence[float] = (0.6, 0.2, 0.2),
                 khop_neighbors=(100, 100), ports: bool = False,
                 ego: bool = False, channels: int = 64,
                 edge_capacity: int = 0, node_capacity: int = 0,
                 use_native_sampler: bool = True):
        df = pd.read_csv(root, header=0)
        # customers and articles share one global id space (bipartite graph
        # over a single node table, rel_hm.py:123-124)
        if not np.issubdtype(df["customer_id"].dtype, np.number):
            cust = df["customer_id"].astype(str)
            art = "a_" + df["article_id"].astype(str)
            codes = pd.concat([cust, art]).astype("category").cat.codes
            n = len(df)
            df["customer_id"] = codes[:n].to_numpy().astype(np.int64)
            df["article_id"] = codes[n:].to_numpy().astype(np.int64)
        schema = {c: st for c, st in HM_SCHEMA.items() if c in df.columns}
        edges = EdgeTable(
            df, schema, src_col="customer_id", dst_col="article_id",
            timestamp_col="t_dat", supervised_col=None,
            masked_numerical_columns=["price"],
            masked_categorical_columns=[
                "product_type_name", "department_name",
                "perceived_colour_value_name"],
            pretrain=pretrain, split_type=split_type, splits=splits,
            khop_neighbors=khop_neighbors, ports=ports, cache_root=root,
            mask_type=mask_type, use_native_sampler=use_native_sampler)
        nodes = NodeTable.synthetic(edges.graph.num_nodes - 1, ego=ego)
        super().__init__(edges, nodes, edge_capacity, node_capacity)
