"""Scriptable dataset EDA — the reference's data notebooks
(``data/*.ipynb``, SURVEY §2 item 38) as one reproducible CLI.

Prints, per dataset family: row/node/edge counts, split sizes, per-column
stype + stats summary, degree distribution, label balance.

Usage: python tools/eda.py --data <csv-or-dir> [--family aml|eth|...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize(dataset) -> dict:
    from rmm_tpu.frame.stats import StatType

    edges = dataset.edges
    nodes = dataset.nodes
    out = {
        "edges": edges.tensor_frame.num_rows,
        "nodes": nodes.tensor_frame.num_rows,
        "graph_nodes": dataset.graph.num_nodes,
        "graph_edges": dataset.graph.num_edges,
    }
    if edges.split_col and "split" in edges.df.columns:
        split = edges.df["split"].to_numpy()
        out["splits"] = {f"split_{i}": int((split == i).sum())
                         for i in range(3)}
    cols = {}
    for col, stats in edges.col_stats.items():
        entry = {"stype": str(edges.col_to_stype[col])}
        if StatType.MEAN in stats:
            entry["mean"] = round(stats[StatType.MEAN], 4)
            entry["std"] = round(stats[StatType.STD], 4)
        if StatType.COUNT in stats:
            entry["cardinality"] = len(stats[StatType.COUNT][0])
            entry["top"] = stats[StatType.COUNT][0][:3]
        cols[col] = entry
    out["edge_columns"] = cols
    deg = dataset.graph.train_sampler.in_degrees()
    out["in_degree"] = {
        "mean": float(deg.mean()), "max": int(deg.max(initial=0)),
        "p50": float(np.median(deg)),
        "isolated": int((deg == 0).sum()),
    }
    if edges.tensor_frame.y is not None:
        y = np.asarray(edges.tensor_frame.y)
        if y.shape[1] >= 1:
            labels, counts = np.unique(y[:, 0].astype(int),
                                       return_counts=True)
            if len(labels) <= 50:
                out["label_balance"] = {int(l): int(c)
                                        for l, c in zip(labels, counts)}
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--num_neighs", nargs="+", type=int, default=[10, 10])
    args = p.parse_args(argv)

    from rmm_tpu.datasets import build_dataset
    from rmm_tpu.utils.config import Config

    cfg = Config(data=args.data, num_neighs=tuple(args.num_neighs),
                 edge_capacity=1024, node_capacity=1024)
    dataset = build_dataset(cfg)
    print(json.dumps(summarize(dataset), indent=2, default=str))


if __name__ == "__main__":
    main()
