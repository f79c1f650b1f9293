"""Ethereum graph exporter (``data/download_eth_transactions.py``): walk a
networkx MultiDiGraph pickle of the ethereum phishing dataset and emit the
``nodes.csv`` / ``edges.csv`` pair :class:`EthereumPhishing` consumes.

Usage: python -m rmm_tpu.datasets.export_eth <graph.pkl> <out_dir>
"""
from __future__ import annotations

import os
import pickle
import sys

import pandas as pd


def export_eth_graph(graph, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    node_ids = {addr: i for i, addr in enumerate(graph.nodes())}

    first_tx: dict[int, float] = {}
    rows = []
    for u, v, data in graph.edges(data=True):
        ui, vi = node_ids[u], node_ids[v]
        ts = float(data.get("timestamp", data.get("block_timestamp", 0)))
        rows.append({
            "from_address": ui,
            "to_address": vi,
            "nonce": float(data.get("nonce", 0)),
            "value": float(data.get("amount", data.get("value", 0))),
            "gas": float(data.get("gas", 0)),
            "gas_price": float(data.get("gas_price", 0)),
            "block_timestamp": ts,
        })
        for n in (ui, vi):
            if n not in first_tx or ts < first_tx[n]:
                first_tx[n] = ts
    pd.DataFrame(rows).to_csv(os.path.join(out_dir, "edges.csv"),
                              index=False)

    labels = []
    for addr, i in node_ids.items():
        attrs = graph.nodes[addr]
        labels.append({
            "node": i,
            "label": int(attrs.get("isp", attrs.get("label", 0))),
            "first_transaction": first_tx.get(i, 0.0),
        })
    pd.DataFrame(labels).to_csv(os.path.join(out_dir, "nodes.csv"),
                                index=False)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    with open(argv[0], "rb") as f:
        graph = pickle.load(f)
    export_eth_graph(graph, argv[1])
    print(f"exported {argv[1]}")


if __name__ == "__main__":
    main()
