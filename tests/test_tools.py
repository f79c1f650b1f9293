"""Fast unit tests for the data tooling: the ETH graph exporter
(``data/download_eth_transactions.py`` analogue) and the EDA summarizer
(``data/*.ipynb`` analogue)."""
import os
import sys

import numpy as np
import pandas as pd


class _FakeMultiDiGraph:
    """Minimal networkx-MultiDiGraph stand-in (nodes/edges/attrs)."""

    def __init__(self):
        self._nodes = {
            "0xaaa": {"isp": 0}, "0xbbb": {"isp": 1}, "0xccc": {"label": 0},
        }
        self._edges = [
            ("0xaaa", "0xbbb", {"amount": 5.0, "timestamp": 100.0,
                                "gas": 21000.0, "gas_price": 2.0,
                                "nonce": 1.0}),
            ("0xbbb", "0xccc", {"value": 7.0, "block_timestamp": 50.0}),
            ("0xaaa", "0xccc", {"amount": 1.0, "timestamp": 200.0}),
        ]
        self.nodes = _NodeView(self._nodes)

    def edges(self, data=False):
        assert data
        return list(self._edges)


class _NodeView(dict):
    def __call__(self):
        return list(self.keys())


def test_export_eth_graph(tmp_path):
    from rmm_tpu.datasets.export_eth import export_eth_graph

    out = str(tmp_path / "eth")
    export_eth_graph(_FakeMultiDiGraph(), out)
    edges = pd.read_csv(os.path.join(out, "edges.csv"))
    nodes = pd.read_csv(os.path.join(out, "nodes.csv"))
    assert list(edges.columns) == ["from_address", "to_address", "nonce",
                                   "value", "gas", "gas_price",
                                   "block_timestamp"]
    assert len(edges) == 3 and len(nodes) == 3
    # amount/value aliases both land in `value`
    assert set(edges["value"]) == {5.0, 7.0, 1.0}
    # first_transaction = min ts over incident edges
    ft = dict(zip(nodes["node"], nodes["first_transaction"]))
    assert ft[0] == 100.0 and ft[1] == 50.0 and ft[2] == 50.0
    assert set(nodes["label"]) == {0, 1}


def test_eda_summarize(aml_csv):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import eda

    from rmm_tpu.datasets import IBMTransactionsAML

    ds = IBMTransactionsAML(root=aml_csv, khop_neighbors=(4, 4), channels=8)
    out = eda.summarize(ds)
    assert out["edges"] == 400
    assert out["graph_edges"] == 400
    assert sum(out["splits"].values()) == 400
    assert "Payment Format" in out["edge_columns"]
    assert out["edge_columns"]["Payment Format"]["cardinality"] >= 2
    assert out["in_degree"]["mean"] > 0
    assert set(out["label_balance"]) == {0, 1}


def test_eda_family_reports(tmp_path):
    """Every notebook-parity family report generates a well-formed
    markdown artifact (data/*.ipynb analyses as one command each)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import eda

    # non-jit families are cheap; keep the materializing one (aml) light
    for fam in ("eth", "hm", "musae"):
        path = eda.main(["--family", fam, "--report",
                         "--out", str(tmp_path)])
        text = open(path).read()
        assert text.startswith("#")
        assert "EDA" in text and "```" in text
        assert len(text) > 500
