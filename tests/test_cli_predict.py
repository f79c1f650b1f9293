"""Inference CLI: train -> checkpoint -> predict scores for every row."""
import csv
import os

import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


def test_predict_cli_roundtrip(tmp_path):
    csv_path = str(tmp_path / "aml.csv")
    write_synthetic_aml_csv(csv_path, num_rows=400, num_accounts=60, seed=0)
    cfg = Config(model="tabgnn", data=csv_path, task="edge_classification",
                 batch_size=32, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(4, 4), edge_capacity=256, node_capacity=256,
                 epochs=1, testing=True, lr=1e-3)
    ds = IBMTransactionsAML(root=csv_path, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden,
                            edge_capacity=cfg.edge_capacity,
                            node_capacity=cfg.node_capacity)
    tr = Trainer(cfg, ds)
    run_dir = str(tmp_path / "run")
    tr.fit(run_dir=run_dir)
    ck = os.path.join(run_dir, "0")
    assert os.path.isdir(ck)

    from rmm_tpu.cli import predict

    out_path = str(tmp_path / "preds.csv")
    out = predict.main([
        "--data", csv_path, "--model", "tabgnn", "--batch_size", "32",
        "--n_hidden", "16", "--n_gnn_layers", "1", "--num_neighs", "4", "4",
        "--edge_capacity", "256", "--node_capacity", "256", "--testing",
        "--load_model", ck, "--split", "all", "--output", out_path,
    ])
    # every real row scored exactly once, ids are edge-table row ids
    assert len(out["id"]) == 400
    assert len(np.unique(out["id"])) == 400
    assert set(np.unique(out["pred"])) <= {0, 1}
    assert np.all((out["score"] >= 0) & (out["score"] <= 1))
    with open(out_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "pred", "score"]
    assert len(rows) == 401


def test_predict_split_subset(tmp_path):
    csv_path = str(tmp_path / "aml.csv")
    write_synthetic_aml_csv(csv_path, num_rows=300, num_accounts=50, seed=1)
    cfg = Config(model="fttransformer", data=csv_path,
                 task="edge_classification", batch_size=32, n_hidden=16,
                 n_gnn_layers=1, num_neighs=(4, 4), edge_capacity=256,
                 node_capacity=256, epochs=1, testing=True, lr=1e-3)
    ds = IBMTransactionsAML(root=csv_path, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden,
                            edge_capacity=cfg.edge_capacity,
                            node_capacity=cfg.node_capacity)
    tr = Trainer(cfg, ds)
    run_dir = str(tmp_path / "run")
    tr.fit(run_dir=run_dir)

    from rmm_tpu.cli import predict

    out = predict.main([
        "--data", csv_path, "--model", "fttransformer", "--batch_size",
        "32", "--n_hidden", "16", "--n_gnn_layers", "1", "--num_neighs",
        "4", "4", "--edge_capacity", "256", "--node_capacity", "256",
        "--testing", "--load_model", os.path.join(run_dir, "0"),
        "--split", "test", "--output", str(tmp_path / "p.csv"),
    ])
    n_test = len(ds.edges.split()[2].tensor_frame.y)
    assert len(out["id"]) == n_test


def test_predict_device_sampler(tmp_path):
    """predict() with --sampler device: ids come from the SeedBatch, every
    real row scored once."""
    csv_path = str(tmp_path / "aml.csv")
    write_synthetic_aml_csv(csv_path, num_rows=300, num_accounts=50, seed=3)
    cfg = Config(model="tabgnn", data=csv_path, task="edge_classification",
                 batch_size=32, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(4, 4), edge_capacity=256, node_capacity=256,
                 epochs=1, testing=True, lr=1e-3, sampler="device")
    ds = IBMTransactionsAML(root=csv_path, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden,
                            edge_capacity=cfg.edge_capacity,
                            node_capacity=cfg.node_capacity)
    tr = Trainer(cfg, ds)
    out = tr.predict(ds.edges, mode="test")
    assert len(out["id"]) == 300
    assert len(np.unique(out["id"])) == 300
    assert set(np.unique(out["pred"])) <= {0, 1}


def test_predict_node_task(tmp_path):
    """Node-classification predict: ids are node ids; ignore-label rows
    (elliptic unknown class) are excluded, as in evaluation."""
    from rmm_tpu.datasets.elliptic import EllipticBitcoin
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset

    root = write_synthetic_node_dataset(str(tmp_path / "ell"),
                                        family="elliptic")
    ds = EllipticBitcoin(root=root, khop_neighbors=(4, 4),
                         edge_capacity=1024, node_capacity=512)
    cfg = Config(model="tabgnn", task="node_classification", n_classes=2,
                 batch_size=32, epochs=1, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(4, 4), lr=1e-3, edge_capacity=1024,
                 node_capacity=512, testing=True)
    tr = Trainer(cfg, ds)
    tr.fit()
    out = tr.predict(ds.nodes, mode="test")
    y = np.asarray(ds.nodes.tensor_frame.y)[:, 0]
    n_labeled = int((y != 2).sum())
    assert len(out["id"]) == n_labeled
    assert len(np.unique(out["id"])) == n_labeled
    # every returned id is a real (labeled) node id
    node_ids = np.asarray(ds.nodes.tensor_frame.y)[:, 1].astype(np.int64) \
        if ds.nodes.tensor_frame.y.shape[1] > 1 else None
    assert out["id"].min() >= 0
