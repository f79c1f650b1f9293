"""Fixture-driven runbook smoke: the EXACT documented real-data pipelines
(docs/RUNBOOK.md) run end-to-end against schema-exact dummy raw inputs.

The real datasets (Kaggle IBM AML HI-Small, the ethereum-phishing
MultiDiGraph pickle) need downloads this zero-egress environment cannot
do; these tests pin the reference's `dummy.csv` pattern
(/root/reference/test/ibm.py:6) instead — a raw fixture with the real
files' byte-level schema — so quality parity is executable the moment the
data is reachable: swap the fixture path for the download, the commands
are identical.
"""
import os
import pickle

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


def write_raw_hi_small(path: str, num_rows: int = 400, num_accounts: int = 60,
                       seed: int = 0) -> str:
    """Schema-exact RAW Kaggle HI-Small_Trans.csv: the untouched download's
    columns and dtypes (string timestamps '%Y/%m/%d %H:%M', separate
    bank/account columns incl. the pandas-mangled duplicate 'Account.1',
    currency strings) — what data/prepare_AML_transactions.py consumes."""
    rng = np.random.default_rng(seed)
    banks = rng.integers(1, 25, size=(num_rows, 2))
    accounts = rng.integers(0, num_accounts, size=(num_rows, 2))
    minutes = np.sort(rng.integers(0, 60 * 24 * 10, size=num_rows))
    ts = pd.to_datetime("2022/09/01 00:00") + pd.to_timedelta(minutes, "m")
    amount = np.round(np.exp(rng.normal(5, 2, size=num_rows)), 2)
    cur = rng.choice(["US Dollar", "Euro", "Shekel", "Australian Dollar"],
                     size=num_rows)
    fmt = rng.choice(["Credit Card", "Cheque", "ACH", "Wire"],
                     size=num_rows)
    df = pd.DataFrame({
        "Timestamp": ts.strftime("%Y/%m/%d %H:%M"),
        "From Bank": banks[:, 0],
        "Account": [f"80{a:07X}" for a in accounts[:, 0]],
        "To Bank": banks[:, 1],
        "Account.1": [f"80{a:07X}" for a in accounts[:, 1]],
        "Amount Received": amount,
        "Receiving Currency": cur,
        "Amount Paid": amount,
        "Payment Currency": cur,
        "Payment Format": fmt,
        "Is Laundering": (rng.random(num_rows) < 0.15).astype(int),
    })
    df.to_csv(path, index=False)
    return path


def test_runbook_aml_prepare_train_predict(tmp_path):
    """RUNBOOK §AML, verbatim: raw Kaggle CSV → prepare_aml → supervised
    train w/ checkpoint → predict → per-row output CSV."""
    raw = str(tmp_path / "HI-Small_Trans.csv")
    prepared = str(tmp_path / "HI-Small_Trans-c.csv")
    write_raw_hi_small(raw)

    # step 1: python -m rmm_tpu.datasets.prepare_aml <raw> <prepared>
    from rmm_tpu.datasets.prepare_aml import main as prepare_main
    prepare_main([raw, prepared])
    out = pd.read_csv(prepared)
    assert {"From ID", "To ID", "Timestamp"} <= set(out.columns)
    assert np.issubdtype(out["Timestamp"].dtype, np.number)
    for col in ("Amount Paid", "Amount Received"):  # log1p + min-max
        assert 0.0 <= out[col].min() and out[col].max() <= 1.0

    # step 2: python -m rmm_tpu.cli.main --data <prepared> ... --save_model
    from rmm_tpu.cli import main as cli_main
    wandb_dir = str(tmp_path / "wandb")
    hist, best = cli_main.main([
        "--data", prepared, "--model", "tabgnn",
        "--task", "edge_classification", "--epochs", "1",
        "--batch_size", "32", "--n_hidden", "16", "--n_gnn_layers", "1",
        "--num_neighs", "4", "4", "--save_model",
        "--testing", "--wandb_dir", wandb_dir])
    assert np.isfinite(hist[-1]["loss"]) and 0.0 <= best <= 1.0
    run = os.path.join(wandb_dir, os.listdir(wandb_dir)[0])

    # step 3: python -m rmm_tpu.cli.predict --load_model <run>/<epoch>
    from rmm_tpu.cli import predict as cli_predict
    preds_csv = str(tmp_path / "preds.csv")
    cli_predict.main([
        "--data", prepared, "--model", "tabgnn",
        "--task", "edge_classification",
        "--load_model", os.path.join(run, "0"), "--split", "test",
        "--batch_size", "32", "--n_hidden", "16", "--n_gnn_layers", "1",
        "--num_neighs", "4", "4", "--output", preds_csv, "--testing"])
    preds = pd.read_csv(preds_csv)
    assert len(preds) > 0 and "pred" in preds.columns


def test_runbook_eth_export_pretrain_node_train(tmp_path):
    """RUNBOOK §ETH, verbatim: networkx MultiDiGraph pickle → export_eth
    → nodes.csv/edges.csv → fused MCM pretrain + supervised node task."""
    networkx = pytest.importorskip("networkx")
    rng = np.random.default_rng(1)
    g = networkx.MultiDiGraph()
    n_nodes, n_edges = 120, 360
    for i in range(n_nodes):
        g.add_node(f"0x{i:040x}", isp=int(rng.random() < 0.1))
    for _ in range(n_edges):
        u, v = rng.integers(0, n_nodes, size=2)
        g.add_edge(
            f"0x{u:040x}", f"0x{v:040x}",
            amount=float(np.exp(rng.normal(0, 1))),
            timestamp=float(rng.integers(1.5e9, 1.6e9)),
            nonce=float(rng.integers(0, 100)),
            gas=float(rng.integers(21000, 100000)),
            gas_price=float(rng.integers(1, 100) * 1e9))
    pkl = str(tmp_path / "eth_graph.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(g, f)

    # step 1: python -m rmm_tpu.datasets.export_eth <graph.pkl> <out_dir>
    # (the out_dir name routes build_dataset to EthereumPhishing)
    from rmm_tpu.datasets.export_eth import main as export_main
    root = str(tmp_path / "ethereum-phishing-transaction-network")
    export_main([pkl, root])
    nodes = pd.read_csv(os.path.join(root, "nodes.csv"))
    edges = pd.read_csv(os.path.join(root, "edges.csv"))
    assert len(nodes) == n_nodes and len(edges) == n_edges
    assert {"node", "label", "first_transaction"} <= set(nodes.columns)

    # step 2: python -m rmm_tpu.cli.fused --dataset <out_dir> --mode mcm
    from rmm_tpu.cli import fused
    hist, _ = fused.main([
        "--dataset", root, "--mode", "mcm", "--epochs", "1",
        "--batch_size", "16", "--channels", "8", "--num_layers", "1",
        "--khop_neighbors", "8", "8", "--num_neg_samples", "4",
        "--testing", "--wandb_dir", str(tmp_path / "wandb_ssl")])
    assert np.isfinite(hist[0]["loss"])

    # step 3: python -m rmm_tpu.cli.main --data <out_dir> --task node_...
    from rmm_tpu.cli import main as cli_main
    hist2, best = cli_main.main([
        "--data", root, "--model", "tabgnn",
        "--task", "node_classification", "--epochs", "1",
        "--batch_size", "16", "--n_hidden", "8", "--n_gnn_layers", "1",
        "--num_neighs", "8", "8",
        "--testing", "--wandb_dir", str(tmp_path / "wandb_sup")])
    assert np.isfinite(hist2[-1]["loss"]) and 0.0 <= best <= 1.0
