"""Supervised quality table with checked-in provenance.

Trains each headline model (tabgnn / pna / tabgnnfused / fttransformer)
for N epochs on the synthetic AML fixture at the supervised config of
record (``main.py:161-190`` hyperparameters) and writes per-model
``metrics.jsonl`` + a ``summary.json`` under ``outputs/quality/`` — the
artifacts RESULTS.md's quality table cites.

Usage: python tools/quality_run.py [--rows 16384] [--epochs 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("RMM_QUALITY_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path = [p for p in sys.path if "axon_site" not in p]
    for _v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
               "AXON_LOOPBACK_RELAY"):
        os.environ.pop(_v, None)

import jax  # noqa: E402

if os.environ.get("RMM_QUALITY_CPU", "1") == "1":
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--accounts", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--models", nargs="+",
                    default=["tabgnn", "pna", "tabgnnfused",
                             "fttransformer"])
    ap.add_argument("--out", default="outputs/quality")
    args = ap.parse_args()

    from rmm_tpu.datasets import IBMTransactionsAML
    from rmm_tpu.datasets.prepare_aml import prepare_aml_transactions
    from rmm_tpu.datasets.synthetic import synthetic_aml_frame
    from rmm_tpu.train.trainer import Trainer
    from rmm_tpu.utils.config import Config

    os.makedirs(args.out, exist_ok=True)
    csv = os.path.join(args.out, "data.csv")
    df = prepare_aml_transactions(synthetic_aml_frame(
        num_rows=args.rows, num_accounts=args.accounts, seed=11))
    df.to_csv(csv, index=False)

    summary = {"rows": args.rows, "epochs": args.epochs,
               "devices": str(jax.devices()), "models": {}}
    for model in args.models:
        # supervised config of record (main.py:161-190)
        cfg = Config(model=model, data=csv, task="edge_classification",
                     batch_size=200, n_hidden=32, n_gnn_layers=2,
                     epochs=args.epochs, testing=True)
        ds = IBMTransactionsAML(root=csv, khop_neighbors=cfg.num_neighs,
                                channels=cfg.n_hidden)
        t0 = time.time()
        tr = Trainer(cfg, ds)
        mdir = os.path.join(args.out, model)
        os.makedirs(mdir, exist_ok=True)

        class _Stream:
            """Append each epoch record as it lands — a tunnel flap (or
            the chip-queue job timeout) at epoch 29/30 must not lose the
            whole learning curve."""

            def __init__(self, path):
                self.f = open(path, "w")

            def log(self, rec, step=None):
                self.f.write(json.dumps(rec, default=float) + "\n")
                self.f.flush()

        stream = _Stream(os.path.join(mdir, "metrics.jsonl"))
        hist, best = tr.fit(run_logger=stream)
        stream.f.close()
        sec = time.time() - t0
        best_ep = max(hist, key=lambda r: r.get("val_f1", -1))
        summary["models"][model] = {
            "best_val_f1": best_ep.get("val_f1"),
            "test_f1_at_best": best_ep.get("test_f1"),
            "val_auc_at_best": best_ep.get("val_auc"),
            "test_auc_at_best": best_ep.get("test_auc"),
            "wall_sec": round(sec, 1),
        }
        print(model, json.dumps(summary["models"][model]), flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)


if __name__ == "__main__":
    main()
