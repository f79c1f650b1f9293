"""Two-stage SSL→supervised evidence run (reference workflow:
``fused.py`` pretrain → ``main.py --load_model … --freeze`` transfer,
``main.py:271-276,347-350``).

Pretrains TABGNNFused (mcm-lp) on the synthetic AML table, exports the
best-MRR checkpoint, then trains supervised edge classification twice —
from scratch vs from the pretrained encoders — and writes
``outputs/two_stage/summary.json`` with both learning curves.

Usage: python tools/two_stage_run.py [--rows 4000] [--epochs 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU is fine for this (quality evidence, not a throughput claim); keep it
# runnable anywhere by not insisting on the TPU tunnel. The axon .pth hook
# imports jax at interpreter startup and pins jax_platforms=axon, so the
# env var alone is too late — update the live config (see tests/conftest).
if os.environ.get("RMM_TWO_STAGE_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path = [p for p in sys.path if "axon_site" not in p]
    for _v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
               "AXON_LOOPBACK_RELAY"):
        os.environ.pop(_v, None)

import jax  # noqa: E402

if os.environ.get("RMM_TWO_STAGE_CPU", "1") == "1":
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4000)
    ap.add_argument("--accounts", type=int, default=300)
    ap.add_argument("--pretrain_epochs", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default="outputs/two_stage")
    args = ap.parse_args()

    from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.train.pretrain import PretrainTrainer
    from rmm_tpu.train.trainer import Trainer
    from rmm_tpu.utils.checkpoint import load_components
    from rmm_tpu.utils.config import Config

    os.makedirs(args.out, exist_ok=True)
    csv = os.path.join(args.out, "data.csv")
    # normalized floats (log1p + min-max), as the reference's prep script
    # does (data/prepare_AML_transactions.py:47-53) — raw log-normal
    # amounts make the MCM numerical head chase unbounded targets
    from rmm_tpu.datasets.prepare_aml import prepare_aml_transactions
    from rmm_tpu.datasets.synthetic import synthetic_aml_frame

    df = prepare_aml_transactions(synthetic_aml_frame(
        num_rows=args.rows, num_accounts=args.accounts, seed=7))
    df.to_csv(csv, index=False)

    base = dict(data=csv, batch_size=128, n_hidden=32, n_gnn_layers=2,
                num_neighs=(20, 20), testing=True, num_neg_samples=16)

    # ---- stage 1: SSL pretrain (mcm-lp), per-epoch + best-metric ckpts
    pcfg = Config(model="tabgnnfused", epochs=args.pretrain_epochs,
                  dropout=0.5, lr=2e-4, **base)
    pds = IBMTransactionsAML(
        root=csv, pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        khop_neighbors=pcfg.num_neighs, channels=pcfg.n_hidden)
    run_dir = os.path.join(args.out, "ssl_run")
    t0 = time.time()
    ptr = PretrainTrainer(pcfg, pds, mode="mcm-lp")
    phist, pbest = ptr.fit(run_dir=run_dir)
    pretrain_sec = time.time() - t0

    # ---- stage 2: supervised, scratch vs transfer (same seed/config)
    scfg = Config(model="tabgnn", task="edge_classification",
                  epochs=args.epochs, lr=6.116e-4, **base)
    results = {}
    for name, transfer in (("scratch", False), ("pretrained", True)):
        sds = IBMTransactionsAML(root=csv, pretrain={},
                                 khop_neighbors=scfg.num_neighs,
                                 channels=scfg.n_hidden)
        tr = Trainer(scfg, sds)
        if transfer:
            tr.variables = load_components(
                os.path.join(run_dir, "best_mrr"), tr.variables,
                ["node_encoder", "edge_encoder"])
        hist, best = tr.fit()
        results[name] = {"history": hist, "best_val_f1": best}

    summary = {
        "rows": args.rows,
        "pretrain": {"epochs": args.pretrain_epochs,
                     "sec": round(pretrain_sec, 1),
                     "final": phist[-1], "best": pbest},
        "supervised_epochs": args.epochs,
        "scratch": results["scratch"],
        "pretrained": results["pretrained"],
        "devices": str(jax.devices()),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps({
        "scratch_best_val_f1": results["scratch"]["best_val_f1"],
        "pretrained_best_val_f1": results["pretrained"]["best_val_f1"],
        "scratch_epoch0_val_f1": results["scratch"]["history"][0]["val_f1"],
        "pretrained_epoch0_val_f1":
            results["pretrained"]["history"][0]["val_f1"],
    }))


if __name__ == "__main__":
    main()
