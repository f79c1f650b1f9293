"""SSL quality table: LP ranking + MCM reconstruction artifacts.

RESULTS.md's supervised tables (``outputs/quality/``) show F1/AUC; this
sibling produces the reference's *self-supervised* metric surface —
MRR, Hits@{1,2,5,10} for link prediction and masked-cell accuracy/RMSE
for MCM (``/root/reference/src/utils/metric.py:10-52``, consumed by the
joint pretrainer's eval loop at ``fused.py:316-418``) — as checked-in
artifacts rather than just best-model tracking (VERDICT r3 next-step #6).

Runs the joint mcm-lp pretrain on the synthetic AML fixture and writes
under ``outputs/quality/ssl/``:

* ``metrics.jsonl``  — one record per epoch: train losses + per-epoch
  val MRR/Hits@k/accuracy/RMSE
* ``summary.json``   — final TEST-split metric surface + config + env

Usage: python tools/ssl_quality_run.py [--rows 8192] [--epochs 3]
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
jax.config.update("jax_compilation_cache_dir", "/tmp/rmm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192)
    ap.add_argument("--accounts", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=6)
    # planted link-structure signal (VERDICT r4 #3): intra-community
    # edges + per-community currency flavor — a GNN-recoverable pretext
    # signal so the LP artifact separates from a random ranker instead of
    # pinning mechanism only
    ap.add_argument("--communities", type=int, default=8)
    ap.add_argument("--mode", default="mcm-lp",
                    choices=["mcm", "lp", "mcm-lp"])
    ap.add_argument("--moo", default="sum", choices=["sum", "moco"])
    ap.add_argument("--num_neg_samples", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--num_layers", type=int, default=2)
    ap.add_argument("--out", default="outputs/quality/ssl")
    args = ap.parse_args()

    from rmm_tpu.datasets import IBMTransactionsAML
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.datasets.synthetic import write_synthetic_aml_csv
    from rmm_tpu.train.pretrain import PretrainTrainer
    from rmm_tpu.utils.config import Config

    os.makedirs(args.out, exist_ok=True)
    csv = os.path.join(args.out, "data.csv")
    write_synthetic_aml_csv(csv, num_rows=args.rows,
                            num_accounts=args.accounts, seed=0,
                            communities=args.communities)

    pretrain = {PretrainType.LINK_PRED}
    if "mcm" in args.mode:
        pretrain.add(PretrainType.MASK)
    cfg = Config(model="tabgnnfused", data=csv, batch_size=args.batch_size,
                 n_hidden=args.channels, n_gnn_layers=args.num_layers,
                 num_neighs=(100, 100), lr=args.lr,
                 num_neg_samples=args.num_neg_samples, moo=args.moo,
                 epochs=args.epochs, testing=True)
    ds = IBMTransactionsAML(root=csv, pretrain=pretrain,
                            khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden)
    tr = PretrainTrainer(cfg, ds, mode=args.mode)

    t0 = time.time()
    history, best = tr.fit()
    wall = time.time() - t0

    _, _, te = ds.edges.split()
    test_m = tr.evaluate(te, "test")

    with open(os.path.join(args.out, "metrics.jsonl"), "w") as f:
        for rec in history:
            f.write(json.dumps(rec) + "\n")
    summary = {
        "mode": args.mode, "moo": args.moo, "rows": args.rows,
        "communities": args.communities,
        "epochs": args.epochs, "num_neg_samples": args.num_neg_samples,
        "batch_size": args.batch_size, "channels": args.channels,
        "num_layers": args.num_layers,
        "platform": jax.default_backend(),
        "wall_s": round(wall, 1),
        "best_val": best,
        "test": {k: (round(v, 6) if isinstance(v, float) else v)
                 for k, v in test_m.items()},
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
