"""Node-classification quality table (the reference's node-task datasets:
OGBN-Arxiv / MUSAE-GitHub / LastFM-Asia / Elliptic — ``main.py`` with
``--task node_classification``).

Real downloads are unreachable here (zero egress), so each family runs on
its schema-exact synthetic fixture with a planted homophily signal
(``datasets/synthetic.py:write_synthetic_node_dataset``): a learnable
structure the GNN must beat the class prior on. Writes per-family
``metrics.jsonl`` + ``summary.json`` under ``outputs/quality/node/``.

Usage: python tools/node_quality_run.py [--epochs 4] [--nodes 600]
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

# (family fixture name, n_classes, majority-class prior is reported too)
FAMILIES = {
    "ogbn": {"n_classes": 4},
    "musae": {"n_classes": 2},
    "lastfm": {"n_classes": 4},
    "elliptic": {"n_classes": 2},   # + ignore_label=2 masking in play
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=600)
    ap.add_argument("--edges", type=int, default=2400)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--model", default="tabgnn")
    ap.add_argument("--families", nargs="+", default=list(FAMILIES))
    ap.add_argument("--out", default="outputs/quality/node")
    args = ap.parse_args()

    import numpy as np

    from rmm_tpu.datasets import build_dataset
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset
    from rmm_tpu.train.trainer import Trainer
    from rmm_tpu.utils.config import Config

    os.makedirs(args.out, exist_ok=True)
    summary = {"nodes": args.nodes, "edges": args.edges,
               "epochs": args.epochs, "model": args.model,
               "devices": str(jax.devices()), "families": {}}
    for fam in args.families:
        spec = FAMILIES[fam]
        root = write_synthetic_node_dataset(
            os.path.join(args.out, fam), family=fam, num_nodes=args.nodes,
            num_edges=args.edges, n_classes=spec["n_classes"], seed=7)
        cfg = Config(model=args.model, data=root,
                     task="node_classification",
                     n_classes=spec["n_classes"], batch_size=64,
                     epochs=args.epochs, n_hidden=16, n_gnn_layers=2,
                     num_neighs=(16, 16), lr=1e-3, testing=True)
        ds = build_dataset(cfg)
        cfg = cfg.replace(n_classes=getattr(ds, "n_classes",
                                            spec["n_classes"]))
        t0 = time.time()
        tr = Trainer(cfg, ds)
        history, best = tr.fit()
        sec = time.time() - t0

        # trivial-predictor baselines on the labeled nodes — the bars the
        # planted-signal run must clear. majority_prior is the majority
        # class's ACCURACY; baseline_f1 is the majority predictor's F1
        # under the SAME averaging the trainer reports (binary F1 for
        # 2-class, weighted otherwise) so the comparison is commensurate.
        from rmm_tpu.utils.metric import f1_score

        y = np.asarray(ds.nodes.tensor_frame.y)
        y = y[:, 0] if y.ndim > 1 else y
        ign = getattr(ds, "ignore_label", None)
        if ign is not None:
            y = y[y != ign]
        y = y.astype(int)
        counts = np.bincount(y)
        prior = float(counts.max() / max(len(y), 1))
        maj = int(counts.argmax())
        avg = "binary" if cfg.n_classes == 2 else "weighted"
        baseline_f1 = float(f1_score(y, np.full_like(y, maj), average=avg))

        fam_dir = os.path.join(args.out, fam)
        with open(os.path.join(fam_dir, "metrics.jsonl"), "w") as f:
            for rec in history:
                f.write(json.dumps({k: v for k, v in rec.items()
                                    if not k.startswith("_")}) + "\n")
        final = history[-1]
        summary["families"][fam] = {
            "n_classes": cfg.n_classes,
            "majority_prior": round(prior, 4),
            "majority_f1_baseline": round(baseline_f1, 4),
            "best_val_f1": round(float(best), 4),
            "final_test_f1": round(float(final.get("test_f1", 0.0)), 4),
            "train_sec": round(sec, 1),
        }
        print(fam, summary["families"][fam])

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["families"]))


if __name__ == "__main__":
    main()
