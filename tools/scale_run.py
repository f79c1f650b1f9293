"""At-scale evidence run: HI-Small-scale synthetic AML (5M rows), config of
record, real epoch counts.

VERDICT r1 "Missing #2 / Next #8": nothing demonstrated the framework at
the reference's actual workload scale (AML HI-Small ≈ 5M rows,
``README.md:23-27``), for real epoch counts, with F1 AND AUC. Real data
cannot be downloaded here (zero egress), so this script generates a
5M-row synthetic AML with the planted-signal generator, runs the
supervised config of record (``main.py:161-190``: batch 200, lr 6.116e-4,
hidden 32, 2 GNN layers, CE weights [1, 9.23], khop [100,100],
temporal_daily splits), and records learning curves, epoch wall time,
sampler throughput on the 5M-edge CSR, capacity calibration, and
drop-rate. Output: JSONL learning curve + a summary JSON consumed by
RESULTS.md.

Usage:
    python tools/scale_run.py [--rows 5000000] [--epochs 20]
        [--out outputs/scale] [--model tabgnn]
        [--host_only] [--cpu]

``--host_only`` records the host-side at-scale evidence only (data
generation, 5M-edge CSR build, capacity auto-calibration, C++ sampler
throughput, trainer construction) and skips the training epochs — the
honest subset that is measurable when the accelerator is unreachable
(one CPU core cannot run 3M-row epochs). ``--cpu`` forces the CPU
platform before jax initializes (the ambient env pins the TPU-tunnel
platform, whose data plane can wedge even while ``jax.devices()``
answers).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", default=5_000_000, type=int)
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--model", default="tabgnn", type=str)
    p.add_argument("--out", default="outputs/scale", type=str)
    p.add_argument("--steps_per_dispatch", default=1, type=int)
    p.add_argument("--batch_size", default=200, type=int,
                   help="record config is 200; 800 is the measured "
                        "capacity-saturation sweet spot on TPU v5e "
                        "(docs/PERF.md lever ladder)")
    p.add_argument("--sampler_threads", default=4, type=int)
    p.add_argument("--host_only", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        # same recipe as tests/conftest.py: the .pth hook imports jax at
        # interpreter startup with the tunnel platform pinned — strip the
        # hook's relay vars and update the live config before any backend
        # initializes
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path[:] = [q for q in sys.path if "axon_site" not in q]
        for var in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
                    "AXON_LOOPBACK_RELAY"):
            os.environ.pop(var, None)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rmm_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
    from rmm_tpu.train.trainer import Trainer
    from rmm_tpu.utils.config import Config
    from rmm_tpu.utils.logging import RunLogger, logger_setup

    logger_setup()
    os.makedirs(args.out, exist_ok=True)
    csv = os.path.join("/tmp", f"scale_aml_{args.rows}.csv")
    t0 = time.time()
    if not os.path.exists(csv):
        print(f"generating {args.rows:,}-row synthetic AML …", flush=True)
        write_synthetic_aml_csv(csv, num_rows=args.rows,
                                num_accounts=max(args.rows // 10, 1000),
                                seed=0)
    gen_sec = time.time() - t0

    # supervised config of record (main.py:161-190, utils.py:40-44)
    cfg = Config(model=args.model, data=csv, task="edge_classification",
                 batch_size=args.batch_size, n_hidden=32, n_gnn_layers=2,
                 num_neighs=(100, 100), epochs=args.epochs,
                 steps_per_dispatch=args.steps_per_dispatch,
                 sampler_threads=args.sampler_threads, testing=True)

    t0 = time.time()
    ds = IBMTransactionsAML(root=csv, split_type=cfg.split_type,
                            khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden)
    build_sec = time.time() - t0
    print(f"dataset built in {build_sec:.1f}s "
          f"({ds.graph.num_edges:,} edges, {ds.graph.num_nodes:,} nodes)",
          flush=True)

    # sampler throughput on the full-scale CSR (measured standalone)
    t0 = time.time()
    tr_view = ds.edges.split()[0]
    import numpy as np
    y = np.asarray(tr_view.tensor_frame.y)
    n_probe = 50
    trainer = Trainer(cfg, ds)
    cal_sec = time.time() - t0
    t0 = time.time()
    for i in range(n_probe):
        bs = args.batch_size
        ds.get_graph_inputs(y[i * bs:(i + 1) * bs], bs, "train",
                            rng_seed=i)
    sampler_rps = n_probe * args.batch_size / (time.time() - t0)
    print(f"sampler: {sampler_rps:,.0f} rows/s on the "
          f"{ds.graph.num_edges / 1e6:.1f}M-edge CSR; capacities "
          f"edge={trainer.cfg.edge_capacity} node={trainer.cfg.node_capacity} "
          f"(trainer built in {cal_sec:.1f}s)", flush=True)

    if args.host_only:
        import jax

        summary = {
            "rows": args.rows,
            "edges": int(ds.graph.num_edges),
            "nodes": int(ds.graph.num_nodes),
            "model": args.model,
            "host_only": True,
            "platform": jax.default_backend(),
            "gen_sec": round(gen_sec, 1),
            "dataset_build_sec": round(build_sec, 1),
            "trainer_build_sec": round(cal_sec, 1),
            "edge_capacity": trainer.cfg.edge_capacity,
            "node_capacity": trainer.cfg.node_capacity,
            "sampler_rows_per_sec": round(sampler_rps, 1),
        }
        with open(os.path.join(args.out, "summary_host.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary, indent=2), flush=True)
        return

    rl = RunLogger(args.out, config=json.loads(cfg.to_json()),
                   use_wandb=False)
    t0 = time.time()
    history, best = trainer.fit(rl)
    total_sec = time.time() - t0
    rl.close()

    last = history[-1]
    best_rec = max(history, key=lambda r: r.get("val_f1", -1))
    import jax

    summary = {
        "rows": args.rows,
        "edges": int(ds.graph.num_edges),
        "nodes": int(ds.graph.num_nodes),
        "model": args.model,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "gen_sec": round(gen_sec, 1),
        "dataset_build_sec": round(build_sec, 1),
        "edge_capacity": trainer.cfg.edge_capacity,
        "node_capacity": trainer.cfg.node_capacity,
        "sampler_rows_per_sec": round(sampler_rps, 1),
        "epoch_sec_mean": round(float(np.mean(
            [r["sec"] for r in history])), 1),
        "train_rows_per_sec": round(
            tr_view.tensor_frame.num_rows
            / float(np.mean([r["sec"] for r in history])), 1),
        "drop_rate_max": max(r.get("drop_rate", 0.0) for r in history),
        "best_val_f1": best_rec.get("val_f1"),
        "best_epoch": best_rec.get("epoch"),
        "test_f1_at_best": best_rec.get("test_f1"),
        "val_auc_at_best": best_rec.get("val_auc"),
        "test_auc_at_best": best_rec.get("test_auc"),
        "final": {k: last.get(k) for k in
                  ("epoch", "loss", "f1", "auc", "val_f1", "val_auc",
                   "test_f1", "test_auc", "drop_rate")},
        "total_train_sec": round(total_sec, 1),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
