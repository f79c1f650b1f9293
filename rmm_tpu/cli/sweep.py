"""Hyperparameter sweep runners.

Rebuilds ``supervised_sweep.py`` / ``fused_sweep.py``: random search over
the same parameter spaces (supervised: lr / dropout / n_gnn_layers /
n_hidden, ``supervised_sweep.py:52-82``; fused: dropout / batch_size,
``fused_sweep.py:57-127``), run locally instead of via wandb agents
(share-nothing trials, results streamed to a JSONL leaderboard).

Usage:
    python -m rmm_tpu.cli.sweep --kind supervised --data <csv> \
        --model tabgnn --trials 8 --epochs 3 --testing
"""
from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

from ..datasets import build_dataset
from ..utils.config import Config
from ..utils.logging import logger_setup

SUPERVISED_SPACE = {
    "lr": ("log_uniform", 1e-4, 1e-2),
    "dropout": ("uniform", 0.0, 0.5),
    "n_gnn_layers": ("choice", [1, 2, 3]),
    "n_hidden": ("choice", [16, 32, 64]),
}

FUSED_SPACE = {
    "dropout": ("uniform", 0.1, 0.6),
    "batch_size": ("choice", [64, 128, 200, 256]),
}


def sample_params(space: dict, rng: np.random.RandomState) -> dict:
    out = {}
    for name, spec in space.items():
        kind = spec[0]
        if kind == "log_uniform":
            lo, hi = np.log(spec[1]), np.log(spec[2])
            out[name] = float(np.exp(rng.uniform(lo, hi)))
        elif kind == "uniform":
            out[name] = float(rng.uniform(spec[1], spec[2]))
        elif kind == "choice":
            out[name] = spec[1][rng.randint(len(spec[1]))]
    return out


def run_sweep(kind: str, base_cfg: Config, trials: int, out_path: str,
              seed: int = 0):
    rng = np.random.RandomState(seed)
    space = SUPERVISED_SPACE if kind == "supervised" else FUSED_SPACE
    results = []
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "a") as f:
        for trial in range(trials):
            params = sample_params(space, rng)
            cfg = base_cfg.replace(**params)
            logging.info(f"trial {trial}: {params}")
            if kind == "supervised":
                from ..train.trainer import Trainer

                dataset = build_dataset(cfg)
                if hasattr(dataset, "n_classes"):
                    cfg = cfg.replace(n_classes=dataset.n_classes)
                tr = Trainer(cfg, dataset)
                _, best = tr.fit()
                score = float(best)
                metric = "val_f1"
            else:
                from ..datasets.base import PretrainType
                from ..datasets import IBMTransactionsAML
                from ..train.pretrain import PretrainTrainer

                dataset = IBMTransactionsAML(
                    root=cfg.data,
                    pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
                    khop_neighbors=cfg.num_neighs, channels=cfg.n_hidden,
                    edge_capacity=cfg.edge_capacity,
                    node_capacity=cfg.node_capacity)
                tr = PretrainTrainer(cfg, dataset, mode="mcm-lp")
                _, best = tr.fit()
                score = float(best["mrr"])
                metric = "val_mrr"
            rec = {"trial": trial, "params": params, metric: score}
            results.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            logging.info(f"trial {trial}: {metric}={score:.4f}")
    best = max(results, key=lambda r: r[metric])
    logging.info(f"best trial: {best}")
    return results, best


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    p = argparse.ArgumentParser()
    p.add_argument("--kind", default="supervised",
                   choices=["supervised", "fused"])
    p.add_argument("--data", required=True, type=str)
    p.add_argument("--model", default="tabgnn", type=str)
    p.add_argument("--task", default="edge_classification", type=str)
    p.add_argument("--trials", default=8, type=int)
    p.add_argument("--epochs", default=3, type=int)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--num_neighs", nargs="+", type=int, default=[10, 10])
    p.add_argument("--edge_capacity", default=2048, type=int)
    p.add_argument("--node_capacity", default=2048, type=int)
    p.add_argument("--num_neg_samples", default=16, type=int)
    p.add_argument("--out", default="sweeps/results.jsonl", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--testing", action="store_true")
    args = p.parse_args(argv)
    logger_setup()
    cfg = Config(model=args.model, data=args.data, task=args.task,
                 epochs=args.epochs, batch_size=args.batch_size,
                 num_neighs=tuple(args.num_neighs),
                 edge_capacity=args.edge_capacity,
                 node_capacity=args.node_capacity,
                 num_neg_samples=args.num_neg_samples, testing=args.testing)
    return run_sweep(args.kind, cfg, args.trials, args.out, args.seed)


if __name__ == "__main__":
    main()
