"""Batch-inference CLI (serving path).

Loads a training checkpoint (the per-epoch component dirs of
``utils/checkpoint.py``) and scores rows of a dataset CSV:

    python -m rmm_tpu.cli.predict --data <csv> --model tabgnn \
        --load_model wandb/<run>/<epoch> --split test --output preds.csv

Writes one row per scored seed (``id,pred[,score]``). ``--split all``
scores every row (train+val+test) with the full-graph sampler; per-split
modes keep the leakage-safe per-split graphs used in evaluation. The
reference has no inference entry point — its scripts end at test-set F1
(``main.py:359-405``) — but a framework meant for production needs one.
"""
from __future__ import annotations

import logging

import numpy as np


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()

    from ..datasets import build_dataset
    from ..utils.config import config_from_args, create_parser
    from ..utils.checkpoint import load_components
    from ..utils.logging import logger_setup
    from ..train.trainer import Trainer

    p = create_parser()
    p.add_argument("--split", default="test",
                   choices=("train", "val", "test", "all"))
    p.add_argument("--output", default="predictions.csv", type=str)
    args = p.parse_args(argv)
    if not args.load_model:
        raise SystemExit("--load_model <checkpoint dir> is required")
    logger_setup()
    cfg = config_from_args(args)
    dataset = build_dataset(cfg)
    if hasattr(dataset, "n_classes"):
        cfg = cfg.replace(n_classes=dataset.n_classes)
    trainer = Trainer(cfg, dataset)
    # serving must never run on fresh-init weights: raise on any leaf
    # that fails to load (e.g. a checkpoint trained at another --n_hidden)
    trainer.variables = load_components(args.load_model, trainer.variables,
                                        on_mismatch="raise")

    table = dataset.nodes if "node" in cfg.task else dataset.edges
    if args.split == "all":
        views = [(table, "test")]   # full-graph sampler for production
    else:
        idx = ("train", "val", "test").index(args.split)
        views = [(table.split()[idx], args.split)]
    parts = [trainer.predict(view, mode=m) for view, m in views]
    out = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    import csv

    cols = list(out.keys())
    with open(args.output, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for row in zip(*(out[c] for c in cols)):
            w.writerow([x for x in row])
    logging.info("wrote %d predictions to %s", len(out["id"]), args.output)
    return out


if __name__ == "__main__":
    main()
