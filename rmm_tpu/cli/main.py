"""Supervised / MCM CLI trainer — the ``main.py`` entry point of the
reference, rebuilt on the unified trainer.

Usage (flag surface mirrors ``utils.py:32-61``):
    python -m rmm_tpu.cli.main --data <csv-or-dir> --model tabgnn \
        --task edge_classification --epochs 20 --testing
"""
from __future__ import annotations

import logging
import os

import numpy as np

from ..datasets import build_dataset
from ..utils.checkpoint import load_components, parse_checkpoint_path
from ..utils.config import config_from_args, create_parser
from ..utils.logging import RunLogger, logger_setup
from ..train.trainer import Trainer


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    from ..parallel.distributed import is_primary, maybe_init_distributed
    multi_host = maybe_init_distributed()
    parser = create_parser()
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    logger_setup()
    logging.info(cfg.to_json())
    if multi_host and not is_primary():
        # secondary hosts train but don't own wandb/checkpoints
        cfg = cfg.replace(testing=True, save_model=False)

    start_epoch, run_id, best_m = 0, None, None
    if cfg.checkpoint and cfg.load_model:
        run_id, start_epoch = parse_checkpoint_path(cfg.load_model)
        start_epoch += 1
        try:
            from ..utils.checkpoint import load_best_m
            best_m = load_best_m(cfg.load_model)
        except OSError:
            best_m = None
        logging.info(f"Resuming run {run_id} from epoch {start_epoch}")

    dataset = build_dataset(cfg)
    if hasattr(dataset, "n_classes"):
        cfg = cfg.replace(n_classes=dataset.n_classes)
        logging.info(f"dataset declares n_classes={cfg.n_classes}")

    if getattr(args, "dp", 0):
        from ..utils.jaxenv import ensure_devices
        from ..train.dp_trainer import DataParallelTrainer

        ensure_devices(args.dp)

        trainer = DataParallelTrainer(cfg, dataset, n_devices=args.dp,
                                      freeze_tabular=cfg.freeze)
    else:
        trainer = Trainer(cfg, dataset, freeze_tabular=cfg.freeze)
    if cfg.load_model:
        components = None if cfg.checkpoint else ["node_encoder",
                                                  "edge_encoder"]
        logging.info(f"Loading {components or 'all'} from {cfg.load_model}")
        # full-model resume must not silently fall back to fresh init;
        # encoder transfer (SSL → supervised) legitimately merges loose.
        trainer.variables = load_components(
            cfg.load_model, trainer.variables, components,
            on_mismatch="raise" if cfg.checkpoint else "warn")

    n_params = sum(int(np.prod(np.shape(p)))
                   for p in __import__("jax").tree_util.tree_leaves(
                       trainer.variables["params"]))
    logging.info(f"Number of trainable parameters: {n_params}")

    run_dir = os.path.join(cfg.wandb_dir, run_id) if run_id else os.path.join(
        cfg.wandb_dir, f"run_{os.getpid()}")
    rl = RunLogger(run_dir, config=__import__("json").loads(cfg.to_json()),
                   use_wandb=not cfg.testing, run_id=run_id, group=cfg.group)
    ckpt_dir = run_dir if (not multi_host or is_primary()) else None
    history, best = trainer.fit(rl, ckpt_dir, start_epoch, best_m)
    rl.close()
    return history, best


if __name__ == "__main__":
    main()
