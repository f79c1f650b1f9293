"""Tabular-only MCM pretraining CLI — the ``fttransformer.py`` entry point
of the reference (``fttransformer.py:361-380`` defaults).

Usage:
    python -m rmm_tpu.cli.fttransformer --dataset <csv> --epochs 3 --testing
"""
from __future__ import annotations

import argparse
import logging
import os

from ..datasets import IBMTransactionsAML
from ..datasets.base import PretrainType
from ..utils.config import Config
from ..utils.logging import RunLogger, logger_setup
from ..train.tabular import TabularMCMTrainer


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, type=str)
    p.add_argument("--testing", action="store_true")
    p.add_argument("--checkpoint", default=None, type=str,
                   help="epoch checkpoint dir to resume from")
    p.add_argument("--save_model", action="store_true")
    p.add_argument("--mask_vector", action="store_true",
                   help="add the VIME-style mask-vector head + loss to "
                        "the MCM objective (the MV leg of the reference's "
                        "fused_mcm_mv_lp workflow)")
    p.add_argument("--batch_size", default=200, type=int)
    p.add_argument("--lr", default=2e-4, type=float)
    p.add_argument("--eps", default=1e-8, type=float)
    p.add_argument("--weight_decay", default=1e-3, type=float)
    p.add_argument("--epochs", default=50, type=int)
    p.add_argument("--channels", default=128, type=int)
    p.add_argument("--num_layers", default=3, type=int)
    p.add_argument("--dropout", default=0.5, type=float)
    p.add_argument("--split_type", default="temporal_daily", type=str)
    p.add_argument("--wandb_dir", default="wandb/", type=str)
    args = p.parse_args(argv)
    logger_setup()

    cfg = Config(model="fttransformer", data=args.dataset,
                 batch_size=args.batch_size, lr=args.lr, adam_eps=args.eps,
                 weight_decay=args.weight_decay, epochs=args.epochs,
                 n_hidden=args.channels, n_gnn_layers=args.num_layers,
                 dropout=args.dropout, split_type=args.split_type,
                 testing=args.testing, wandb_dir=args.wandb_dir)
    logging.info(cfg.to_json())
    dataset = IBMTransactionsAML(
        root=cfg.data, pretrain={PretrainType.MASK},
        split_type=cfg.split_type, channels=cfg.n_hidden)
    trainer = TabularMCMTrainer(cfg, dataset.edges,
                                mask_vector=args.mask_vector)
    start_epoch, best = 0, None
    if args.checkpoint:
        from ..utils.checkpoint import parse_checkpoint_path

        _, start_epoch = parse_checkpoint_path(args.checkpoint)
        start_epoch += 1
        best = trainer.restore(args.checkpoint)
        logging.info(f"Resumed from {args.checkpoint} "
                     f"(next epoch {start_epoch}, best {best})")
    run_dir = os.path.join(cfg.wandb_dir, "run_fttransformer")
    rl = RunLogger(run_dir, config=__import__("json").loads(cfg.to_json()),
                   use_wandb=not cfg.testing)
    ckpt_dir = run_dir if (args.save_model or args.checkpoint) else None
    history, best = trainer.fit(rl, ckpt_dir, start_epoch, best)
    rl.close()
    logging.info(f"best: {best}")
    return history, best


if __name__ == "__main__":
    main()
