"""Joint SSL pretraining CLI — the ``fused.py`` entry point of the
reference (fire-style keyword flags, same defaults: ``fused.py:626-655``).

Usage:
    python -m rmm_tpu.cli.fused --dataset <csv> --mode mcm-lp \
        --batch_size 200 --lr 2e-4 --channels 128 --num_layers 3 \
        --dropout 0.5 --num_neg_samples 64 --epochs 1 --testing
"""
from __future__ import annotations

import argparse
import logging
import os

from ..datasets import IBMTransactionsAML
from ..datasets.base import PretrainType
from ..utils.config import Config
from ..utils.logging import RunLogger, logger_setup
from ..train.pretrain import PretrainTrainer


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, type=str)
    p.add_argument("--mode", default="mcm-lp",
                   choices=["mcm", "lp", "mcm-lp"])
    p.add_argument("--run_name", default="fused", type=str)
    p.add_argument("--checkpoint", default=None, type=str,
                   help="epoch checkpoint dir to resume from "
                        "(<run_dir>/<epoch>)")
    p.add_argument("--save_model", action="store_true",
                   help="save per-epoch + best-metric checkpoints under "
                        "the run dir (reference saves unconditionally, "
                        "fused.py:698-766)")
    p.add_argument("--testing", action="store_true")
    p.add_argument("--group", default=None, type=str)
    p.add_argument("--moo", default="sum", choices=["sum", "moco"])
    # SSL config of record (fused.py:626-630, benchmark.py:53-70)
    p.add_argument("--batch_size", default=200, type=int)
    p.add_argument("--lr", default=2e-4, type=float)
    p.add_argument("--eps", default=1e-8, type=float)
    p.add_argument("--weight_decay", default=1e-3, type=float)
    p.add_argument("--epochs", default=50, type=int)
    p.add_argument("--channels", default=128, type=int)
    p.add_argument("--num_layers", default=3, type=int)
    p.add_argument("--dropout", default=0.5, type=float)
    p.add_argument("--num_neg_samples", default=64, type=int)
    p.add_argument("--khop_neighbors", nargs="+", type=int,
                   default=[100, 100])
    p.add_argument("--split_type", default="temporal_daily", type=str)
    p.add_argument("--splits", nargs="+", type=float,
                   default=[0.6, 0.2, 0.2])
    p.add_argument("--reverse_mp", action="store_true")
    p.add_argument("--ego", action="store_true")
    p.add_argument("--ports", action="store_true")
    p.add_argument("--edge_capacity", default=0, type=int,
                   help="0 = auto-calibrate")
    p.add_argument("--node_capacity", default=0, type=int,
                   help="0 = auto-calibrate")
    p.add_argument("--wandb_dir", default="wandb/", type=str)
    p.add_argument("--precision", default="f32", choices=("f32", "bf16"))
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over the fused layer stack (smaller "
                        "compiled program; stacked param layout)")
    p.add_argument("--dp", default=0, type=int,
                   help="data-parallel over N devices (0 = single chip)")
    p.add_argument("--frontier_capacity", default=0, type=int,
                   help="device-sampler inter-hop frontier buffer "
                        "(0 = auto-calibrate)")
    p.add_argument("--sampler", default="auto",
                   choices=("auto", "host", "device"),
                   help="where k-hop sampling runs (device = in-jit)")
    p.add_argument("--steps_per_dispatch", default=1, type=int,
                   help=">1: lax.scan K pretrain steps per dispatch")
    p.add_argument("--sampler_threads", default=1, type=int)
    p.add_argument("--inflight_groups", default=2, type=int)
    return p


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    from ..parallel.distributed import maybe_init_distributed
    maybe_init_distributed()
    args = build_parser().parse_args(argv)
    logger_setup()
    cfg = Config(
        model="tabgnnfused", data=args.dataset, batch_size=args.batch_size,
        lr=args.lr, adam_eps=args.eps, weight_decay=args.weight_decay,
        epochs=args.epochs, n_hidden=args.channels,
        n_gnn_layers=args.num_layers, dropout=args.dropout,
        num_neg_samples=args.num_neg_samples,
        num_neighs=tuple(args.khop_neighbors), split_type=args.split_type,
        splits=tuple(args.splits), reverse_mp=args.reverse_mp, ego=args.ego,
        ports=args.ports, edge_capacity=args.edge_capacity,
        node_capacity=args.node_capacity, moo=args.moo,
        testing=args.testing, wandb_dir=args.wandb_dir,
        precision=args.precision, scan_layers=args.scan_layers,
        frontier_capacity=args.frontier_capacity, sampler=args.sampler,
        steps_per_dispatch=args.steps_per_dispatch,
        sampler_threads=args.sampler_threads,
        inflight_groups=args.inflight_groups,
    )
    logging.info(cfg.to_json())
    pretrain = {PretrainType.LINK_PRED}
    if "mcm" in args.mode:
        pretrain.add(PretrainType.MASK)
    # dataset dispatch by path, as the reference's get_dataset
    # (``fused.py:498-516``): "eth" → EthereumPhishingTransactions, else IBM
    if "eth" in cfg.data.lower():
        from ..datasets.eth_phishing import EthereumPhishing

        dataset = EthereumPhishing(
            root=cfg.data, pretrain=pretrain, split_type=cfg.split_type,
            splits=cfg.splits, khop_neighbors=cfg.num_neighs,
            ports=cfg.ports, ego=cfg.ego, channels=cfg.n_hidden,
            edge_capacity=cfg.edge_capacity,
            node_capacity=cfg.node_capacity)
    else:
        dataset = IBMTransactionsAML(
            root=cfg.data, pretrain=pretrain, split_type=cfg.split_type,
            splits=cfg.splits, khop_neighbors=cfg.num_neighs,
            ports=cfg.ports, ego=cfg.ego, channels=cfg.n_hidden,
            edge_capacity=cfg.edge_capacity,
            node_capacity=cfg.node_capacity)
    if args.dp:
        from ..utils.jaxenv import ensure_devices
        from ..train.dp_trainer import DataParallelPretrainTrainer

        ensure_devices(args.dp)
        trainer = DataParallelPretrainTrainer(cfg, dataset, mode=args.mode,
                                              n_devices=args.dp)
    else:
        trainer = PretrainTrainer(cfg, dataset, mode=args.mode)

    start_epoch, best = 0, None
    if args.checkpoint:
        from ..utils.checkpoint import parse_checkpoint_path

        _, start_epoch = parse_checkpoint_path(args.checkpoint)
        start_epoch += 1
        best = trainer.restore(args.checkpoint)
        logging.info(f"Resumed from {args.checkpoint} "
                     f"(next epoch {start_epoch}, best {best})")
    run_dir = os.path.join(cfg.wandb_dir, f"run_{args.run_name}")
    rl = RunLogger(run_dir, config=__import__("json").loads(cfg.to_json()),
                   use_wandb=not cfg.testing, group=args.group)
    ckpt_dir = run_dir if (args.save_model or args.checkpoint) else None
    history, best = trainer.fit(rl, ckpt_dir, start_epoch, best)
    rl.close()
    logging.info(f"best: {best}")
    return history, best


if __name__ == "__main__":
    main()
