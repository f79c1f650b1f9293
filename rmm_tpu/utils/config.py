"""Unified typed configuration.

The reference mixes three flag systems — argparse (``utils.py:32-61``),
``fire`` keyword CLIs (``fused.py:626-655``) and wandb sweep dicts — plus
hardcoded post-parse overrides (``main.py:161-190,229-233``). This single
dataclass covers that whole surface; every documented flag keeps its name.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional, Sequence


@dataclasses.dataclass
class Config:
    # model
    model: str = "fttransformer"      # gin|pna|cpna|cpnatab|tabgnn|
    #                                   tabgnninterleaved|tabgnnfused|
    #                                   fttransformer
    n_hidden: int = 32
    n_gnn_layers: int = 2
    emlps: bool = False
    reverse_mp: bool = False
    ego: bool = False
    ports: bool = False
    dropout: float = 0.083            # main.py:184 (AML config of record)
    nhead: int = 8

    # task / data
    data: str = ""
    task: str = "edge_classification"
    n_classes: int = 2
    pretrain: Sequence[str] = ()      # subset of {mask, mv, lp}
    split_type: str = "temporal_daily"
    splits: Sequence[float] = (0.6, 0.2, 0.2)
    num_neighs: Sequence[int] = (100, 100)
    edge_capacity: int = 0            # 0 = auto-calibrate from probe batches
    node_capacity: int = 0
    frontier_capacity: int = 0        # device sampler's inter-hop frontier
                                      # buffer (0 = auto-calibrate; the
                                      # distinct hop-1 neighbor set is ~10x
                                      # smaller than node_capacity, and
                                      # hop-2's [frontier, fanout] expansion
                                      # dominates in-jit sampling cost)
    max_drop_rate: float = 0.0        # warn when epoch drop-rate exceeds this

    # optimization (AML supervised config of record, main.py:161-190)
    lr: float = 0.0006116418195373612
    epochs: int = 100
    batch_size: int = 200
    w_ce1: float = 1.0
    w_ce2: float = 9.23
    # SSL config of record (fused.py:626-630)
    weight_decay: float = 1e-3
    adam_eps: float = 1e-8
    num_neg_samples: int = 64
    moo: str = "sum"                  # sum | moco

    # misc
    steps_per_dispatch: int = 1   # >1: lax.scan K train steps per dispatch
    sampler_threads: int = 1      # >1: thread-pool host sampling
    inflight_groups: int = 2      # bounded async dispatch window (groups
                                  # queued on device before the host blocks;
                                  # unbounded queueing degrades badly over
                                  # remote/tunneled device transports)
    sampler: str = "auto"         # auto | host | device — where k-hop
                                  # sampling runs. "device" = in-jit on the
                                  # accelerator (HBM-resident CSR, host
                                  # ships seed ids only; composes with
                                  # --dp). "auto" currently resolves to the
                                  # overlapped host (C++) sampler; the
                                  # round-3 frontier_capacity cut device
                                  # sampling ~8x (RESULTS.md) but the flip
                                  # to device-by-default awaits an on-chip
                                  # A/B (see use_device_sampler)

    ckpt_backend: str = "msgpack"  # msgpack (flax files) | orbax (async
                                   # directory components; same layout and
                                   # load paths — backends interoperate)

    scan_layers: bool = False     # lax.scan over the fused GNN layer stack
                                  # (stacked params, ONE traced layer body)
                                  # instead of Python-unrolled layers —
                                  # shrinks the train-step program ~linearly
                                  # in n_gnn_layers; required to fit the
                                  # C=128/3-layer SSL step through
                                  # memory-bounded AOT compile services

    precision: str = "f32"        # f32 | bf16 — bf16 keeps f32 master
                                  # params and casts params + feature
                                  # tables + activations to bfloat16 for
                                  # the forward/backward (MXU-native);
                                  # losses/metrics stay f32

    seed: int = 1
    testing: bool = False
    tqdm: bool = False
    save_model: bool = False
    load_model: Optional[str] = None
    checkpoint: bool = False
    freeze: bool = False
    output_path: str = "outputs/"
    wandb_dir: str = "wandb/"
    group: str = "null"
    log_every: int = 50

    @property
    def loss_weights(self) -> list[float]:
        if self.n_classes == 2:
            return [self.w_ce1, self.w_ce2]
        return [1.0] * self.n_classes

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), default=str)


def create_parser() -> argparse.ArgumentParser:
    """CLI surface mirroring the reference parser (``utils.py:32-61``)."""
    p = argparse.ArgumentParser()
    p.add_argument("--emlps", action="store_true")
    p.add_argument("--reverse_mp", action="store_true")
    p.add_argument("--ego", action="store_true")
    p.add_argument("--ports", action="store_true")
    p.add_argument("--batch_size", default=200, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--num_neighs", nargs="+", type=int, default=[100, 100])
    p.add_argument("--n_hidden", default=32, type=int)
    p.add_argument("--n_gnn_layers", default=2, type=int)
    p.add_argument("--model", default=None, type=str, required=True)
    p.add_argument("--freeze", action="store_true")
    p.add_argument("--seed", default=1, type=int)
    p.add_argument("--tqdm", action="store_true")
    p.add_argument("--data", default=None, type=str, required=True)
    p.add_argument("--output_path", default="outputs/", type=str)
    p.add_argument("--testing", action="store_true")
    p.add_argument("--save_model", action="store_true")
    p.add_argument("--load_model", default=None, type=str)
    p.add_argument("--checkpoint", action="store_true")
    p.add_argument("--wandb_dir", default="wandb/", type=str)
    p.add_argument("--group", default="null", type=str)
    p.add_argument("--task", default="edge_classification", type=str)
    p.add_argument("--edge_capacity", default=0, type=int,
                   help="static subgraph edge buffer (0 = auto-calibrate)")
    p.add_argument("--node_capacity", default=0, type=int,
                   help="static subgraph node buffer (0 = auto-calibrate)")
    p.add_argument("--frontier_capacity", default=0, type=int,
                   help="device-sampler inter-hop frontier buffer "
                        "(0 = auto-calibrate)")
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--dropout", default=None, type=float)
    p.add_argument("--dp", default=0, type=int,
                   help="data-parallel over N devices (0 = single chip)")
    p.add_argument("--steps_per_dispatch", default=1, type=int)
    p.add_argument("--sampler_threads", default=1, type=int)
    p.add_argument("--inflight_groups", default=2, type=int,
                   help="max dispatched step-groups before host sync")
    p.add_argument("--sampler", default="auto",
                   choices=("auto", "host", "device"),
                   help="where k-hop sampling runs (device = in-jit)")
    p.add_argument("--precision", default="f32", choices=("f32", "bf16"),
                   help="bf16 = mixed precision (f32 master params, "
                        "bf16 activations/matmuls)")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over the fused layer stack (smaller "
                        "compiled program; stacked param layout)")
    p.add_argument("--ckpt_backend", default="msgpack",
                   choices=("msgpack", "orbax"),
                   help="checkpoint serialization: flax msgpack files or "
                        "orbax async directory components")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = Config(
        model=args.model, data=args.data, task=args.task,
        batch_size=args.batch_size, epochs=args.epochs,
        num_neighs=tuple(args.num_neighs), n_hidden=args.n_hidden,
        n_gnn_layers=args.n_gnn_layers, emlps=args.emlps,
        reverse_mp=args.reverse_mp, ego=args.ego, ports=args.ports,
        seed=args.seed, tqdm=args.tqdm, testing=args.testing,
        save_model=args.save_model, load_model=args.load_model,
        checkpoint=args.checkpoint, freeze=args.freeze,
        output_path=args.output_path, wandb_dir=args.wandb_dir,
        group=args.group, edge_capacity=args.edge_capacity,
        node_capacity=args.node_capacity,
        frontier_capacity=getattr(args, "frontier_capacity", 0),
    )
    if args.lr is not None:
        cfg = cfg.replace(lr=args.lr)
    if getattr(args, "steps_per_dispatch", 1) != 1:
        cfg = cfg.replace(steps_per_dispatch=args.steps_per_dispatch)
    if getattr(args, "sampler_threads", 1) != 1:
        cfg = cfg.replace(sampler_threads=args.sampler_threads)
    if getattr(args, "inflight_groups", 2) != 2:
        cfg = cfg.replace(inflight_groups=args.inflight_groups)
    if getattr(args, "sampler", "auto") != "auto":
        cfg = cfg.replace(sampler=args.sampler)
    if getattr(args, "precision", "f32") != "f32":
        cfg = cfg.replace(precision=args.precision)
    if getattr(args, "scan_layers", False):
        cfg = cfg.replace(scan_layers=True)
    if getattr(args, "ckpt_backend", "msgpack") != "msgpack":
        cfg = cfg.replace(ckpt_backend=args.ckpt_backend)
    if args.dropout is not None:
        cfg = cfg.replace(dropout=args.dropout)
    # dataset-specific hardcoded overrides of record (main.py:218-265)
    if "ethereum-phishing" in cfg.data:
        cfg = cfg.replace(lr=0.0008, dropout=0.123, w_ce2=1.16,
                          n_gnn_layers=2)
    elif "elliptic" in cfg.data:
        cfg = cfg.replace(task="node_classification")
    elif "ogbn_arxiv" in cfg.data or "ogbn-arxiv" in cfg.data:
        cfg = cfg.replace(task="node_classification", n_classes=40)
    return cfg
