"""Profiling harness — the ``benchmark.py`` of the reference, TPU-native.

The reference wraps its train loops in ``torch.profiler`` with named phases
(pre-processing / cpu-to-gpu / forward / copy-back / backward,
``benchmark.py:684-744``) and separate manual wall-clock timers
(``trainf``, ``benchmark.py:869-951``), hard-stopping after 10 (profiler) /
100 (timer) iterations. Here:

  * ``--timers`` (default): per-phase wall-clock means over N iterations —
    phase names kept: pre-processing (host sampling + batch assembly),
    cpu-to-device (device_put), forward (jitted fwd+loss), train-step
    (fwd+bwd+optimizer, fused), copy-back (metrics → host);
  * ``--profile``: additionally wraps the measured iterations in
    ``jax.profiler.trace`` and exports a TensorBoard/perfetto trace dir
    (the chrome-trace analogue, ``benchmark.py:743``).

Usage:
    python -m rmm_tpu.cli.benchmark --data <csv> --model tabgnn \
        --iters 100 --profile --trace_dir /tmp/trace
"""
from __future__ import annotations

import json
import logging
import time

import jax
import numpy as np

from ..datasets import build_dataset
from ..utils.config import config_from_args, create_parser
from ..utils.logging import logger_setup
from ..train.trainer import Trainer


def run_benchmark(cfg, iters: int = 100, profile: bool = False,
                  trace_dir: str = "/tmp/rmm_trace"):
    dataset = build_dataset(cfg)
    if hasattr(dataset, "n_classes"):
        cfg = cfg.replace(n_classes=dataset.n_classes)
    trainer = Trainer(cfg, dataset)
    tr, _, _ = (dataset.nodes.split() if "node" in cfg.task
                else dataset.edges.split())

    phases = {k: [] for k in ("pre-processing", "cpu-to-device", "forward",
                              "train-step", "copy-back")}

    def one_iter(gb_iter, rng):
        t0 = time.perf_counter()
        try:
            gb = next(gb_iter)
        except StopIteration:
            return None
        phases["pre-processing"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        gb = jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if x is not None else None, gb)
        jax.block_until_ready(gb.edge_gather)
        phases["cpu-to-device"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        loss, aux = trainer._eval_step(trainer.variables, gb,
                                       trainer.edge_table,
                                       trainer.node_table)
        jax.block_until_ready(loss)
        phases["forward"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        out = trainer._train_step(trainer.variables, trainer.opt_state, gb,
                                  rng, trainer.edge_table,
                                  trainer.node_table)
        jax.block_until_ready(out[2])
        phases["train-step"].append(time.perf_counter() - t0)
        trainer.variables, trainer.opt_state = out[0], out[1]

        t0 = time.perf_counter()
        _ = np.asarray(out[2])
        _ = {k: np.asarray(v) for k, v in out[3].items()}
        phases["copy-back"].append(time.perf_counter() - t0)
        return True

    # warmup (compile)
    gb_iter = iter(trainer._batches(tr, "train"))
    rng = jax.random.PRNGKey(0)
    one_iter(gb_iter, rng)
    for v in phases.values():
        v.clear()

    def measure(n):
        it = iter(trainer._batches(tr, "train"))
        done = 0
        while done < n:
            rng2 = jax.random.fold_in(rng, done)
            if one_iter(it, rng2) is None:
                it = iter(trainer._batches(tr, "train"))
                continue
            done += 1

    if profile:
        with jax.profiler.trace(trace_dir):
            measure(min(iters, 10))  # profiler hard-stop at 10 iters
        logging.info(f"trace exported to {trace_dir}")
    measure(iters)

    table = {}
    for k, v in phases.items():
        arr = np.asarray(v)
        table[k] = {"mean_ms": float(arr.mean() * 1e3),
                    "p50_ms": float(np.median(arr) * 1e3),
                    "total_s": float(arr.sum())}
    rows_per_sec = cfg.batch_size / np.mean(phases["train-step"])
    summary = {"iters": iters, "batch_size": cfg.batch_size,
               "train_rows_per_sec": float(rows_per_sec), "phases": table}
    logging.info(json.dumps(summary, indent=2))
    return summary


def run_pretrain_benchmark(cfg, mode: str = "mcm-lp", iters: int = 100):
    """Profile the joint SSL loop (the reference's profiled ``train_mcm`` /
    joint ``train``, ``benchmark.py:153-182,676-744``)."""
    from ..datasets import IBMTransactionsAML
    from ..datasets.base import PretrainType
    from ..train.pretrain import PretrainTrainer

    pretrain = {PretrainType.LINK_PRED}
    if "mcm" in mode:
        pretrain.add(PretrainType.MASK)
    dataset = IBMTransactionsAML(
        root=cfg.data, pretrain=pretrain, khop_neighbors=cfg.num_neighs,
        channels=cfg.n_hidden, edge_capacity=cfg.edge_capacity,
        node_capacity=cfg.node_capacity)
    trainer = PretrainTrainer(cfg, dataset, mode=mode)
    tr, _, _ = dataset.edges.split()

    phases = {"pre-processing": [], "train-step": []}
    it = iter(trainer._batches(tr, "train"))
    rng = jax.random.PRNGKey(0)
    # warmup/compile
    gb = next(it)
    out = trainer._train_step(trainer.params, trainer.batch_stats,
                              trainer.opt_state, trainer.moco_state, gb, rng,
                              trainer.edge_table)
    jax.block_until_ready(out[4])
    done = 0
    while done < iters:
        t0 = time.perf_counter()
        try:
            gb = next(it)
        except StopIteration:
            it = iter(trainer._batches(tr, "train"))
            continue
        phases["pre-processing"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = trainer._train_step(out[0], out[1], out[2], out[3], gb,
                                  jax.random.fold_in(rng, done),
                                  trainer.edge_table)
        jax.block_until_ready(out[4])
        phases["train-step"].append(time.perf_counter() - t0)
        done += 1
    table = {k: {"mean_ms": float(np.mean(v) * 1e3),
                 "p50_ms": float(np.median(v) * 1e3)}
             for k, v in phases.items()}
    summary = {"loop": f"pretrain:{mode}", "iters": iters,
               "batch_size": cfg.batch_size,
               "rows_per_sec": cfg.batch_size / np.mean(
                   phases["train-step"]),
               "phases": table}
    logging.info(json.dumps(summary, indent=2))
    return summary


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    parser = create_parser()
    parser.add_argument("--iters", default=100, type=int)
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--trace_dir", default="/tmp/rmm_trace", type=str)
    parser.add_argument("--loop", default="supervised",
                        choices=["supervised", "mcm", "lp", "mcm-lp"])
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    logger_setup()
    if args.loop != "supervised":
        return run_pretrain_benchmark(cfg, mode=args.loop, iters=args.iters)
    return run_benchmark(cfg, iters=args.iters, profile=args.profile,
                         trace_dir=args.trace_dir)


if __name__ == "__main__":
    main()
