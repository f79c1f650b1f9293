"""Data-parallel trainer: the unified Trainer over a device mesh.

Extends :class:`~rmm_tpu.train.trainer.Trainer` so multi-chip training is a
drop-in (``--dp`` on the CLI): each step samples one subgraph minibatch per
chip, stacks them, and runs the shard_map DP step (grads + batch-stats
pmean over ICI, :mod:`rmm_tpu.parallel.data_parallel`). Evaluation runs
single-chip (replicated params).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..parallel import (
    Prefetcher,
    make_dp_train_step,
    make_mesh,
    shard_batch,
    stack_batches,
)
from ..utils.config import Config
from ..utils.metric import f1_score
from .trainer import Trainer


class DataParallelTrainer(Trainer):
    def __init__(self, cfg: Config, dataset, n_devices: Optional[int] = None,
                 **kw):
        super().__init__(cfg, dataset, **kw)
        self.mesh = make_mesh(n_devices)
        self.n_chips = int(self.mesh.devices.size)
        self._dp_step = make_dp_train_step(self.model, self.tx,
                                           self._loss_from_pred, self.mesh)

    def train_epoch(self, view, epoch: int) -> dict:
        cfg = self.cfg
        t0 = time.time()
        D = self.n_chips
        losses, aux_list, seed_masks = [], [], []
        pending = []

        def flush():
            if not pending:
                return
            while len(pending) < D:  # pad final group with repeats
                pending.append(pending[-1])
            stacked = shard_batch(self.mesh, stack_batches(pending))
            self.rng, k = jax.random.split(self.rng)
            rngs = jax.random.split(k, D)
            (self.variables, self.opt_state, loss, aux) = self._dp_step(
                self.variables, self.opt_state, stacked, rngs,
                self.edge_table, self.node_table)
            losses.append(loss)
            aux_list.append(aux)
            seed_masks.append(
                np.stack([g.seed_mask for g in pending]).reshape(-1))
            pending.clear()

        for gb in Prefetcher(self._batches(view, "train"), depth=2 * D,
                             device_put=False):
            pending.append(gb)
            if len(pending) == D:
                flush()
        flush()

        total_loss = float(np.mean([float(l) for l in losses]))
        preds, labels = [], []
        mcm = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        for aux, mask in zip(aux_list, seed_masks):
            if "mcm" in cfg.task:
                for k2 in mcm:
                    mcm[k2] += float(np.asarray(aux[k2]).sum())
            else:
                m = np.asarray(mask).reshape(-1)
                preds.append(np.asarray(aux["pred_cls"]).reshape(-1)[m])
                labels.append(np.asarray(aux["labels"]).reshape(-1)[m])
        out = {"loss": total_loss, "sec": time.time() - t0,
               "chips": self.n_chips}
        if "mcm" in cfg.task:
            out["train_rmse"] = float(
                np.sqrt(mcm["loss_n"] / max(mcm["t_n"], 1)))
            out["train_acc"] = mcm["acc"] / max(mcm["t_c"], 1)
        else:
            avg = "binary" if cfg.n_classes == 2 else "weighted"
            out["f1"] = f1_score(np.concatenate(labels),
                                 np.concatenate(preds), avg)
        return out
