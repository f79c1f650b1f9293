"""Data-parallel trainer: the unified Trainer over a device mesh.

Extends :class:`~rmm_tpu.train.trainer.Trainer` so multi-chip training is a
drop-in (``--dp`` on the CLI): each step samples one subgraph minibatch per
chip, stacks them, and runs the shard_map DP step (grads + batch-stats
averaged over REAL chips via ICI collectives,
:mod:`rmm_tpu.parallel.data_parallel`). The ragged final group is padded
with repeated batches whose seed_masks are zeroed and whose gradients are
excluded from the reduction (``real`` flags), so epoch-end duplicates get
zero weight — matching the single-chip scan path. Evaluation is also
data-parallel (one forward per chip per group).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from ..parallel import (
    Prefetcher,
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    shard_batch,
    stack_batches,
)
from ..utils.config import Config
from ..utils.metric import f1_score, roc_auc
from .pretrain import PretrainTrainer
from .trainer import Trainer


def _zero_mask_copy(gb):
    """Padding batch: same arrays, but no real seed rows (masks both the
    loss and the epoch metrics)."""
    return dataclasses.replace(gb, seed_mask=np.zeros_like(gb.seed_mask))


class DataParallelTrainer(Trainer):
    def __init__(self, cfg: Config, dataset, n_devices: Optional[int] = None,
                 **kw):
        super().__init__(cfg, dataset, **kw)
        self.mesh = make_mesh(n_devices)
        self.n_chips = int(self.mesh.devices.size)
        self._dp_step = make_dp_train_step(self.model, self.tx,
                                           self._loss_from_pred, self.mesh)
        self._dp_eval = make_dp_eval_step(self.model, self._loss_from_pred,
                                          self.mesh)
        if self._use_device_sampler():
            from ..parallel import make_dp_device_train_step

            # --dp --sampler device: each chip ships only its SeedBatch;
            # the k-hop subgraph materializes on-device inside the SPMD
            # program — per-chip sampling scales with the mesh and the
            # host stays out of the hot loop entirely
            self._dp_dev_step = make_dp_device_train_step(
                self.model, self.tx, self._loss_from_pred,
                self._materialize_dev, self.mesh)

    def _pad_group(self, pending):
        """Pad a ragged group to D with zero-masked repeats; returns the
        real-flag vector."""
        n_real = len(pending)
        real = np.arange(self.n_chips) < n_real
        while len(pending) < self.n_chips:
            pending.append(_zero_mask_copy(pending[-1]))
        return real

    def _train_epoch_device(self, view, epoch: int) -> dict:
        """DP over in-jit device-sampled subgraphs (seeds-only host
        traffic). No per-step aux comes back (losses + truncation
        telemetry only); quality metrics come from evaluation."""
        t0 = time.time()
        D = self.n_chips
        dgraph = self._dgraph("train")
        losses = []
        dropped = kept = 0
        pending = []
        window = max(int(getattr(self.cfg, "inflight_groups", 2)), 1)
        inflight = []
        drops = []

        def flush():
            nonlocal pending
            if not pending:
                return
            n_real = len(pending)
            real = np.arange(D) < n_real
            while len(pending) < D:
                pending.append(_zero_mask_copy(pending[-1]))
            stacked = shard_batch(self.mesh, stack_batches(pending))
            self.rng, k = jax.random.split(self.rng)
            rngs = jax.random.split(k, D)
            (self.variables, self.opt_state, loss, b_drop,
             b_kept) = self._dp_dev_step(
                self.variables, self.opt_state, stacked, rngs, real,
                self.edge_table, self.node_table, dgraph)
            losses.append(loss)
            drops.append((b_drop[:n_real], b_kept[:n_real]))
            pending = []
            inflight.append(loss)
            if len(inflight) > window:
                jax.device_get(inflight.pop(0))

        for sb in Prefetcher(self._seed_batches(view, "train", epoch),
                             depth=2 * D, device_put=False):
            pending.append(sb)
            if len(pending) == D:
                flush()
        flush()
        for b_drop, b_kept in drops:
            dropped += int(np.asarray(b_drop).sum())
            kept += int(np.asarray(b_kept).sum())
        return {"loss": float(np.mean([float(l) for l in losses])),
                "sec": time.time() - t0, "chips": self.n_chips,
                "drop_rate": dropped / max(dropped + kept, 1)}

    def train_epoch(self, view, epoch: int) -> dict:
        if self._use_device_sampler():
            return self._train_epoch_device(view, epoch)
        cfg = self.cfg
        t0 = time.time()
        D = self.n_chips
        losses, aux_list, seed_masks = [], [], []
        dropped = kept = 0
        pending = []
        # bounded async dispatch window (see Trainer.train_epoch)
        window = max(int(getattr(cfg, "inflight_groups", 2)), 1)
        inflight = []

        def flush():
            if not pending:
                return
            real = self._pad_group(pending)
            stacked = shard_batch(self.mesh, stack_batches(pending))
            self.rng, k = jax.random.split(self.rng)
            rngs = jax.random.split(k, D)
            (self.variables, self.opt_state, loss, aux) = self._dp_step(
                self.variables, self.opt_state, stacked, rngs, real,
                self.edge_table, self.node_table)
            losses.append(loss)
            aux_list.append(aux)
            seed_masks.append(
                np.stack([g.seed_mask for g in pending]).reshape(-1))
            pending.clear()
            inflight.append(losses[-1])
            if len(inflight) > window:
                # device_get of the (tiny) loss, not block_until_ready: over
                # the tunneled transport block_until_ready can return before
                # the work executes (RESULTS.md round-2 correction), which
                # would defeat the queue bound
                jax.device_get(inflight.pop(0))

        for gb in Prefetcher(self._batches(view, "train", epoch),
                             depth=2 * D, device_put=False):
            dropped += gb.num_dropped
            kept += int(gb.edge_mask.sum())
            pending.append(gb)
            if len(pending) == D:
                flush()
        flush()

        total_loss = float(np.mean([float(l) for l in losses]))
        preds, labels, scores = [], [], []
        mcm = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        for aux, mask in zip(aux_list, seed_masks):
            if "mcm" in cfg.task:
                for k2 in mcm:
                    mcm[k2] += float(np.asarray(aux[k2]).sum())
            else:
                m = np.asarray(mask).reshape(-1)
                preds.append(np.asarray(aux["pred_cls"]).reshape(-1)[m])
                labels.append(np.asarray(aux["labels"]).reshape(-1)[m])
                if "score" in aux:
                    scores.append(np.asarray(aux["score"]).reshape(-1)[m])
        out = {"loss": total_loss, "sec": time.time() - t0,
               "chips": self.n_chips,
               "drop_rate": dropped / max(dropped + kept, 1)}
        if "mcm" in cfg.task:
            out["train_rmse"] = float(
                np.sqrt(mcm["loss_n"] / max(mcm["t_n"], 1)))
            out["train_acc"] = mcm["acc"] / max(mcm["t_c"], 1)
        else:
            avg = "binary" if cfg.n_classes == 2 else "weighted"
            out["f1"] = f1_score(np.concatenate(labels),
                                 np.concatenate(preds), avg)
            if scores:
                out["auc"] = roc_auc(np.concatenate(labels),
                                     np.concatenate(scores))
        return out

    def evaluate(self, view, mode: str):
        """Data-parallel evaluation: D forwards per dispatch; padded chips
        contribute nothing (zeroed seed_mask filters them out of both MCM
        counts and the pred/label gather)."""
        cfg = self.cfg
        preds, labels, scores = [], [], []
        mcm = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        results = []
        pending = []

        def flush():
            if not pending:
                return
            self._pad_group(pending)
            stacked = shard_batch(self.mesh, stack_batches(pending))
            _, aux = self._dp_eval(self.variables, stacked,
                                   self.edge_table, self.node_table)
            results.append(
                (aux, np.stack([g.seed_mask for g in pending]).reshape(-1)))
            pending.clear()

        for gb in self._batches(view, mode):
            pending.append(gb)
            if len(pending) == self.n_chips:
                flush()
        flush()

        for aux, mask in results:
            if "mcm" in cfg.task:
                for k in mcm:
                    mcm[k] += float(np.asarray(aux[k]).sum())
            else:
                m = np.asarray(mask).reshape(-1)
                preds.append(np.asarray(aux["pred_cls"]).reshape(-1)[m])
                labels.append(np.asarray(aux["labels"]).reshape(-1)[m])
                if "score" in aux:
                    scores.append(np.asarray(aux["score"]).reshape(-1)[m])
        if "mcm" in cfg.task:
            return [float(np.sqrt(mcm["loss_n"] / max(mcm["t_n"], 1))),
                    mcm["acc"] / max(mcm["t_c"], 1)]
        avg = "binary" if cfg.n_classes == 2 else "weighted"
        out = {"f1": f1_score(np.concatenate(labels), np.concatenate(preds),
                              avg)}
        if scores:
            out["auc"] = roc_auc(np.concatenate(labels),
                                 np.concatenate(scores))
        return out


class DataParallelPretrainTrainer(PretrainTrainer):
    """Data-parallel joint SSL pretraining (``--dp`` on ``cli/fused.py``):
    D host-sampled subgraph batches per dispatch, each chip running BOTH
    model views (LP + MCM) on its own batch, grads/losses/batch-stats
    real-weighted ``psum``s over ICI (:func:`make_dp_pretrain_step`).
    Checkpointing, best-metric export and resume are inherited from
    :class:`PretrainTrainer.fit`; evaluation runs single-chip (the eval
    MRR pass is a forward only and is not the bottleneck).

    ``--moo moco`` composes with DP: per-task gradients are psum-averaged
    over real chips before the (replicated) MoCo state update, so every
    chip applies the identical λ-weighted combine."""

    def __init__(self, cfg: Config, dataset, mode: str = "mcm-lp",
                 n_devices: Optional[int] = None):
        super().__init__(cfg, dataset, mode=mode)
        from ..parallel import make_dp_device_pretrain_step, make_dp_pretrain_step

        self.mesh = make_mesh(n_devices)
        self.n_chips = int(self.mesh.devices.size)
        self._dp_pre_step = make_dp_pretrain_step(self.pm, self.tx,
                                                  self.mesh, mode,
                                                  moo=cfg.moo)
        if self._use_device_sampler():
            # --dp --sampler device: subgraphs AND negatives materialize
            # on-device per chip (zero-host-traffic joint MCM+LP loop)
            self._dp_dev_pre_step = make_dp_device_pretrain_step(
                self.pm, self.tx, self._materialize_dev, self.mesh, mode,
                moo=cfg.moo)

    def train_epoch(self, view, epoch: int) -> dict:
        t0 = time.time()
        D = self.n_chips
        use_dev = self._use_device_sampler()
        dgraph = self._dgraph("train") if use_dev else None
        losses, drops = [], []
        dropped = kept = 0
        pending = []
        window = max(int(getattr(self.cfg, "inflight_groups", 2)), 1)
        inflight = []

        def flush():
            if not pending:
                return
            n_real = len(pending)
            real = np.arange(D) < n_real
            while len(pending) < D:
                pending.append(_zero_mask_copy(pending[-1]))
            stacked = shard_batch(self.mesh, stack_batches(pending))
            if use_dev:
                (self.params, self.batch_stats, self.opt_state,
                 self.moco_state, loss, b_drop,
                 b_kept) = self._dp_dev_pre_step(
                    self.params, self.batch_stats, self.opt_state,
                    self.moco_state, stacked, real, self.edge_table,
                    dgraph)
                drops.append((b_drop[:n_real], b_kept[:n_real]))
            else:
                self.rng, k = jax.random.split(self.rng)
                rngs = jax.random.split(k, D)
                (self.params, self.batch_stats, self.opt_state,
                 self.moco_state, loss) = self._dp_pre_step(
                    self.params, self.batch_stats, self.opt_state,
                    self.moco_state, stacked, rngs, real, self.edge_table)
            losses.append(loss)
            pending.clear()
            inflight.append(loss)
            if len(inflight) > window:
                jax.device_get(inflight.pop(0))

        src_iter = (self._seed_batches(view, "train", epoch) if use_dev
                    else self._batches(view, "train", epoch))
        for gb in Prefetcher(src_iter, depth=2 * D, device_put=False):
            if not use_dev:
                dropped += gb.num_dropped
                kept += int(gb.edge_mask.sum())
            pending.append(gb)
            if len(pending) == D:
                flush()
        flush()
        for b_drop, b_kept in drops:
            dropped += int(np.asarray(b_drop).sum())
            kept += int(np.asarray(b_kept).sum())

        return {"loss": float(np.mean([float(l) for l in losses])),
                "sec": time.time() - t0, "chips": self.n_chips,
                "drop_rate": dropped / max(dropped + kept, 1)}
