"""Unified trainer: one fully-jitted train/eval step per task.

Replaces the reference's seven copy-pasted training loops (SURVEY §1 L5)
with one engine. The hot path is a single compiled XLA program per
(task, model): feature gather → encode → backbone → head → loss → grads →
optimizer update, all on device; the host only runs the C++ sampler and
ships id/mask arrays (contrast ``main.py:41-75``, which moves features per
batch and computes the MCM loss on CPU, ``fused.py:289-290``).
"""
from __future__ import annotations

import logging
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..frame.loader import DataLoader
from ..graph.device_sampler import (
    DeviceGraph,
    cached_dgraph,
    sample_edges_device,
    sample_nodes_device,
    use_device_sampler,
)
from ..nn.encoders import make_stypewise_encoder
from ..utils.batch import GraphBatch, SeedBatch
from ..utils.config import Config
from ..utils.loss import SSLoss, cross_entropy
from ..utils.metric import f1_score, roc_auc
from ..utils.seeding import mix_seed
from . import task_models

logger = logging.getLogger(__name__)


def build_task_model(cfg: Config, dataset):
    """Model wrapper factory (reference dispatch at ``main.py:316-333``)."""
    edges, nodes = dataset.edges, dataset.nodes
    node_encoder = make_stypewise_encoder(nodes, cfg.n_hidden)
    edge_encoder = make_stypewise_encoder(edges, cfg.n_hidden)
    avg_log_deg = task_models._deghist_to_avg_log(
        dataset.in_degree_histogram())
    num_edge_cols = edges.tensor_frame.num_cols
    mcm_nn = len(edges.masked_numerical_columns)
    mcm_cat = tuple(edges.masked_categorical_cardinalities()
                    if hasattr(edges, "masked_categorical_cardinalities")
                    else ())
    common = dict(node_encoder=node_encoder, edge_encoder=edge_encoder,
                  n_classes=cfg.n_classes, dropout=cfg.dropout, ego=cfg.ego,
                  task=cfg.task)
    if cfg.model == "fttransformer":
        return task_models.TT(channels=cfg.n_hidden,
                              num_layers=cfg.n_gnn_layers, **common)
    if cfg.model in ("gin", "pna", "cpna", "cpnatab"):
        return task_models.GNNWrap(
            model_name=cfg.model, n_hidden=cfg.n_hidden,
            n_gnn_layers=cfg.n_gnn_layers, num_edge_cols=num_edge_cols,
            avg_log_deg=avg_log_deg, reverse_mp=cfg.reverse_mp,
            emlps=cfg.emlps, mcm_num_numerical=mcm_nn,
            mcm_categorical=mcm_cat, **common)
    if cfg.model in ("tabgnn", "tabgnninterleaved"):
        return task_models.TABGNNS(
            model_name=cfg.model, channels=cfg.n_hidden,
            n_gnn_layers=cfg.n_gnn_layers, avg_log_deg=avg_log_deg,
            reverse_mp=cfg.reverse_mp, mcm_num_numerical=mcm_nn,
            mcm_categorical=mcm_cat, **common)
    if cfg.model == "tabgnnfused":
        return task_models.TABGNNFusedS(
            channels=cfg.n_hidden, n_gnn_layers=cfg.n_gnn_layers,
            avg_log_deg=avg_log_deg, reverse_mp=cfg.reverse_mp,
            mcm_num_numerical=mcm_nn, mcm_categorical=mcm_cat,
            scan_layers=cfg.scan_layers, **common)
    raise ValueError(f"Invalid model name: {cfg.model}")


def resolve_capacities(cfg: Config, dataset) -> Config:
    """Agree on static subgraph capacities between config and dataset.

    Explicit cfg values win; otherwise the dataset's (possibly
    auto-calibrated) capacities are adopted — the trainer needs them up
    front to shape the dummy batch the train step compiles against."""
    if cfg.edge_capacity > 0 and cfg.node_capacity > 0:
        dataset.edge_capacity = cfg.edge_capacity
        dataset.node_capacity = cfg.node_capacity
        if cfg.frontier_capacity > 0:
            dataset.frontier_capacity = cfg.frontier_capacity
        return cfg
    if dataset.edge_capacity <= 0 or dataset.node_capacity <= 0:
        ec, nc = dataset.calibrate_capacities(cfg.batch_size)
        logger.info("auto-calibrated capacities: edge=%d node=%d "
                    "frontier=%d", ec, nc,
                    getattr(dataset, "frontier_capacity", 0))
    if cfg.edge_capacity > 0:      # keep a partial explicit override
        dataset.edge_capacity = cfg.edge_capacity
    if cfg.node_capacity > 0:
        dataset.node_capacity = cfg.node_capacity
    if cfg.frontier_capacity > 0:
        dataset.frontier_capacity = cfg.frontier_capacity
    return cfg.replace(
        edge_capacity=dataset.edge_capacity,
        node_capacity=dataset.node_capacity,
        frontier_capacity=getattr(dataset, "frontier_capacity", 0))


class Trainer:
    """Supervised / MCM trainer over graph datasets (the ``main.py`` path)."""

    def __init__(self, cfg: Config, dataset, freeze_tabular: bool = False):
        cfg = resolve_capacities(cfg, dataset)
        self.cfg = cfg
        self.dataset = dataset
        self.model = build_task_model(cfg, dataset)
        self.ssloss = SSLoss(len(dataset.edges.masked_numerical_columns))

        # device-resident tables (features gathered in-jit)
        self.edge_table = jax.device_put(
            task_models.gather_rows(
                dataset.edges.tensor_frame,
                np.arange(dataset.edges.tensor_frame.num_rows)))
        self.node_table = jax.device_put(
            task_models.gather_rows(
                dataset.nodes.tensor_frame,
                np.arange(dataset.nodes.tensor_frame.num_rows)))

        key = jax.random.PRNGKey(cfg.seed)
        self.rng, init_key = jax.random.split(key)
        dummy = self._dummy_batch()
        init_vars = self.model.init(
            {"params": init_key, "dropout": init_key},
            self.edge_table, self.node_table, dummy, False)
        # normalize: batch_stats always present (possibly empty) so the
        # scan carry structure is stable across models with/without BN
        self.variables = {"params": init_vars["params"],
                          "batch_stats": init_vars.get("batch_stats", {})}

        tx = optax.adam(cfg.lr, eps=cfg.adam_eps)
        if freeze_tabular:
            # freeze the tabular backbone layers (reference --freeze,
            # main.py:347-350)
            def labels(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen" if any(
                        "tab_layer" in str(getattr(k, "key", ""))
                        for k in path) else "train",
                    params)
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, labels)
        self.tx = tx
        self.opt_state = tx.init(self.variables["params"])
        self._train_step = jax.jit(self._step)
        self._eval_step = jax.jit(self._forward_eval)
        self._scan_step = jax.jit(self._multi_step)
        self._scan_eval = jax.jit(self._multi_eval)
        # device-sampling path: k-hop expansion runs IN-JIT from an
        # HBM-resident CSR; the host ships SeedBatches (seed ids only).
        # Sampling is its OWN compiled program (vmapped over the K batches
        # of a dispatch group) feeding the train scan a device-resident
        # stacked GraphBatch — two small programs compile far faster than
        # one fused sampler+model scan, with identical zero-transfer
        # behavior (the subgraphs never leave the device).
        self._sample_one = jax.jit(self._materialize_dev)
        self._sample_group = jax.jit(
            lambda stacked, dgraph: jax.vmap(
                lambda sb: self._materialize_dev(sb, dgraph))(stacked))
        self._dgraphs: dict = {}

    # -- device-side sampling ------------------------------------------
    def _use_device_sampler(self) -> bool:
        return use_device_sampler(self.cfg)

    def _dgraph(self, mode: str) -> DeviceGraph:
        return cached_dgraph(self.dataset.graph, self._dgraphs, mode)

    def _seed_batches(self, view, mode: str, epoch: int = 0):
        """Yield light SeedBatches (edge-seeded tasks, device sampling)."""
        cfg = self.cfg
        loader = DataLoader(view.tensor_frame, cfg.batch_size,
                            shuffle=(mode == "train"),
                            seed=mix_seed(cfg.seed, epoch))
        items = enumerate(loader)
        if mode == "train":
            from ..parallel.distributed import process_info, shard_stream

            pidx, pcount = process_info()
            items = shard_stream(items, pidx, pcount)
        node_task = "node" in cfg.task
        ignore = getattr(self.dataset, "ignore_label", None)
        for i, (tf, valid) in items:
            by = np.asarray(tf.y)
            mask = np.zeros(len(by), bool)
            mask[:valid] = True
            s = np.uint32(mix_seed(cfg.seed, epoch, i) & 0xFFFFFFFF)
            if node_task:
                ids = by[:, 1].astype(np.int32)
                seeds = np.stack([ids, np.zeros_like(ids),
                                  np.zeros_like(ids)], axis=1)
                lmask = mask.copy()
                if ignore is not None:
                    lmask &= by[:, 0] != ignore
                yield SeedBatch(seeds=seeds,
                                y=by[:, :1].astype(np.float32),
                                seed_mask=lmask, sampler_seed=s,
                                sample_mask=mask)
            else:
                yield SeedBatch(
                    seeds=by[:, -3:].astype(np.int32),
                    y=by[:, :-3].astype(np.float32),
                    seed_mask=mask, sampler_seed=s)

    def _materialize_dev(self, sb: SeedBatch, dgraph: DeviceGraph,
                         axis_name=None, n_shards: int = 1):
        """In-jit: sample the k-hop subgraph around the seeds.

        ``axis_name``/``n_shards`` turn on graph-partition mode (the CSR
        edge payload is chunk-sharded over a mesh axis and ``dgraph`` is
        this device's local view — ``graph/sharded_csr.py``)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(sb.sampler_seed)
        if "node" in cfg.task:
            smask = (sb.sample_mask if sb.sample_mask is not None
                     else sb.seed_mask)
            out = sample_nodes_device(
                dgraph, sb.seeds[:, 0], smask, key, cfg.num_neighs,
                cfg.edge_capacity, cfg.node_capacity,
                cfg.frontier_capacity or None,
                axis_name=axis_name, n_shards=n_shards)
        else:
            out = sample_edges_device(
                dgraph, sb.seeds, sb.seed_mask, key, cfg.num_neighs,
                cfg.edge_capacity, cfg.node_capacity,
                cfg.frontier_capacity or None,
                axis_name=axis_name, n_shards=n_shards)
        seed_mask = sb.seed_mask
        if "node" not in cfg.task:
            # node-capacity overflow can evict a seed edge's endpoint,
            # zeroing its edge lane — such seeds must not count in the
            # loss/metrics (edge_mask[:B] ⊆ seed_mask by construction)
            seed_mask = seed_mask & out["edge_mask"][:seed_mask.shape[0]]
        batch = GraphBatch(
            edge_gather=out["edge_gather"], edge_mask=out["edge_mask"],
            edge_index=out["edge_index"], node_gather=out["node_gather"],
            node_mask=out["node_mask"], seed_mask=seed_mask, y=sb.y)
        return batch, out["num_dropped"], out["edge_mask"].sum()


    # ------------------------------------------------------------------
    def _dummy_batch(self) -> GraphBatch:
        cfg = self.cfg
        b = cfg.batch_size
        y_width = (self.dataset.edges.tensor_frame.y.shape[1]
                   if self.dataset.edges.tensor_frame.y is not None else 1)
        return GraphBatch(
            edge_gather=np.zeros(cfg.edge_capacity, np.int32),
            edge_mask=np.zeros(cfg.edge_capacity, bool),
            edge_index=np.zeros((2, cfg.edge_capacity), np.int32),
            node_gather=np.zeros(cfg.node_capacity, np.int32),
            node_mask=np.zeros(cfg.node_capacity, bool),
            seed_mask=np.zeros(b, bool),
            y=np.zeros((b, y_width), np.float32),
        )

    def _loss_from_pred(self, pred, batch: GraphBatch):
        from ..utils.precision import out_f32

        pred = out_f32(pred)   # losses/metrics always f32
        cfg = self.cfg
        if "mcm" in cfg.task:
            num_out, cat_out = pred
            total, (cl, tc, acc), (nl, tn) = self.ssloss.mcm_loss(
                cat_out, num_out, batch.y, valid_mask=batch.seed_mask)
            aux = {"loss_c": cl, "t_c": tc, "acc": acc, "loss_n": nl,
                   "t_n": tn}
            return total, aux
        labels = batch.y[:, 0].astype(jnp.int32)
        loss = cross_entropy(pred, labels,
                             jnp.asarray(cfg.loss_weights), batch.seed_mask)
        aux = {"pred_cls": jnp.argmax(pred, axis=-1), "labels": labels}
        if cfg.n_classes == 2:   # positive-class probability, for AUC
            aux["score"] = jax.nn.softmax(pred, axis=-1)[:, 1]
        return loss, aux

    def _step(self, variables, opt_state, batch: GraphBatch, rng,
              edge_table, node_table):
        from ..utils.precision import compute_cast

        prec = self.cfg.precision

        def loss_fn(params):
            # bf16: cast f32 master params (+ tables, batch floats) to the
            # compute dtype inside the traced step — grads come out f32
            out, mutated = self.model.apply(
                {"params": compute_cast(params, prec),
                 "batch_stats": variables.get("batch_stats", {})},
                compute_cast(edge_table, prec),
                compute_cast(node_table, prec), batch, True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss, aux = self._loss_from_pred(out, batch)
            return loss, (aux, mutated)

        (loss, (aux, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = self.tx.update(grads, opt_state,
                                            variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {"params": params, **mutated}
        return new_vars, opt_state, loss, aux

    def _multi_step(self, variables, opt_state, stacked: GraphBatch, rngs,
                    real, edge_table, node_table):
        """K train steps in ONE dispatch via lax.scan — amortizes host→
        device round-trip latency (decisive under the TPU tunnel, and still
        saves dispatch overhead on directly-attached hosts). ``real`` [K]
        marks padding steps whose state updates are discarded."""

        def body(carry, inp):
            variables, opt_state = carry
            batch, rng, is_real = inp
            new_vars, new_opt, loss, aux = self._step(
                variables, opt_state, batch, rng, edge_table, node_table)

            def sel(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(is_real, a, b), new, old)

            return (sel(new_vars, variables), sel(new_opt, opt_state)), (
                loss, aux)

        (variables, opt_state), (losses, auxes) = jax.lax.scan(
            body, (variables, opt_state), (stacked, rngs, real))
        return variables, opt_state, losses, auxes

    def _forward_eval(self, variables, batch: GraphBatch, edge_table,
                      node_table):
        from ..utils.precision import compute_cast

        prec = self.cfg.precision
        out = self.model.apply(
            {"params": compute_cast(variables["params"], prec),
             **{k: v for k, v in variables.items() if k != "params"}},
            compute_cast(edge_table, prec), compute_cast(node_table, prec),
            batch, False)
        loss, aux = self._loss_from_pred(out, batch)
        return loss, aux

    def _multi_eval(self, variables, stacked: GraphBatch, edge_table,
                    node_table):
        """K eval forwards in one dispatch (scan over stacked batches)."""
        def body(carry, batch):
            loss, aux = self._forward_eval(variables, batch, edge_table,
                                           node_table)
            return carry, (loss, aux)

        _, (losses, auxes) = jax.lax.scan(body, None, stacked)
        return losses, auxes

    # ------------------------------------------------------------------
    def _batches(self, view, mode: str, epoch: int = 0):
        """Yield GraphBatches for a split view (edge-seeded tasks).

        The epoch index is mixed into the shuffle seed AND every per-batch
        sampler seed, so each epoch sees a fresh permutation and fresh k-hop
        subgraphs (reference ``main.py:288`` shuffle semantics) while
        threaded sampling stays order-independent."""
        cfg = self.cfg
        loader = DataLoader(view.tensor_frame, cfg.batch_size,
                            shuffle=(mode == "train"),
                            seed=mix_seed(cfg.seed, epoch))
        ignore = getattr(self.dataset, "ignore_label", None)

        def build(item):
            i, tf, valid = item
            # deterministic per-batch sampler seed (also makes threaded
            # sampling order-independent)
            seed = mix_seed(cfg.seed, epoch, i)
            if "node" in cfg.task:
                y = np.asarray(tf.y)
                ids = y[:, 1].astype(np.int64)
                gb = self.dataset.get_node_inputs(ids, y[:, :1], valid,
                                                  mode, rng_seed=seed)
                if ignore is not None:
                    # mask out the unknown class (elliptic y != 2,
                    # elliptic_bitcoin.py:179)
                    gb.seed_mask = gb.seed_mask & (y[:, 0] != ignore)
            elif "mcm" in cfg.task:
                gb = self.dataset.get_mcm_inputs(np.asarray(tf.y), valid,
                                                 mode, rng_seed=seed)
            else:
                gb = self.dataset.get_graph_inputs(np.asarray(tf.y), valid,
                                                   mode, rng_seed=seed)
            return gb

        items = ((i, tf, valid)
                 for i, (tf, valid) in enumerate(loader))
        if mode == "train":
            # multi-host: each process trains on its round-robin share of
            # the global batch stream (eval stays replicated — every host
            # computes the full metric; SURVEY §2.3 DCN row)
            from ..parallel.distributed import process_info, shard_stream

            pidx, pcount = process_info()
            items = shard_stream(items, pidx, pcount)
        threads = int(getattr(cfg, "sampler_threads", 1))
        if threads > 1:
            from ..parallel.parallel_sampler import ParallelBatchIterator

            yield from ParallelBatchIterator(items, build,
                                             num_threads=threads)
        else:
            for item in items:
                yield build(item)

    def train_epoch(self, view, epoch: int) -> dict:
        cfg = self.cfg
        t0 = time.time()
        losses = []           # device scalars; converted once at epoch end
        loss_counts = []      # real steps behind each entry
        seed_masks, aux_list = [], []
        dropped = kept = 0    # sampler truncation telemetry
        K = max(int(getattr(cfg, "steps_per_dispatch", 1)), 1)
        pending: list[GraphBatch] = []
        # Bounded async dispatch: keep at most `inflight_groups` dispatched
        # step-groups un-synced. Fully unbounded queueing (sync only at epoch
        # end) degrades an order of magnitude over remote/tunneled device
        # transports; a window of ~2 keeps the device busy while the host
        # samples ahead.
        window = max(int(getattr(cfg, "inflight_groups", 2)), 1)
        inflight: list = []

        use_dev = self._use_device_sampler()
        dgraph = self._dgraph("train") if use_dev else None
        trunc = []   # device (dropped, kept) pairs when sampling in-jit

        def flush(n_real=None):
            if not pending:
                return
            n_real = n_real if n_real is not None else len(pending)
            if len(pending) == 1 and K == 1:
                batch = pending[0]
                if use_dev:
                    batch, b_drop, b_kept = self._sample_one(batch, dgraph)
                    trunc.append((b_drop, b_kept))
                self.rng, k = jax.random.split(self.rng)
                (self.variables, self.opt_state, loss,
                 aux) = self._train_step(
                    self.variables, self.opt_state, batch, k,
                    self.edge_table, self.node_table)
                losses.append(loss)
                loss_counts.append(1)
                aux_list.append(aux)
                seed_masks.append(np.asarray(pending[0].seed_mask))
            else:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs) if xs[0] is not None else None,
                    *pending)
                real = np.arange(len(pending)) < n_real
                masks = np.stack([np.asarray(g.seed_mask) for g in pending])
                if use_dev:
                    stacked, b_drop, b_kept = self._sample_group(stacked,
                                                                 dgraph)
                    trunc.append((b_drop[:n_real], b_kept[:n_real]))
                self.rng, k = jax.random.split(self.rng)
                rngs = jax.random.split(k, len(pending))
                (self.variables, self.opt_state, ls,
                 auxes) = self._scan_step(
                    self.variables, self.opt_state, stacked, rngs, real,
                    self.edge_table, self.node_table)
                # keep only the real steps' loss/aux — the padded copies of
                # the final batch would double-count its rows in the epoch
                # metrics otherwise
                losses.append(ls[:n_real].sum())
                loss_counts.append(n_real)
                aux_list.append(jax.tree_util.tree_map(
                    lambda a: a[:n_real], auxes))
                seed_masks.append(masks[:n_real].reshape(-1))
            pending.clear()
            inflight.append(losses[-1])
            if len(inflight) > window:
                # device_get of the (tiny) loss, not block_until_ready: over
                # the tunneled transport block_until_ready can return before
                # the work executes (RESULTS.md round-2 correction), which
                # would defeat the queue bound
                jax.device_get(inflight.pop(0))

        from ..parallel.prefetch import Prefetcher

        src_iter = (self._seed_batches(view, "train", epoch) if use_dev
                    else self._batches(view, "train", epoch))
        batch_iter = Prefetcher(src_iter, depth=max(2 * K, 2),
                                device_put=False)
        for gb in batch_iter:
            if not use_dev:
                dropped += gb.num_dropped
                kept += int(gb.edge_mask.sum())
            pending.append(gb)
            if len(pending) == K:
                flush()
        # final partial group: pad with copies of the last batch so the SAME
        # compiled scan program handles it — padded steps' parameter and
        # optimizer updates are discarded inside the scan (`real` flags)
        if pending:
            n_real = len(pending)
            if K > 1:
                while len(pending) < K:
                    pending.append(pending[-1])
            flush(n_real)

        # single host sync for the whole epoch
        total_loss = float(np.sum([float(l) for l in losses])
                           / max(sum(loss_counts), 1))
        n_batches = sum(loss_counts)
        preds, labels, scores = [], [], []
        mcm = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        for b_drop, b_kept in trunc:   # in-jit truncation telemetry
            dropped += int(np.asarray(b_drop).sum())
            kept += int(np.asarray(b_kept).sum())
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
               "drop_rate": dropped / max(dropped + kept, 1)}
        if out["drop_rate"] > cfg.max_drop_rate:
            logger.warning(
                "sampler dropped %.2f%% of sampled edges at "
                "edge_capacity=%d — raise --edge_capacity (the reference "
                "keeps every sampled edge; parity needs ~zero drops)",
                100 * out["drop_rate"], cfg.edge_capacity)
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

    def evaluate(self, view, mode: str) -> Any:
        cfg = self.cfg
        preds, labels, scores = [], [], []
        mcm = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        results = []  # (aux, seed_mask) pairs; device arrays stay async
        K = max(int(getattr(cfg, "steps_per_dispatch", 1)), 1)
        pending = []

        use_dev = self._use_device_sampler()
        dgraph = self._dgraph(mode) if use_dev else None

        def eval_one(gb):
            if use_dev:
                gb_s, _, _ = self._sample_one(gb, dgraph)
            else:
                gb_s = gb
            _, aux = self._eval_step(self.variables, gb_s, self.edge_table,
                                     self.node_table)
            results.append((aux, np.asarray(gb.seed_mask)))

        def flush_eval():
            if not pending:
                return
            if len(pending) == 1:
                eval_one(pending[0])
            else:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs) if xs[0] is not None else None,
                    *pending)
                if use_dev:
                    stacked, _, _ = self._sample_group(stacked, dgraph)
                _, auxes = self._scan_eval(self.variables, stacked,
                                           self.edge_table, self.node_table)
                for j, gb in enumerate(pending):
                    aux_j = jax.tree_util.tree_map(lambda a: a[j], auxes)
                    results.append((aux_j, np.asarray(gb.seed_mask)))
            pending.clear()

        src_iter = (self._seed_batches(view, mode) if use_dev
                    else self._batches(view, mode))
        for gb in src_iter:
            pending.append(gb)
            if len(pending) == K:
                flush_eval()
        while pending:  # trailing group: run one-by-one (stable shapes)
            eval_one(pending.pop(0))
        for aux, mask in results:
            if "mcm" in cfg.task:
                for k in mcm:
                    mcm[k] += float(aux[k])
            else:
                m = np.asarray(mask)
                preds.append(np.asarray(aux["pred_cls"])[m])
                labels.append(np.asarray(aux["labels"])[m])
                if "score" in aux:
                    scores.append(np.asarray(aux["score"])[m])
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

    def predict(self, view, mode: str = "test"):
        """Batch inference over a view's seed rows (serving path).

        Returns a dict of 1-D arrays aligned on real rows: ``id`` (edge-
        table row id for edge tasks, node id for node tasks), ``pred``
        (argmax class) and — for binary heads — ``score`` (P(class 1)).
        ``mode`` picks the sampling graph ("test" = the full graph, the
        production-inference setting; per-split samplers mirror
        ``util/graph.py:31-53``). Rows excluded by a dataset's
        ``ignore_label`` (e.g. elliptic's unknown class) are skipped, as
        in evaluation."""
        cfg = self.cfg
        if "mcm" in cfg.task:
            raise ValueError("predict() serves classification tasks; MCM "
                             "is a pretraining objective")
        node_task = "node" in cfg.task
        ids, preds, scores = [], [], []
        use_dev = self._use_device_sampler()
        dgraph = self._dgraph(mode) if use_dev else None
        src_iter = (self._seed_batches(view, mode) if use_dev
                    else self._batches(view, mode))
        for gb in src_iter:
            if use_dev:
                row = (np.asarray(gb.seeds)[:, 0] if node_task
                       else np.asarray(gb.seeds)[:, 2])
                gb, _, _ = self._sample_one(gb, dgraph)
            elif node_task:
                # seed nodes occupy node lanes [0, B) in input order
                row = np.asarray(gb.node_gather)[:cfg.batch_size]
            else:
                # seed edges occupy edge lanes [0, B) in input order
                row = np.asarray(gb.edge_gather)[:cfg.batch_size]
            _, aux = self._eval_step(self.variables, gb, self.edge_table,
                                     self.node_table)
            m = np.asarray(gb.seed_mask)
            ids.append(row[m])
            preds.append(np.asarray(aux["pred_cls"])[m])
            if "score" in aux:
                scores.append(np.asarray(aux["score"])[m])
        out = {"id": np.concatenate(ids).astype(np.int64),
               "pred": np.concatenate(preds)}
        if scores:
            out["score"] = np.concatenate(scores)
        return out

    # ------------------------------------------------------------------
    def fit(self, run_logger=None, run_dir: Optional[str] = None,
            start_epoch: int = 0, best_m=None):
        """Epoch loop with best-model tracking + per-epoch checkpointing
        (reference ``main.py:359-405``)."""
        from ..utils.checkpoint import save_checkpoint

        cfg = self.cfg
        if "node" in cfg.task:
            tr, va, te = self.dataset.nodes.split()
        else:
            tr, va, te = self.dataset.edges.split()
        mcm_task = "mcm" in cfg.task
        if best_m is None:
            best_m = [1000.0, -1.0] if mcm_task else -1.0
        history = []
        for epoch in range(start_epoch, start_epoch + cfg.epochs):
            tm = self.train_epoch(tr, epoch)
            val_m = self.evaluate(va, "val")
            te_m = self.evaluate(te, "test")
            rec = {"epoch": epoch, **tm}
            improved = False
            if mcm_task:
                rec.update({"val_rmse": val_m[0], "val_acc": val_m[1],
                            "test_rmse": te_m[0], "test_acc": te_m[1]})
                if (val_m[0] < best_m[0]) and (val_m[1] > best_m[1]
                                               or best_m[1] == 1):
                    best_m, improved = val_m, True
            else:
                rec.update({"val_f1": val_m["f1"], "test_f1": te_m["f1"]})
                if "auc" in val_m:
                    rec.update({"val_auc": val_m["auc"],
                                "test_auc": te_m["auc"]})
                if val_m["f1"] > best_m:
                    best_m, improved = val_m["f1"], True
            rec["best"] = improved
            logger.info(" ".join(f"{k}={v:.4f}" if isinstance(v, float)
                                 else f"{k}={v}" for k, v in rec.items()))
            if run_logger is not None:
                run_logger.log(rec, step=epoch)
            if run_dir is not None:
                backend = getattr(cfg, "ckpt_backend", "msgpack")
                save_checkpoint(run_dir, epoch, self.variables,
                                self.opt_state, best_m, backend=backend)
                if improved and cfg.save_model:
                    save_checkpoint(run_dir, -1, self.variables, None,
                                    best_m, prune_previous=False,
                                    backend=backend)
            history.append(rec)
        from ..utils.checkpoint import wait_for_saves
        wait_for_saves()
        return history, best_m
