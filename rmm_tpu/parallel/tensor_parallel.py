"""Tensor parallelism: model-axis-sharded feature tables + distributed gather.

The reference has no multi-device parallelism at all (SURVEY §2.3); its
memory ceiling is one GPU holding the full feature tables. In this
framework the whole edge/node TensorFrames are device-resident (features
are gathered in-jit, ``utils/batch.py``), so the first thing to outgrow a
single chip at production scale is the TABLES, not the parameters
(models are ≤ a few M params, ``main.py:337-339``). The TPU-native answer
is a 2-D ``(data, model)`` mesh:

  * batches shard over ``data`` (each chip group trains its own k-hop
    subgraph minibatch, gradients ``psum`` over ICI — ``data_parallel.py``);
  * the feature tables shard ROW-WISE over ``model``; the in-jit feature
    gather becomes a distributed gather: every model-shard looks up the
    requested ids in its local rows, misses contribute zeros, and one
    ``psum`` over the ``model`` axis reassembles the rows — the classic
    vocab-sharded-embedding pattern, riding ICI.

Parameters stay replicated (they are tiny); each model-axis replica then
computes an identical forward/backward, so gradients only need the
``data``-axis reduction. Table memory per chip drops by the ``model``-axis
size — an 8-chip (1, 8) mesh holds 8× the table a single chip can.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frame.tensor_frame import TensorFrame
from ..utils.batch import GraphBatch
from .data_parallel import _shmap


def shard_table(mesh: Mesh, table: TensorFrame,
                axis: str = "model") -> TensorFrame:
    """Row-shard a TensorFrame over the ``axis`` mesh dimension.

    Rows are padded to a multiple of the axis size so every shard is
    equal (static shapes); padded rows are never referenced (gather ids
    always target real rows)."""
    tp = mesh.shape[axis]
    n = table.num_rows
    total = ((n + tp - 1) // tp) * tp
    padded = table.pad_rows(total) if total != n else table
    sharding = NamedSharding(mesh, P(axis))
    feats = {st: jax.device_put(jnp.asarray(v), sharding)
             for st, v in padded.feats.items()}
    return TensorFrame(feats=feats, col_names=table.col_names, y=None)


def distributed_gather_rows(table: TensorFrame, ids,
                            axis: str = "model") -> TensorFrame:
    """Gather global row ids from a model-axis-sharded table.

    Must run inside ``shard_map``: each leaf of ``table`` is the LOCAL
    shard ``[rows/tp, ...]``. Every shard clips the ids into its own range,
    zeroes misses, and a single ``psum`` over the model axis reassembles
    the full rows (exactly one shard hits each id)."""
    shard_idx = jax.lax.axis_index(axis)

    def gather_leaf(v):
        rows_local = v.shape[0]
        loc = ids - shard_idx * rows_local
        hit = (loc >= 0) & (loc < rows_local)
        out = v[jnp.clip(loc, 0, rows_local - 1)]
        h = hit.reshape(hit.shape + (1,) * (out.ndim - 1))
        out = jnp.where(h, out, jnp.zeros((), out.dtype))
        return jax.lax.psum(out, axis)

    feats = {st: gather_leaf(v) for st, v in table.feats.items()}
    return TensorFrame(feats=feats, col_names=table.col_names, y=None)


def _pregather(batch: GraphBatch, edge_table: TensorFrame,
               node_table: TensorFrame, axis: str):
    """Materialize the batch's table rows via distributed gather and
    rewrite the batch's gather ids to the identity, so the task model's
    in-jit ``gather_rows`` becomes a no-op on the pre-gathered rows."""
    edge_sub = distributed_gather_rows(edge_table, batch.edge_gather, axis)
    node_sub = distributed_gather_rows(node_table, batch.node_gather, axis)
    ident = GraphBatch(
        edge_gather=jnp.arange(batch.edge_gather.shape[0], dtype=jnp.int32),
        edge_mask=batch.edge_mask,
        edge_index=batch.edge_index,
        node_gather=jnp.arange(batch.node_gather.shape[0], dtype=jnp.int32),
        node_mask=batch.node_mask,
        seed_mask=batch.seed_mask,
        y=batch.y,
        neg_edge_index=batch.neg_edge_index,
    )
    return ident, edge_sub, node_sub


def make_dp_tp_train_step(model, tx, loss_from_pred: Callable, mesh: Mesh,
                          data_axis: str = "data",
                          model_axis: str = "model"):
    """SPMD train step over a 2-D (data, model) mesh.

    Same contract as :func:`~rmm_tpu.parallel.make_dp_train_step`
    (variables, opt_state, stacked_batch[D], rngs[D], real[D], edge_table,
    node_table) — but the tables arrive ROW-SHARDED over ``model_axis``
    (see :func:`shard_table`) and are reassembled per batch with one
    distributed gather. Gradients reduce over ``data_axis`` only: model-
    axis replicas compute identical grads after the gather psum."""

    def per_chip(variables, opt_state, batch, rng, real, edge_table,
                 node_table):
        batch = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, batch)
        rng = rng[0]
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, data_axis)

        ident, edge_sub, node_sub = _pregather(batch, edge_table,
                                               node_table, model_axis)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                edge_sub, node_sub, ident, True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss, aux = loss_from_pred(out, ident)
            return loss, (aux, mutated)

        (loss, (aux, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * w, data_axis) / denom, grads)
        loss = jax.lax.psum(loss * w, data_axis) / denom
        mutated = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s * w, data_axis) / denom, mutated)
        aux = jax.tree_util.tree_map(
            lambda x: x[None] if x.ndim == 0 else x, aux)
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, variables["params"], updates)
        new_vars = {"params": params, **mutated}
        return new_vars, opt_state, loss, aux

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(data_axis), P(data_axis),
                  P(model_axis), P(model_axis)),
        out_specs=(P(), P(), P(), P(data_axis)))
    return jax.jit(sharded)


def make_dp_tp_device_train_step(model, tx, loss_from_pred: Callable,
                                 materialize: Callable, mesh: Mesh,
                                 data_axis: str = "data",
                                 model_axis: str = "model"):
    """2-D (data × model) SPMD train step with IN-JIT device-side sampling.

    The full production composition: each data-group receives only its
    ``SeedBatch`` (seeds + labels, ~KB of host traffic); the k-hop
    subgraph materializes on-device from the replicated HBM-resident CSR
    (``graph/device_sampler.py`` — topology only, no features), and the
    batch's feature rows are then reassembled from the ROW-SHARDED tables
    with one distributed gather + psum over ``model_axis``. Gradients
    reduce over ``data_axis`` only (model-axis replicas are identical
    after the gather psum). Signature: (variables, opt_state,
    stacked_seed_batch[D], rngs[D], real[D], edge_table, node_table,
    dgraph) → (variables, opt_state, loss, dropped[D], kept[D])."""

    def per_chip(variables, opt_state, sb, rng, real, edge_table,
                 node_table, dgraph):
        sb = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, sb)
        rng = rng[0]
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, data_axis)
        batch, n_drop, kept = materialize(sb, dgraph)
        ident, edge_sub, node_sub = _pregather(batch, edge_table,
                                               node_table, model_axis)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                edge_sub, node_sub, ident, True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss, _aux = loss_from_pred(out, ident)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * w, data_axis) / denom, grads)
        loss = jax.lax.psum(loss * w, data_axis) / denom
        mutated = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s * w, data_axis) / denom, mutated)
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, variables["params"], updates)
        return ({"params": params, **mutated}, opt_state, loss,
                n_drop[None], kept[None])

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(data_axis), P(data_axis),
                  P(model_axis), P(model_axis), P()),
        out_specs=(P(), P(), P(), P(data_axis), P(data_axis)))
    return jax.jit(sharded)


def make_dp_tp_eval_step(model, loss_from_pred: Callable, mesh: Mesh,
                         data_axis: str = "data",
                         model_axis: str = "model"):
    """Forward-only 2-D SPMD step (tables sharded over ``model_axis``)."""

    def per_chip(variables, batch, edge_table, node_table):
        batch = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, batch)
        ident, edge_sub, node_sub = _pregather(batch, edge_table,
                                               node_table, model_axis)
        out = model.apply(variables, edge_sub, node_sub, ident, False)
        loss, aux = loss_from_pred(out, ident)
        aux = jax.tree_util.tree_map(
            lambda x: x[None] if x.ndim == 0 else x, aux)
        return loss[None], aux

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(data_axis), P(model_axis), P(model_axis)),
        out_specs=(P(data_axis), P(data_axis)))
    return jax.jit(sharded)
