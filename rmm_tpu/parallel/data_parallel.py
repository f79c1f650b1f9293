"""Data-parallel training over a device mesh.

Each chip trains on its own k-hop subgraph minibatch (the batch axis of
relational minibatches is "independent subgraphs", not "rows" — SURVEY §5
long-context note); parameters and the feature tables are replicated,
gradients and batch-norm statistics are ``pmean``-reduced over the ``data``
axis so the collectives ride ICI. Implemented with ``shard_map`` so the
per-chip body is written single-device and XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..utils.batch import GraphBatch


def stack_batches(batches: list[GraphBatch]) -> GraphBatch:
    """Stack per-chip GraphBatches along a leading device axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0)
        if xs[0] is not None else None, *batches)


def _shmap(fn, **specs):
    try:  # jax >= 0.8: check_vma; older: check_rep
        return shard_map(fn, check_vma=False, **specs)
    except TypeError:
        return shard_map(fn, check_rep=False, **specs)


def make_dp_train_step(model, tx, loss_from_pred: Callable, mesh: Mesh,
                       axis: str = "data"):
    """Build the jitted SPMD train step.

    Signature: (variables, opt_state, stacked_batch, rngs[D], real[D],
    edge_table, node_table) → (variables, opt_state, loss, aux) with
    replicated state. ``real`` marks chips whose batch is genuine: the
    final ragged group of an epoch is padded with repeated batches, and a
    plain pmean would give those duplicates full gradient weight — instead
    gradients/loss/batch-stats are averaged over REAL chips only (the DP
    analogue of the scan path's ``real``-flag update discard)."""

    def per_chip(variables, opt_state, batch, rng, real, edge_table,
                 node_table):
        # strip the leading per-chip axis added by shard_map
        batch = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, batch)
        rng = rng[0]
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, axis)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                edge_table, node_table, batch, True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss, aux = loss_from_pred(out, batch)
            return loss, (aux, mutated)

        (loss, (aux, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        # real-weighted gradient + loss + batch-stat reduction over ICI
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * w, axis) / denom, grads)
        loss = jax.lax.psum(loss * w, axis) / denom
        mutated = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s * w, axis) / denom, mutated)
        # aux stays per-chip: out_specs concatenates along the data axis
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
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(axis)))
    return jax.jit(sharded)


def make_dp_pretrain_step(pm, tx, mesh: Mesh, mode: str, axis: str = "data",
                          moo: str = "sum"):
    """SPMD SSL pretrain step (fused.py's joint MCM+LP loop under DP).

    Each chip runs BOTH model views of ``PretrainModel.mode_losses`` (the
    LP pass over neighbor edges + the MCM pass over all edges,
    ``fused.py:277-288``) on its own subgraph batch; gradients, losses and
    batch-stats are real-weighted ``psum``s over ICI exactly as the
    supervised DP step.

    ``moo="moco"`` runs the MoCo multi-objective combine under DP: each
    TASK's gradient is psum-averaged over real chips FIRST, then the
    (replicated) MoCo state update and λ-weighted combine run identically
    on every chip — bitwise-replicated state, single-chip-equivalent
    semantics at D=1. Signature: (params, batch_stats, opt_state,
    moco_state, stacked_batch, rngs[D], real[D], edge_table) →
    (params, batch_stats, opt_state, moco_state, loss); pass
    ``moco_state=None`` under ``moo="sum"``."""
    import optax

    from ..nn.weighting import moco_combine

    def per_chip(params, batch_stats, opt_state, moco_state, batch, rng,
                 real, edge_table):
        batch = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, batch)
        rng = rng[0]
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, axis)

        def pmean_w(tree):
            return jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t * w, axis) / denom, tree)

        if moo == "moco":
            # one traced forward, two VJP pulls on shared residuals
            # (see PretrainTrainer._step, VERDICT r3 weak #3)
            def task_losses(p):
                losses, _aux, stats = pm.mode_losses(
                    p, batch_stats, batch, edge_table, rng, True, mode)
                return (losses["lp"], losses["mcm"]), stats

            (l_lp, l_mcm), vjp_fn, stats = jax.vjp(
                task_losses, params, has_aux=True)
            one = jnp.ones((), l_lp.dtype)
            zero = jnp.zeros((), l_lp.dtype)
            (g_lp,) = vjp_fn((one, zero))
            (g_mcm,) = vjp_fn((zero, one))
            g_lp, g_mcm = pmean_w(g_lp), pmean_w(g_mcm)
            l_lp = jax.lax.psum(l_lp * w, axis) / denom
            l_mcm = jax.lax.psum(l_mcm * w, axis) / denom
            grads, moco_state, _lambd = moco_combine(
                moco_state, [g_lp, g_mcm], [l_lp, l_mcm], params)
            loss = l_lp + l_mcm
        else:
            def loss_fn(p):
                losses, _aux, stats = pm.mode_losses(
                    p, batch_stats, batch, edge_table, rng, True, mode)
                return sum(losses.values()), stats

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = pmean_w(grads)
            loss = jax.lax.psum(loss * w, axis) / denom
        stats = pmean_w(stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, stats, opt_state, moco_state, loss

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P(), P()))
    return jax.jit(sharded)


def make_dp_device_pretrain_step(pm, tx, materialize: Callable, mesh: Mesh,
                                 mode: str, axis: str = "data",
                                 moo: str = "sum"):
    """SSL pretrain step with IN-JIT device-side sampling under DP: each
    chip receives only its SeedBatch; the k-hop subgraph AND the negative
    edges materialize on-device inside the SPMD program
    (``PretrainTrainer._materialize_dev``) — the zero-host-traffic joint
    MCM+LP loop, scaling per-chip sampling with the mesh. Gradient/loss/
    batch-stat reductions and the optional MoCo combine follow
    :func:`make_dp_pretrain_step`. Signature: (params, batch_stats,
    opt_state, moco_state, stacked_seed_batch, real[D], edge_table,
    dgraph) → (params, batch_stats, opt_state, moco_state, loss,
    dropped[D], kept[D])."""
    import optax

    from ..nn.weighting import moco_combine

    def per_chip(params, batch_stats, opt_state, moco_state, sb, real,
                 edge_table, dgraph):
        sb = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, sb)
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, axis)
        batch, n_drop, kept = materialize(sb, dgraph)
        rng = jax.random.PRNGKey(sb.sampler_seed + jnp.uint32(0x51ED5EED))

        def pmean_w(tree):
            return jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t * w, axis) / denom, tree)

        if moo == "moco":
            # one traced forward, two VJP pulls on shared residuals
            # (see PretrainTrainer._step, VERDICT r3 weak #3)
            def task_losses(p):
                losses, _aux, stats = pm.mode_losses(
                    p, batch_stats, batch, edge_table, rng, True, mode)
                return (losses["lp"], losses["mcm"]), stats

            (l_lp, l_mcm), vjp_fn, stats = jax.vjp(
                task_losses, params, has_aux=True)
            one = jnp.ones((), l_lp.dtype)
            zero = jnp.zeros((), l_lp.dtype)
            (g_lp,) = vjp_fn((one, zero))
            (g_mcm,) = vjp_fn((zero, one))
            g_lp, g_mcm = pmean_w(g_lp), pmean_w(g_mcm)
            l_lp = jax.lax.psum(l_lp * w, axis) / denom
            l_mcm = jax.lax.psum(l_mcm * w, axis) / denom
            grads, moco_state, _lambd = moco_combine(
                moco_state, [g_lp, g_mcm], [l_lp, l_mcm], params)
            loss = l_lp + l_mcm
        else:
            def loss_fn(p):
                losses, _aux, stats = pm.mode_losses(
                    p, batch_stats, batch, edge_table, rng, True, mode)
                return sum(losses.values()), stats

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = pmean_w(grads)
            loss = jax.lax.psum(loss * w, axis) / denom
        stats = pmean_w(stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, stats, opt_state, moco_state, loss, n_drop[None],
                kept[None])

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P(axis), P(axis)))
    return jax.jit(sharded)


def make_dp_device_train_step(model, tx, loss_from_pred: Callable,
                              materialize: Callable, mesh: Mesh,
                              axis: str = "data"):
    """DP train step with IN-JIT device-side sampling: each chip receives
    only its light ``SeedBatch`` (seed ids + labels, ~KB) — the k-hop
    subgraph materializes on-device from the HBM-resident CSR inside the
    same SPMD program (``graph/device_sampler.py``), so host→device
    traffic is seeds-only and per-chip sampling scales with the mesh.

    ``materialize(sb, dgraph) → (GraphBatch, num_dropped, num_kept)`` is
    the trainer's ``_materialize_dev``. Signature: (variables, opt_state,
    stacked_seed_batch, rngs[D], real[D], edge_table, node_table, dgraph)
    → (variables, opt_state, loss, dropped[D], kept[D])."""

    def per_chip(variables, opt_state, sb, rng, real, edge_table,
                 node_table, dgraph):
        sb = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, sb)
        rng = rng[0]
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, axis)
        batch, n_drop, kept = materialize(sb, dgraph)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                edge_table, node_table, batch, True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss, _aux = loss_from_pred(out, batch)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * w, axis) / denom, grads)
        loss = jax.lax.psum(loss * w, axis) / denom
        mutated = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s * w, axis) / denom, mutated)
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, variables["params"], updates)
        return ({"params": params, **mutated}, opt_state, loss,
                n_drop[None], kept[None])

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P(), P(axis), P(axis)))
    return jax.jit(sharded)


def make_dp_eval_step(model, loss_from_pred: Callable, mesh: Mesh,
                      axis: str = "data"):
    """Forward-only SPMD step: each chip evaluates its own batch; aux comes
    back stacked along the data axis (padded chips are masked by their
    zeroed ``seed_mask`` host-side)."""

    def per_chip(variables, batch, edge_table, node_table):
        batch = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, batch)
        out = model.apply(variables, edge_table, node_table, batch, False)
        loss, aux = loss_from_pred(out, batch)
        aux = jax.tree_util.tree_map(
            lambda x: x[None] if x.ndim == 0 else x, aux)
        return loss[None], aux

    sharded = _shmap(
        per_chip, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)))
    return jax.jit(sharded)


def shard_batch(mesh: Mesh, stacked: GraphBatch, axis: str = "data"):
    """Place a stacked batch so each chip holds its own slice."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if x is not None else None,
        stacked)
