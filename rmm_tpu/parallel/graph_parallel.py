"""Data-parallel × graph-partition SPMD training.

The composition for graphs whose adjacency outgrows one chip's HBM
(SURVEY §2.3 graph-partition row): the mesh is 2-D ``(data, graph)`` —
each data group holds one seed batch, and WITHIN the group the CSR's
edge payload is chunk-sharded over the ``graph`` axis
(:mod:`rmm_tpu.graph.sharded_csr`). In-jit sampling expands each shard's
owned rows locally and ``all_gather``s the fixed-size candidate buffers
per hop over ICI; the resulting subgraph batch is replicated within the
group, so the model forward/backward needs no further graph-axis
collectives and gradients reduce over ``data`` only.

Host→device traffic stays seeds-only (~KB), exactly like the replicated
device-sampler DP step (``data_parallel.make_dp_device_train_step``) —
this step trades one all_gather pair per hop for a D× smaller
per-chip adjacency footprint.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.sharded_csr import ShardedDeviceGraph
from .data_parallel import _shmap


def make_dp_gp_train_step(model, tx, loss_from_pred: Callable,
                          materialize: Callable, mesh: Mesh,
                          sdg: ShardedDeviceGraph,
                          data_axis: str = "data",
                          graph_axis: str = "graph"):
    """Build the jitted (data × graph) train step.

    ``materialize(sb, local_dg, axis_name, n_shards) → (GraphBatch,
    num_dropped, num_kept)`` is the trainer's ``_materialize_dev`` with
    graph-partition mode on. ``sdg`` fixes the spec layout (has_out /
    n_shards are static). Signature: (variables, opt_state,
    stacked_seed_batch, rngs[D_data], real[D_data], edge_table,
    node_table, graph_parts) → (variables, opt_state, loss,
    dropped[D_data], kept[D_data])."""
    n_shards = sdg.n_shards
    _, g_specs = sdg.shard_parts(graph_axis)

    def per_chip(variables, opt_state, sb, rng, real, edge_table,
                 node_table, parts):
        sb = jax.tree_util.tree_map(
            lambda x: x[0] if x is not None else None, sb)
        rng = rng[0]
        w = real[0].astype(jnp.float32)
        denom = jax.lax.psum(w, data_axis)
        local_dg = ShardedDeviceGraph.local_device_graph(parts)
        batch, n_drop, kept = materialize(sb, local_dg, graph_axis,
                                          n_shards)

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
        # graph-axis replicas compute identical grads (the gathered batch
        # is replicated within the group) — reduce over `data` only
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
                  P(), P(), g_specs),
        out_specs=(P(), P(), P(), P(data_axis), P(data_axis)))
    return jax.jit(sharded)
