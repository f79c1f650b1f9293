"""Masked segment reductions — the XLA substrate for GNN message passing.

Replaces the reference's reliance on torch_geometric/torch-scatter CUDA
kernels (SURVEY §2.2 N3): PNA aggregation (mean/min/max/std + degree
scalers, ``src/nn/gnn/pna.py``), GINE sum aggregation, and the fused model's
``index_add_``/``bincount`` scatter-mean pooling
(``src/nn/models/fused.py:256-268``).

All ops take STATIC-shape padded edge arrays with a validity mask: invalid
lanes are routed to segment id ``num_segments`` (one past the end) which XLA
drops — no host-side compaction, fully fusable under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_ids(segment_ids: jnp.ndarray, mask: jnp.ndarray | None,
                num_segments: int) -> jnp.ndarray:
    if mask is None:
        return segment_ids
    return jnp.where(mask, segment_ids, num_segments)


def segment_sum(data, segment_ids, num_segments, mask=None):
    ids = _masked_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(segment_ids, num_segments, mask=None):
    ones = jnp.ones(segment_ids.shape[0], dtype=jnp.float32)
    return segment_sum(ones, segment_ids, num_segments, mask)


def segment_mean(data, segment_ids, num_segments, mask=None):
    s = segment_sum(data, segment_ids, num_segments, mask)
    n = segment_count(segment_ids, num_segments, mask)
    n = jnp.maximum(n, 1.0)
    return s / n.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments, mask=None, empty_value=0.0):
    ids = _masked_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    n = segment_count(segment_ids, num_segments, mask)
    empty = (n == 0).reshape((-1,) + (1,) * (data.ndim - 1))
    return jnp.where(empty, empty_value, out)


def segment_min(data, segment_ids, num_segments, mask=None, empty_value=0.0):
    ids = _masked_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_min(data, ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    n = segment_count(segment_ids, num_segments, mask)
    empty = (n == 0).reshape((-1,) + (1,) * (data.ndim - 1))
    return jnp.where(empty, empty_value, out)


def segment_std(data, segment_ids, num_segments, mask=None, eps=1e-5):
    """sqrt(relu(E[x²] − E[x]²) + eps) per segment — PyG StdAggregation
    semantics used by PNA (``pna.py:60-61`` aggregator list)."""
    mean = segment_mean(data, segment_ids, num_segments, mask)
    mean2 = segment_mean(data * data, segment_ids, num_segments, mask)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return jnp.sqrt(var + eps)


def segment_softmax(logits, segment_ids, num_segments, mask=None):
    m = segment_max(logits, segment_ids, num_segments, mask,
                    empty_value=0.0)
    z = jnp.exp(logits - m[segment_ids])
    if mask is not None:
        z = jnp.where(mask.reshape(mask.shape + (1,) * (z.ndim - 1)), z, 0.0)
    denom = segment_sum(z, segment_ids, num_segments, mask)
    denom = jnp.maximum(denom, 1e-16)
    return z / denom[segment_ids]


def scatter_mean_update(x, index, values, mask=None):
    """Mean-pool ``values`` rows into ``x`` rows at ``index`` and average
    with the old value: x[u] ← (x[u] + mean_{i: index_i=u} values[i]) / 2,
    leaving untouched rows unchanged.

    Unique-free rebuild of the fused layer's pooling
    (``src/nn/models/fused.py:256-268``: unique → index_add_ → bincount →
    (x + pooled)/2 on the touched rows).
    """
    n = x.shape[0]
    s = segment_sum(values, index, n, mask)
    cnt = segment_count(index, n, mask)
    touched = cnt > 0
    pooled = s / jnp.maximum(cnt, 1.0)[:, None]
    return jnp.where(touched[:, None], (x + pooled) / 2.0, x)


def degree(segment_ids, num_segments, mask=None):
    """In-degree per node from (padded) dst ids."""
    return segment_count(segment_ids, num_segments, mask)


def pna_scalers_from_histogram(deg_histogram) -> float:
    """avg log-degree from an in-degree histogram (PyG PNAConv ``avg_deg['log']``:
    Σ hist[d]·log(d+1) / Σ hist; reference builds the histogram at
    ``utils.py:179-182``)."""
    hist = jnp.asarray(deg_histogram, dtype=jnp.float32)
    d = jnp.arange(hist.shape[0], dtype=jnp.float32)
    total = jnp.maximum(hist.sum(), 1.0)
    return float(jnp.sum(hist * jnp.log(d + 1.0)) / total)


def pna_aggregate(messages, dst, num_nodes, avg_log_deg, mask=None):
    """PNA multi-aggregation: [mean|max|min|std] × [identity|amplification|
    attenuation] → [N, 12·F].

    Mirrors PyG ``PNAConv.aggregate`` with aggregators
    ``['mean','max','min','std']`` and scalers
    ``['identity','amplification','attenuation']``
    (``src/nn/models/tabgnn.py:161-169``), over padded static-shape edges.
    Degree is clamped to ≥1 as in PyG.
    """
    mean = segment_mean(messages, dst, num_nodes, mask)
    mx = segment_max(messages, dst, num_nodes, mask)
    mn = segment_min(messages, dst, num_nodes, mask)
    sd = segment_std(messages, dst, num_nodes, mask)
    agg = jnp.concatenate([mean, mx, mn, sd], axis=-1)  # [N, 4F]

    deg = jnp.maximum(degree(dst, num_nodes, mask), 1.0)
    log_deg = jnp.log(deg + 1.0)[:, None]
    amp = log_deg / avg_log_deg
    att = avg_log_deg / log_deg
    return jnp.concatenate([agg, agg * amp, agg * att], axis=-1)  # [N, 12F]
