"""Masked segment reductions — the XLA substrate for GNN message passing.

Replaces the reference's reliance on torch_geometric/torch-scatter CUDA
kernels (SURVEY §2.2 N3): PNA aggregation (mean/min/max/std + degree
scalers, ``src/nn/gnn/pna.py``), GINE sum aggregation, and the fused model's
``index_add_``/``bincount`` scatter-mean pooling
(``src/nn/models/fused.py:256-268``).

All ops take STATIC-shape padded edge arrays with a validity mask: invalid
lanes are routed to segment id ``num_segments`` (one past the end) and drop
out of every reduction — no host-side compaction, fully jit-compatible.

TPU implementation note: XLA lowers ``jax.ops.segment_*`` to scatter, which
SERIALIZES on TPU (~100x slower than the rest of the step at production
subgraph sizes — measured 445 ms for one PNA aggregation over 131k edges).
Everything here is therefore SORT-based: sort edge lanes by segment id once,
then per-segment sums become cumsum differences at segment boundaries and
max/min become a segmented associative scan — all dense, vectorizable ops
that XLA maps onto the VPU. ``pna_aggregate`` shares one sort across all
four aggregators.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as _jax_dtypes


def _masked_ids(segment_ids: jnp.ndarray, mask: jnp.ndarray | None,
                num_segments: int) -> jnp.ndarray:
    if mask is None:
        return segment_ids
    return jnp.where(mask, segment_ids, num_segments)


def _flatten_trailing(data):
    if data.ndim == 1:
        return data[:, None], ()
    if data.ndim == 2:
        return data, (data.shape[1],)
    return data.reshape(data.shape[0], -1), data.shape[1:]


def _segment_order(segment_ids, num_segments, mask):
    """Sort lanes by (masked) segment id. Returns (order [E], sorted ids
    [E], bounds [N+1] — start offset of each segment in the sorted order,
    exclusive end at bounds[n+1])."""
    ids = _masked_ids(segment_ids, mask, num_segments).astype(jnp.int32)
    order = jnp.argsort(ids, stable=True)
    sk = ids[order]
    bounds = jnp.searchsorted(
        sk, jnp.arange(num_segments + 1, dtype=jnp.int32))
    return order, sk, bounds


def _sums_from_sorted(d_sorted, bounds):
    """Per-segment sums of pre-sorted rows via cumsum differences."""
    p = jnp.cumsum(d_sorted, axis=0)
    pz = jnp.concatenate([jnp.zeros_like(p[:1]), p], axis=0)
    return pz[bounds[1:]] - pz[bounds[:-1]]


def _extreme_from_sorted(d_sorted, sk, bounds, op, empty_value):
    """Per-segment max/min of pre-sorted rows via a segmented inclusive
    scan (value carried forward within a segment, reset at boundaries).

    Implemented as a manually unrolled Hillis-Steele doubling loop
    (log2(E) shift+select steps) rather than ``lax.associative_scan``:
    the TPU compiler HANGS on associative_scan over [131k, F] operands
    inside lax.scan bodies (bisected round 3: 6/6 compiles >240 s for
    associative_scan vs 5-15 s for this formulation, identical math —
    the (value, start-flag) segmented-max semiring)."""
    starts = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    v = d_sorted
    f = jnp.broadcast_to(starts[:, None], d_sorted.shape)
    e = d_sorted.shape[0]
    k = 1
    while k < e:
        nv = jnp.where(f[k:], v[k:], op(v[k:], v[:-k]))
        nf = f[k:] | f[:-k]
        v = jnp.concatenate([v[:k], nv], axis=0)
        f = jnp.concatenate([f[:k], nf], axis=0)
        k *= 2
    ends = jnp.clip(bounds[1:] - 1, 0)
    out = v[ends]
    count = (bounds[1:] - bounds[:-1])[:, None]
    return jnp.where(count > 0, out, empty_value)


def _impl(impl: str | None = None) -> str:
    """Segment-reduction backend: explicit ``impl`` argument, else the
    RMM_SEGMENT_IMPL env var, else a per-backend default.

    NOTE on the env knob: it is read at TRACE time. Once a caller's jitted
    program is compiled and cached, flipping the env var does not retrace
    that program — set it before the first trace (tests that need both
    backends pass ``impl=`` explicitly instead).

    Numerics: the sort path computes segment sums as differences of a
    full-array float32 cumsum, which loses a few ulps for small segments
    late in large edge arrays vs. the scatter path's direct accumulation
    (equivalence tests use ~1e-5 tolerances accordingly).

    "sort" runs the step ~2.5x faster on TPU (93 ms vs 230 ms at the
    config of record) and is the DEFAULT on every backend. The round-2
    TPU compile hang was bisected (round 3) to ``lax.associative_scan``
    over large operands inside scan bodies — replaced with a manually
    unrolled doubling scan in ``_extreme_from_sorted``, after which the
    full sort path compiles reliably (20/20 clean compiles on the real
    chip); "scatter" remains available for comparison/debugging."""
    if impl:
        return impl
    v = os.environ.get("RMM_SEGMENT_IMPL")
    if v:
        return v
    return "sort"


def segment_sum(data, segment_ids, num_segments, mask=None, impl=None):
    if _impl(impl) == "scatter":
        ids = _masked_ids(segment_ids, mask, num_segments)
        out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
        return out[:num_segments]
    d2, trail = _flatten_trailing(data)
    order, _, bounds = _segment_order(segment_ids, num_segments, mask)
    out = _sums_from_sorted(d2[order], bounds)
    return out.reshape((num_segments,) + trail)


def segment_count(segment_ids, num_segments, mask=None, impl=None):
    if _impl(impl) == "scatter":
        ones = jnp.ones(segment_ids.shape[0], dtype=jnp.float32)
        return segment_sum(ones, segment_ids, num_segments, mask)
    _, _, bounds = _segment_order(segment_ids, num_segments, mask)
    return (bounds[1:] - bounds[:-1]).astype(jnp.float32)


def segment_mean(data, segment_ids, num_segments, mask=None, impl=None):
    if _impl(impl) == "scatter":
        s = segment_sum(data, segment_ids, num_segments, mask)
        n = jnp.maximum(segment_count(segment_ids, num_segments, mask), 1.0)
        return s / n.reshape((-1,) + (1,) * (data.ndim - 1))
    d2, trail = _flatten_trailing(data)
    order, _, bounds = _segment_order(segment_ids, num_segments, mask)
    s = _sums_from_sorted(d2[order], bounds)
    n = jnp.maximum((bounds[1:] - bounds[:-1]).astype(d2.dtype), 1.0)
    return (s / n[:, None]).reshape((num_segments,) + trail)


def segment_max(data, segment_ids, num_segments, mask=None, empty_value=0.0,
                impl=None):
    if _impl(impl) == "scatter":
        ids = _masked_ids(segment_ids, mask, num_segments)
        out = jax.ops.segment_max(data, ids,
                                  num_segments=num_segments + 1)
        out = out[:num_segments]
        n = segment_count(segment_ids, num_segments, mask)
        empty = (n == 0).reshape((-1,) + (1,) * (data.ndim - 1))
        return jnp.where(empty, empty_value, out)
    d2, trail = _flatten_trailing(data)
    order, sk, bounds = _segment_order(segment_ids, num_segments, mask)
    out = _extreme_from_sorted(d2[order], sk, bounds, jnp.maximum,
                               empty_value)
    return out.reshape((num_segments,) + trail)


def segment_min(data, segment_ids, num_segments, mask=None, empty_value=0.0,
                impl=None):
    if _impl(impl) == "scatter":
        ids = _masked_ids(segment_ids, mask, num_segments)
        out = jax.ops.segment_min(data, ids,
                                  num_segments=num_segments + 1)
        out = out[:num_segments]
        n = segment_count(segment_ids, num_segments, mask)
        empty = (n == 0).reshape((-1,) + (1,) * (data.ndim - 1))
        return jnp.where(empty, empty_value, out)
    d2, trail = _flatten_trailing(data)
    order, sk, bounds = _segment_order(segment_ids, num_segments, mask)
    out = _extreme_from_sorted(d2[order], sk, bounds, jnp.minimum,
                               empty_value)
    return out.reshape((num_segments,) + trail)


def segment_std(data, segment_ids, num_segments, mask=None, eps=1e-5,
                impl=None):
    """sqrt(relu(E[x²] − E[x]²) + eps) per segment — PyG StdAggregation
    semantics used by PNA (``pna.py:60-61`` aggregator list)."""
    if _impl(impl) == "scatter":
        mean = segment_mean(data, segment_ids, num_segments, mask)
        mean2 = segment_mean(data * data, segment_ids, num_segments, mask)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        return jnp.sqrt(var + eps)
    d2, trail = _flatten_trailing(data)
    order, _, bounds = _segment_order(segment_ids, num_segments, mask)
    ds = d2[order]
    both = _sums_from_sorted(jnp.concatenate([ds, ds * ds], axis=1), bounds)
    n = jnp.maximum((bounds[1:] - bounds[:-1]).astype(d2.dtype),
                    1.0)[:, None]
    F = d2.shape[1]
    mean = both[:, :F] / n
    mean2 = both[:, F:] / n
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return jnp.sqrt(var + eps).reshape((num_segments,) + trail)


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


def _pna_combine(mean, mx, mn, sd, n, avg_log_deg):
    """[N,4F] aggregates + degree scalers → [N,12F].

    Aggregator order is [mean, min, max, std] — exactly PyG's
    ``aggregators=['mean','min','max','std']`` as configured by the
    reference (``src/nn/gnn/pna.py:60-61``), so fixed-weight golden
    parity holds block-for-block."""
    agg = jnp.concatenate([mean, mn, mx, sd], axis=-1)
    deg = jnp.maximum(n[:, 0], 1.0)
    log_deg = jnp.log(deg + 1.0)[:, None]
    return jnp.concatenate(
        [agg, agg * (log_deg / avg_log_deg),
         agg * (avg_log_deg / log_deg)], axis=-1)


def _pna_stats(d2, dst, mask, num_nodes):
    """(mean, mx, mn, sd, n [N,1], order, bounds) — sort-based sums/std +
    scatter extremes (the empirically fastest forward on TPU). ``order``/
    ``bounds`` are passed through so the analytic backward can count
    extreme ties per segment without re-sorting."""
    F = d2.shape[1]
    order, sk, bounds = _segment_order(dst, num_nodes, mask)
    ds = d2[order]
    n = (bounds[1:] - bounds[:-1]).astype(d2.dtype)[:, None]
    n1 = jnp.maximum(n, 1.0)
    both = _sums_from_sorted(jnp.concatenate([ds, ds * ds], axis=1), bounds)
    mean = both[:, :F] / n1
    mean2 = both[:, F:] / n1
    sd = jnp.sqrt(jnp.maximum(mean2 - mean * mean, 0.0) + 1e-5)
    ids = _masked_ids(dst, mask, num_nodes)
    ext = jax.ops.segment_max(
        jnp.concatenate([d2, -d2], axis=1), ids,
        num_segments=num_nodes + 1)[:num_nodes]
    mx, mn = ext[:, :F], -ext[:, F:]
    empty = n <= 0
    mx = jnp.where(empty, 0.0, mx)
    mn = jnp.where(empty, 0.0, mn)
    return mean, mx, mn, sd, n, order, bounds


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pna_cv(messages, dst, mask_arr, num_nodes, avg_log_deg):
    mean, mx, mn, sd, n, _, _ = _pna_stats(messages, dst, mask_arr,
                                           num_nodes)
    return _pna_combine(mean, mx, mn, sd, n, avg_log_deg)


def _pna_cv_fwd(messages, dst, mask_arr, num_nodes, avg_log_deg):
    mean, mx, mn, sd, n, order, bounds = _pna_stats(
        messages, dst, mask_arr, num_nodes)
    out = _pna_combine(mean, mx, mn, sd, n, avg_log_deg)
    return out, (messages, dst, mask_arr, mean, mx, mn, sd, n, order,
                 bounds)


def _pna_cv_bwd(num_nodes, avg_log_deg, res, dout):
    """Analytic backward: pure gathers + elementwise — no scatter, no
    sort transpose, no scan (autodiff of the sorted forward would emit a
    scatter-add for the gather transpose and a reverse cumsum; this is
    the hot op of every GNN train step, so the backward is hand-derived).

    Max/min cotangents are split EVENLY across tying elements (the
    symmetric subgradient): duplicate edges with identical attributes —
    realistic in transaction data since pre_nn is a plain Dense — would
    otherwise each receive the full cotangent, inflating the summed
    message gradient k-fold vs the scatter/autodiff backends (advisor r3
    finding #4). Tie counts come from the forward's sort order via cumsum
    differences — still no scatter in the backward."""
    msg, dst, mask_arr, mean, mx, mn, sd, n, order, bounds = res
    F = msg.shape[1]
    n1 = jnp.maximum(n, 1.0)
    deg = jnp.maximum(n[:, 0], 1.0)
    log_deg = jnp.log(deg + 1.0)[:, None]
    amp = log_deg / avg_log_deg
    att = avg_log_deg / log_deg
    dagg = (dout[:, :4 * F] + dout[:, 4 * F:8 * F] * amp
            + dout[:, 8 * F:] * att)                       # [N, 4F]
    dmean_o = dagg[:, :F]
    dmn = dagg[:, F:2 * F]
    dmx = dagg[:, 2 * F:3 * F]
    dsd = dagg[:, 3 * F:]
    # sd = sqrt(max(var,0)+eps): zero grad where var was clipped
    active = (sd * sd - 1e-5) > 0
    dvar = jnp.where(active, dsd * 0.5 / sd, 0.0)
    dmean2 = dvar
    dmean = dmean_o - 2.0 * mean * dvar
    idx = jnp.clip(dst, 0, num_nodes - 1)
    inv_n = (1.0 / n1)[idx][:, 0][:, None]
    tie_mx = msg == mx[idx]
    tie_mn = msg == mn[idx]
    # per-segment tie counts via the saved sort (padded lanes land in the
    # dropped tail block past bounds[num_nodes], so no masking needed)
    ties = jnp.concatenate([tie_mx, tie_mn], axis=1).astype(msg.dtype)
    cnt = jnp.maximum(_sums_from_sorted(ties[order], bounds), 1.0)
    g = (dmean[idx] * inv_n
         + 2.0 * msg * dmean2[idx] * inv_n
         + jnp.where(tie_mx, dmx[idx] / cnt[:, :F][idx], 0.0)
         + jnp.where(tie_mn, dmn[idx] / cnt[:, F:][idx], 0.0))
    g = jnp.where(mask_arr[:, None], g, 0.0)
    zero_i = np.zeros(dst.shape, dtype=_jax_dtypes.float0)
    zero_b = np.zeros(mask_arr.shape, dtype=_jax_dtypes.float0)
    return g, zero_i, zero_b


_pna_cv.defvjp(_pna_cv_fwd, _pna_cv_bwd)


def pna_aggregate(messages, dst, num_nodes, avg_log_deg, mask=None,
                  impl=None):
    """PNA multi-aggregation: [mean|min|max|std] × [identity|amplification|
    attenuation] → [N, 12·F].

    Mirrors PyG ``PNAConv.aggregate`` with aggregators
    ``['mean','min','max','std']`` and scalers
    ``['identity','amplification','attenuation']``
    (``src/nn/models/tabgnn.py:161-169``), over padded static-shape edges.
    Degree is clamped to ≥1 as in PyG. The default backend ("cv") pairs
    the sort+scatter-extremes forward with a hand-derived analytic
    backward (gathers only — fastest full train step measured on the real
    chip round 3: cv 182 ms vs scatter 191 ms vs sort 238 ms at the config
    of record); "sort"/"hybrid"/"scatter" expose the
    autodiff-differentiated formulations."""
    which = impl or os.environ.get("RMM_SEGMENT_IMPL") or "cv"
    if which in ("cv", "sort_cv", "hybrid_cv"):
        d2, _ = _flatten_trailing(messages)
        mask_arr = (jnp.ones(d2.shape[0], bool) if mask is None
                    else mask.astype(bool))
        return _pna_cv(d2, dst, mask_arr, int(num_nodes),
                       float(avg_log_deg))
    if which == "scatter":
        mean = segment_mean(messages, dst, num_nodes, mask)
        mx = segment_max(messages, dst, num_nodes, mask)
        mn = segment_min(messages, dst, num_nodes, mask)
        sd = segment_std(messages, dst, num_nodes, mask)
        agg = jnp.concatenate([mean, mn, mx, sd], axis=-1)
        deg = jnp.maximum(degree(dst, num_nodes, mask), 1.0)
        log_deg = jnp.log(deg + 1.0)[:, None]
        return jnp.concatenate(
            [agg, agg * (log_deg / avg_log_deg),
             agg * (avg_log_deg / log_deg)], axis=-1)
    d2, _ = _flatten_trailing(messages)
    F = d2.shape[1]
    order, sk, bounds = _segment_order(dst, num_nodes, mask)
    ds = d2[order]
    n = (bounds[1:] - bounds[:-1]).astype(d2.dtype)[:, None]
    n1 = jnp.maximum(n, 1.0)
    both = _sums_from_sorted(jnp.concatenate([ds, ds * ds], axis=1), bounds)
    mean = both[:, :F] / n1
    mean2 = both[:, F:] / n1
    sd = jnp.sqrt(jnp.maximum(mean2 - mean * mean, 0.0) + 1e-5)
    if which == "hybrid":
        # sums/std from the sort, extremes from XLA scatter-max (one
        # combined scatter over [E, 2F]) — extremes via scatter are cheap
        # (no log(E) doubling chain) while the sums ride the shared sort
        ids = _masked_ids(dst, mask, num_nodes)
        ext = jax.ops.segment_max(
            jnp.concatenate([d2, -d2], axis=1), ids,
            num_segments=num_nodes + 1)[:num_nodes]
        mx, mn = ext[:, :F], -ext[:, F:]
    else:
        ext = _extreme_from_sorted(
            jnp.concatenate([ds, -ds], axis=1), sk, bounds, jnp.maximum,
            0.0)
        mx, mn = ext[:, :F], -ext[:, F:]
    empty = n <= 0
    mx = jnp.where(empty, 0.0, mx)
    mn = jnp.where(empty, 0.0, mn)
    agg = jnp.concatenate([mean, mn, mx, sd], axis=-1)  # [N, 4F]

    deg = jnp.maximum(n[:, 0], 1.0)
    log_deg = jnp.log(deg + 1.0)[:, None]
    amp = log_deg / avg_log_deg
    att = avg_log_deg / log_deg
    return jnp.concatenate([agg, agg * amp, agg * att], axis=-1)  # [N, 12F]
