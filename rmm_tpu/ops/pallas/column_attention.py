"""Fused column-attention Pallas kernel.

The tabular models attend over the COLUMN token axis: sequences of
``num_cols + 1`` tokens (≈6 for AML) with a very large batch axis — the
exact inverse of LLM attention. The XLA lowering materializes qkv, the
[B, h, S, S] logits and the attention output in HBM between fusions; this
kernel keeps one batch-tile's entire attention (qkv projection → scores →
softmax → context → output projection) resident in VMEM, so HBM traffic is
one read of x and one write of o per tile (plus the weights, which stay in
VMEM across the grid).

Grid: (B*S / (BT*S),) — one program per BT-row batch tile. All matmuls hit
the MXU via ``preferred_element_type=float32``.

Used by :class:`rmm_tpu.nn.transformer.MultiHeadSelfAttention` when shapes
align (C a multiple of 128 lanes) and dropout is off; falls back to the XLA
path otherwise. Matches the reference's column attention semantics
(``torch.nn.TransformerEncoderLayer`` self-attention over
``[batch, num_cols+1, channels]``, ``src/nn/models/tabgnn.py:193-215``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_TPU_PALLAS = False


def _attention_math(x, wqkv, bqkv, wout, bout, bt, s, c, nhead):
    """Attention on a [BT*S, C] tile, formulated Mosaic-friendly.

    Per-head channel slicing would require reshaping/transposing the lane
    (=channel) axis, which the TPU vector layout cannot express. Instead
    each head h uses a CHANNEL MASK m_h ∈ {0,1}^C (block indicator):

        ctx = Σ_h softmax((q·m_h) kᵀ / √hd) @ (v·m_h)

    which is exactly multi-head attention (cross-head channel products are
    zeroed by the mask; the masked context slices sum disjointly). Only
    elementwise masks + single-batch-dim ``dot_general`` — everything stays
    in VMEM and on the MXU.
    """
    hd = c // nhead
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # [BT*S, C] -> [BT, S, C]: splits the sublane (row) axis only
    q = q.reshape(bt, s, c)
    k = k.reshape(bt, s, c)
    v = v.reshape(bt, s, c)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    ctx = jnp.zeros((bt, s, c), jnp.float32)
    for h in range(nhead):
        m_h = ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(jnp.float32)
        qh = q * m_h
        logits = jax.lax.dot_general(
            qh, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [BT, S, S]
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = ctx + jax.lax.dot_general(
            attn, v * m_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    ctx = ctx.reshape(bt * s, c)
    return jnp.dot(ctx, wout, preferred_element_type=jnp.float32) + bout


def _kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, o_ref, *, bt, s,
            c, nhead):
    o_ref[:] = _attention_math(
        x_ref[:], wqkv_ref[:], bqkv_ref[:], wout_ref[:], bout_ref[:],
        bt, s, c, nhead).astype(o_ref.dtype)


def fused_column_attention(x: jnp.ndarray, wqkv: jnp.ndarray,
                           bqkv: jnp.ndarray, wout: jnp.ndarray,
                           bout: jnp.ndarray, nhead: int,
                           block_rows: int = 128,
                           interpret: bool = False) -> jnp.ndarray:
    """x: [B, S, C] → attention output [B, S, C] (no dropout)."""
    B, S, C = x.shape
    bt = min(block_rows, B)
    while B % bt:
        bt //= 2
    bt = max(bt, 1)
    grid = (B // bt,)
    x2 = x.reshape(B * S, C)

    kernel = functools.partial(_kernel, bt=bt, s=S, c=C, nhead=nhead)
    extra = {}
    if _HAS_TPU_PALLAS and not interpret:
        # unrolled per-head buffers push scoped VMEM past the 16M default
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * S, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((3 * C,), lambda i: (0,)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
        interpret=interpret,
        **extra,
    )(x2, wqkv, bqkv, wout, bout)
    return out.reshape(B, S, C)


def reference_column_attention(x, wqkv, bqkv, wout, bout, nhead):
    """Plain-XLA reference (same math, unfused)."""
    B, S, C = x.shape
    return _attention_math(x.reshape(B * S, C), wqkv, bqkv, wout, bout,
                           B, S, C, nhead).reshape(B, S, C)
