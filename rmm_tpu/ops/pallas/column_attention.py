"""Fused column-attention Pallas kernel — forward AND backward.

The tabular models attend over the COLUMN token axis: sequences of
``num_cols + 1`` tokens (≈6 for AML) with a very large batch axis — the
exact inverse of LLM attention. The XLA lowering materializes qkv, the
[B, h, S, S] logits and the attention output in HBM between fusions; this
kernel keeps one batch-tile's entire attention (qkv projection → scores →
softmax → (dropout) → context → output projection) resident in VMEM, so
HBM traffic is one read of x and one write of o per tile (plus the weights,
which stay in VMEM across the grid).

Training support (round 2):
  * ``jax.custom_vjp`` with a SINGLE fused backward kernel that re-derives
    qkv/attn in VMEM (rematerialization — no forward residuals besides x)
    and emits dx per tile plus weight/bias grads accumulated across the
    sequential TPU grid;
  * attention-probability dropout via an explicit keep-mask operand
    ([B, nhead, S, S], generated with ``jax.random.bernoulli`` outside the
    kernel — identical semantics to the XLA path's ``nn.Dropout`` and
    byte-exact testable against it), scaled by 1/(1−p);
  * any C divisible by nhead (Mosaic pads the lane axis; C=32/64 of the
    supervised config of record included) — the C%128 gate is gone.

Per-head math uses CHANNEL MASKS instead of per-head lane reshapes (the TPU
vector layout cannot reshape/transpose the lane axis):

    ctx = Σ_h drop(softmax((q·m_h) kᵀ / √hd)) @ (v·m_h)

which is exactly multi-head attention (cross-head products are zeroed by
the mask; masked context slices sum disjointly). Only elementwise masks +
single-batch-dim ``dot_general`` — everything stays in VMEM / on the MXU.

Matches the reference's column attention semantics
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


def _head_mask(h, hd, c):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    return ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(jnp.float32)


def _qkv(x, wqkv, bqkv, bt, s, c):
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # [BT*S, C] -> [BT, S, C]: splits the sublane (row) axis only
    return q.reshape(bt, s, c), k.reshape(bt, s, c), v.reshape(bt, s, c)


def _attention_math(x, wqkv, bqkv, wout, bout, bt, s, c, nhead,
                    keep=None, inv_keep=1.0):
    """Attention on a [BT*S, C] tile; ``keep`` is an optional
    [BT, nhead*S, S] dropout keep-mask (float 0/1)."""
    hd = c // nhead
    q, k, v = _qkv(x, wqkv, bqkv, bt, s, c)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    ctx = jnp.zeros((bt, s, c), jnp.float32)
    for h in range(nhead):
        m_h = _head_mask(h, hd, c)
        logits = jax.lax.dot_general(
            q * m_h, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [BT, S, S]
        attn = jax.nn.softmax(logits, axis=-1)
        if keep is not None:
            attn = attn * keep[:, h * s:(h + 1) * s, :] * inv_keep
        ctx = ctx + jax.lax.dot_general(
            attn, v * m_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    ctx = ctx.reshape(bt * s, c)
    return jnp.dot(ctx, wout, preferred_element_type=jnp.float32) + bout


def _attention_bwd_math(x, do, wqkv, bqkv, wout, bt, s, c, nhead,
                        keep=None, inv_keep=1.0):
    """Recompute-based backward for one tile.

    Returns (dx [BT*S, C], dwqkv, dbqkv, dwout, dbout) — the weight grads
    are this tile's PARTIAL contributions."""
    hd = c // nhead
    q, k, v = _qkv(x, wqkv, bqkv, bt, s, c)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    # dctx[r,c] = Σ_e do[r,e] wout[c,e] — contraction instead of wout.T
    # (lane-axis transposes are unsupported in the TPU vector layout)
    dctx = jax.lax.dot_general(
        do, wout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, s, c)
    ctx = jnp.zeros((bt, s, c), jnp.float32)
    dq = jnp.zeros((bt, s, c), jnp.float32)
    dk = jnp.zeros((bt, s, c), jnp.float32)
    dv = jnp.zeros((bt, s, c), jnp.float32)
    for h in range(nhead):
        m_h = _head_mask(h, hd, c)
        qh = q * m_h
        vh = v * m_h
        logits = jax.lax.dot_general(
            qh, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        if keep is not None:
            kp = keep[:, h * s:(h + 1) * s, :] * inv_keep
            attn_d = attn * kp
        else:
            attn_d = attn
        # forward context (for dwout)
        ctx = ctx + jax.lax.dot_general(
            attn_d, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dctx_h = dctx * m_h
        # dattn_d[b,i,j] = Σ_c dctx_h[b,i,c] vh[b,j,c]
        dattn_d = jax.lax.dot_general(
            dctx_h, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dv[b,j,c] = Σ_i attn_d[b,i,j] dctx_h[b,i,c]
        dv = dv + jax.lax.dot_general(
            attn_d, dctx_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dattn = dattn_d * kp if keep is not None else dattn_d
        # softmax vjp: ds = attn ⊙ (dattn − Σ_j attn ⊙ dattn)
        ds = attn * (dattn - jnp.sum(attn * dattn, axis=-1, keepdims=True))
        ds = ds * scale
        # dq_h[b,i,c] = Σ_j ds[b,i,j] k[b,j,c]   (masked: q entered masked)
        dq = dq + jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * m_h
        # dk[b,j,c] = Σ_i ds[b,i,j] qh[b,i,c]
        dk = dk + jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    ctx = ctx.reshape(bt * s, c)
    # dwout[c,e] = Σ_r ctx[r,c] do[r,e] ; dbout = Σ_r do
    dwout = jax.lax.dot_general(ctx, do, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbout = jnp.sum(do, axis=0, keepdims=True)
    dqkv = jnp.concatenate(
        [dq.reshape(bt * s, c), dk.reshape(bt * s, c),
         dv.reshape(bt * s, c)], axis=-1)
    dx = jax.lax.dot_general(dqkv, wqkv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dwqkv = jax.lax.dot_general(x, dqkv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    return dx, dwqkv, dbqkv, dwout, dbout


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, bt, s, c, nhead, inv_keep, has_mask):
    if has_mask:
        (x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, mask_ref,
         o_ref) = refs
        keep = mask_ref[:].astype(jnp.float32)
    else:
        x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, o_ref = refs
        keep = None
    o_ref[:] = _attention_math(
        x_ref[:], wqkv_ref[:], bqkv_ref[:], wout_ref[:], bout_ref[:],
        bt, s, c, nhead, keep, inv_keep).astype(o_ref.dtype)


def _bwd_kernel(*refs, bt, s, c, nhead, inv_keep, has_mask):
    if has_mask:
        (x_ref, do_ref, wqkv_ref, bqkv_ref, wout_ref, mask_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref) = refs
        keep = mask_ref[:].astype(jnp.float32)
    else:
        (x_ref, do_ref, wqkv_ref, bqkv_ref, wout_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref) = refs
        keep = None
    dx, dwqkv, dbqkv, dwout, dbout = _attention_bwd_math(
        x_ref[:], do_ref[:].astype(jnp.float32), wqkv_ref[:], bqkv_ref[:],
        wout_ref[:], bt, s, c, nhead, keep, inv_keep)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # weight grads accumulate across the (sequential) TPU grid
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    dwqkv_ref[:] += dwqkv.astype(dwqkv_ref.dtype)
    dbqkv_ref[:] += dbqkv.astype(dbqkv_ref.dtype)
    dwout_ref[:] += dwout.astype(dwout_ref.dtype)
    dbout_ref[:] += dbout.astype(dbout_ref.dtype)


def _pick_bt(B: int, S: int, block_rows: int) -> tuple[int, int]:
    """Choose a batch-tile size ``bt`` and padded batch ``Bp``.

    Mosaic requires the sublane (second-to-last) block dim to be divisible
    by 8 (or equal to the whole array dim); our blocks are [bt*S, C], so
    bt must be a multiple of 8/gcd(S, 8). The wrapper zero-pads the batch
    axis to ``Bp`` (a bt multiple); padded rows are sliced off the output
    and contribute nothing to gradients (their upstream ``do`` is zero)."""
    import math

    mult = 8 // math.gcd(S, 8)
    bt = max((min(block_rows, B) // mult) * mult, mult)
    Bp = ((B + bt - 1) // bt) * bt
    return bt, Bp


def _compiler_params(interpret):
    if _HAS_TPU_PALLAS and not (interpret is True):
        # unrolled per-head buffers push scoped VMEM past the 16M default
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
    return {}


@functools.lru_cache(maxsize=None)
def _make_attention(nhead: int, dropout_rate: float, block_rows: int,
                    interpret: bool):
    """custom_vjp-wrapped fused attention for a static config.

    Positional array args: (x [B,S,C], wqkv, bqkv, wout, bout,
    mask [B, nhead, S, S] bool or None-placeholder)."""
    has_mask = dropout_rate > 0.0
    inv_keep = 1.0 / (1.0 - dropout_rate) if has_mask else 1.0

    def fwd_call(x, wqkv, bqkv, wout, bout, mask):
        B, S, C = x.shape
        bt, Bp = _pick_bt(B, S, block_rows)
        grid = (Bp // bt,)
        x2 = x.reshape(B * S, C)
        if Bp != B:
            x2 = jnp.pad(x2, ((0, (Bp - B) * S), (0, 0)))
        kernel = functools.partial(_fwd_kernel, bt=bt, s=S, c=C,
                                   nhead=nhead, inv_keep=inv_keep,
                                   has_mask=has_mask)
        in_specs = [
            pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((3 * C,), lambda i: (0,)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ]
        args = [x2, wqkv, bqkv, wout, bout]
        if has_mask:
            in_specs.append(
                pl.BlockSpec((bt, nhead * S, S), lambda i: (i, 0, 0)))
            m2 = mask.reshape(B, nhead * S, S)
            if Bp != B:
                m2 = jnp.pad(m2, ((0, Bp - B), (0, 0), (0, 0)))
            args.append(m2)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bp * S, C), x.dtype),
            grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
            interpret=interpret, **_compiler_params(interpret),
        )(*args)
        return out[:B * S].reshape(B, S, C)

    def bwd_call(x, wqkv, bqkv, wout, mask, do):
        B, S, C = x.shape
        bt, Bp = _pick_bt(B, S, block_rows)
        grid = (Bp // bt,)
        kernel = functools.partial(_bwd_kernel, bt=bt, s=S, c=C,
                                   nhead=nhead, inv_keep=inv_keep,
                                   has_mask=has_mask)
        in_specs = [
            pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
            pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((3 * C,), lambda i: (0,)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
        ]
        x2, do2 = x.reshape(B * S, C), do.reshape(B * S, C)
        if Bp != B:
            pad = ((0, (Bp - B) * S), (0, 0))
            x2, do2 = jnp.pad(x2, pad), jnp.pad(do2, pad)
        args = [x2, do2, wqkv, bqkv, wout]
        if has_mask:
            in_specs.append(
                pl.BlockSpec((bt, nhead * S, S), lambda i: (i, 0, 0)))
            m2 = mask.reshape(B, nhead * S, S)
            if Bp != B:
                m2 = jnp.pad(m2, ((0, Bp - B), (0, 0), (0, 0)))
            args.append(m2)
        out_shapes = (
            jax.ShapeDtypeStruct((Bp * S, C), x.dtype),      # dx
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),   # dwqkv
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),   # dbqkv
            jax.ShapeDtypeStruct((C, C), jnp.float32),       # dwout
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # dbout
        )
        out_specs = (
            pl.BlockSpec((bt * S, C), lambda i: (i, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        )
        dx, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
            kernel, out_shape=out_shapes, grid=grid, in_specs=in_specs,
            out_specs=out_specs, interpret=interpret,
            **_compiler_params(interpret),
        )(*args)
        return (dx[:B * S].reshape(B, S, C), dwqkv, dbqkv.reshape(3 * C),
                dwout, dbout.reshape(C))

    @jax.custom_vjp
    def attention(x, wqkv, bqkv, wout, bout, mask):
        return fwd_call(x, wqkv, bqkv, wout, bout, mask)

    def attention_fwd(x, wqkv, bqkv, wout, bout, mask):
        o = fwd_call(x, wqkv, bqkv, wout, bout, mask)
        return o, (x, wqkv, bqkv, wout, mask)

    def attention_bwd(res, do):
        x, wqkv, bqkv, wout, mask = res
        dx, dwqkv, dbqkv, dwout, dbout = bwd_call(x, wqkv, bqkv, wout,
                                                  mask, do)
        return dx, dwqkv, dbqkv, dwout, dbout, None

    attention.defvjp(attention_fwd, attention_bwd)
    return attention


def fused_column_attention(x: jnp.ndarray, wqkv: jnp.ndarray,
                           bqkv: jnp.ndarray, wout: jnp.ndarray,
                           bout: jnp.ndarray, nhead: int,
                           drop_mask: jnp.ndarray | None = None,
                           dropout_rate: float = 0.0,
                           block_rows: int = 128,
                           interpret: bool = False) -> jnp.ndarray:
    """x: [B, S, C] → attention output [B, S, C]; differentiable
    (fused custom_vjp backward).

    ``drop_mask`` [B, nhead, S, S] bool keep-mask enables attention-prob
    dropout at ``dropout_rate`` (scaled 1/(1−p)); None = no dropout."""
    rate = float(dropout_rate) if drop_mask is not None else 0.0
    fn = _make_attention(int(nhead), rate, int(block_rows), bool(interpret))
    if drop_mask is None:
        B, S, _ = x.shape
        drop_mask = jnp.ones((B, nhead, S, S), jnp.bool_)  # unused
    return fn(x, wqkv, bqkv, wout, bout, drop_mask)


def reference_column_attention(x, wqkv, bqkv, wout, bout, nhead,
                               drop_mask=None, dropout_rate: float = 0.0):
    """Plain-XLA reference (same math, unfused, differentiable)."""
    B, S, C = x.shape
    keep = None
    inv_keep = 1.0
    if drop_mask is not None and dropout_rate > 0.0:
        keep = drop_mask.reshape(B, nhead * S, S).astype(jnp.float32)
        inv_keep = 1.0 / (1.0 - dropout_rate)
    return _attention_math(x.reshape(B * S, C), wqkv, bqkv, wout, bout,
                           B, S, C, nhead, keep, inv_keep).reshape(B, S, C)
