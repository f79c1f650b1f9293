"""Column-attention transformer blocks for tabular token sequences.

The reference builds its tabular path from ``torch.nn.TransformerEncoderLayer``
over ``[batch, num_cols+1, channels]`` token sequences with a prepended CLS
embedding (``src/nn/models/tabgnn.py:193-219``, ``fused.py:82-96``) and from
torch-frame's ``FTTransformerConvs`` backbone
(``src/nn/models/ft_transformer.py:90-92``).

TPU notes: the sequence axis is tiny (num_cols+1, e.g. 6 for AML) while the
batch axis is large, so attention here is a batched small-matmul problem —
implemented with einsum so XLA maps it onto the MXU and fuses the
elementwise tail; no flash-attention machinery is needed (SURVEY §5
long-context: sequence parallelism is structurally unnecessary).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiHeadSelfAttention(nn.Module):
    """Self-attention over the column-token axis.

    Two execution paths sharing one parameter set:
      * fused Pallas kernel (qkv → scores → softmax → context → out in one
        VMEM-resident program; :mod:`rmm_tpu.ops.pallas.column_attention`)
        when on TPU, dropout inactive, and C is lane-aligned;
      * plain XLA einsum path otherwise (and for the backward pass).
    """

    channels: int
    nhead: int
    dropout: float = 0.0
    use_pallas: str = "auto"   # auto | always | never

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        B, S, C = x.shape
        assert C % self.nhead == 0, "channels must divide nhead"
        hd = C // self.nhead
        wqkv = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                          (C, 3 * C))
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3 * C,))
        wout = self.param("out_kernel", nn.initializers.lecun_normal(),
                          (C, C))
        bout = self.param("out_bias", nn.initializers.zeros, (C,))

        dropout_active = (not deterministic) and self.dropout > 0.0
        # the kernel now covers TRAINING too: fused custom_vjp backward +
        # explicit bernoulli keep-mask for attention-prob dropout (identical
        # semantics to the nn.Dropout below), and any C divisible by nhead
        # (Mosaic pads the lane axis — the old C%128 gate is gone)
        import os
        kernel_ok = (self.use_pallas != "never"
                     and not os.environ.get("RMM_DISABLE_PALLAS")
                     and C % self.nhead == 0
                     # tiny head_dim: the head-expanded einsum path below
                     # wins. Round-5 on-chip A/B at the 131k-lane config
                     # of record (outputs/tpu/ab.json, tools/tpu_ab_run):
                     # einsum 1,055 rows/s vs kernel 430 — the kernel
                     # saves the [B,S,H,C] HBM intermediates (52% of the
                     # step per the trace) but its sequential grid of
                     # batched tiny (M=N=S, K=C) dots underuses the
                     # MXU/VPU by more than the traffic saved.
                     # RMM_FORCE_PALLAS reproduces the A/B.
                     and (hd >= 16 or os.environ.get("RMM_FORCE_PALLAS"))
                     and jax.default_backend() == "tpu")
        if self.use_pallas == "always" or kernel_ok:
            from ..ops.pallas.column_attention import fused_column_attention
            mask = None
            if dropout_active:
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout,
                    (B, self.nhead, S, S))
            return fused_column_attention(
                x, wqkv, bqkv, wout, bout, self.nhead, drop_mask=mask,
                dropout_rate=self.dropout if dropout_active else 0.0,
                # batch-tile rows per grid step (trace-time env knob for
                # the on-chip sweep; VMEM use scales with it)
                block_rows=int(os.environ.get("RMM_PALLAS_BLOCK_ROWS",
                                              128)))

        qkv = x @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if hd < 16:
            # Head-expanded layout for tiny head_dim (e.g. the supervised
            # config of record: C=32, nhead=8 -> head_dim=4). The canonical
            # [B,H,S,d] einsums contract over d=4 — 3% of the TPU's 128
            # lanes. Instead fold heads into the CONTRACTION: with
            # head-masked copies K'[b,(j,h),c] = k[b,j,c]·1[c∈head h],
            # scores become ONE [S,C]x[C,S·H] matmul per row (K=C lanes)
            # and the context ONE [S,S·H]x[S·H,C] matmul — identical math,
            # ~10x better lane utilization. (measured 40ms -> ~4ms/layer
            # fwd at 131k rows x 7 tokens x C=32 on v5e)
            hm = (jnp.arange(C) // hd)[None, :] == jnp.arange(
                self.nhead)[:, None]                      # [H, C]
            hm = hm.astype(x.dtype)
            # [B, S, H, C] -> [B, S·H, C]: plain 3-D batched matmuls only
            # (higher-rank einsums inside scan+grad stall the TPU compiler)
            kp = (k[:, :, None, :] * hm[None, None]).reshape(B, S * self.nhead, C)
            vp = (v[:, :, None, :] * hm[None, None]).reshape(B, S * self.nhead, C)
            logits = jnp.einsum("bic,bnc->bin", q, kp) / jnp.sqrt(hd)
            attn = nn.softmax(
                logits.reshape(B, S, S, self.nhead), axis=2)  # over j
            attn = nn.Dropout(self.dropout)(attn,
                                            deterministic=deterministic)
            out = jnp.einsum("bin,bnc->bic",
                             attn.reshape(B, S, S * self.nhead), vp)
            return out @ wout + bout

        def heads(t):
            return t.reshape(B, S, self.nhead, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        attn = nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, C)
        return out @ wout + bout


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer matching ``torch.nn.TransformerEncoderLayer``
    defaults (norm_first=False):
        x = norm1(x + dropout(attn(x)))
        x = norm2(x + dropout(linear2(dropout(act(linear1(x))))))
    """

    channels: int
    nhead: int
    feedforward_channels: Optional[int] = None
    dropout: float = 0.5
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        ff = self.feedforward_channels or self.channels
        attn = MultiHeadSelfAttention(self.channels, self.nhead, self.dropout,
                                      name="self_attn")(x, deterministic)
        x = nn.LayerNorm(name="norm1")(
            x + nn.Dropout(self.dropout)(attn, deterministic=deterministic))
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        h = nn.Dense(ff, name="linear1")(x)
        h = nn.Dropout(self.dropout)(act(h), deterministic=deterministic)
        h = nn.Dense(self.channels, name="linear2")(h)
        x = nn.LayerNorm(name="norm2")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))
        return x


class FTTransformerLayer(nn.Module):
    """Half-residual column-attention layer: ``(x + LN(encoder(x))) / 2``
    (reference ``FTTransformerLayer.forward``, ``tabgnn.py:216-219``)."""

    channels: int
    nhead: int = 8
    feedforward_channels: Optional[int] = None
    dropout: float = 0.5
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        conv = TransformerEncoderLayer(
            self.channels, self.nhead, self.feedforward_channels,
            self.dropout, self.activation, name="tab_conv")(x, deterministic)
        return (x + nn.LayerNorm(name="tab_norm")(conv)) / 2.0


class CLSToken(nn.Module):
    """Learned CLS embedding prepended to the column-token axis (reference
    ``cls_embedding``, ``tabgnn.py:57,116-122``; init std=0.01)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, S, C]
        cls = self.param("cls", nn.initializers.normal(0.01),
                         (self.channels,))
        B = x.shape[0]
        tok = jnp.broadcast_to(cls, (B, 1, self.channels))
        return jnp.concatenate([tok, x], axis=1)


class FTTransformerConvs(nn.Module):
    """Column-transformer backbone: CLS prepend → N encoder layers → split
    (feature tokens, CLS) — the torch-frame ``FTTransformerConvs`` surface
    the reference wraps (``src/nn/models/ft_transformer.py:90-92,126-138``).
    """

    channels: int
    num_layers: int
    nhead: int = 8
    dropout: float = 0.2
    feedforward_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        x = CLSToken(self.channels, name="cls_token")(x)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.channels, self.nhead, self.feedforward_channels,
                self.dropout, name=f"layer_{i}")(x, deterministic)
        x = nn.LayerNorm(name="final_norm")(x)
        return x[:, 1:], x[:, 0]
