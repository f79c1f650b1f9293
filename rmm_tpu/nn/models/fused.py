"""TABGNNFused: per-layer fusion of column attention and PNA message
passing with scatter-mean pooling back into node states.

Rebuilds ``src/nn/models/fused.py``. The in-layer pooling
(unique → index_add_ → bincount, ``fused.py:256-268``) becomes the
unique-free masked ``scatter_mean_update`` segment op (SURVEY §7 hard part
5), which jits and shards cleanly.

Formula idioms preserved exactly, including the reference's asymmetric
parenthesization in the fused layer's tabular update
(``x_tab + LN(conv(x_tab)) / 2`` — the LN term alone is halved,
``fused.py:232``):

  top-level target path:  t ← LN(conv(CLS∥t))                 (fused.py:157-159)
  top-level edge path:    e ← (e + LN(conv(CLS∥e))) / 2       (fused.py:161-164)
  layer tabular:          x_tab ← x_tab + LN(conv(x_tab)) / 2 (fused.py:232)
  layer node:             x ← (x + relu(BN(conv))) / 2        (fused.py:235)
  layer edge:             ea ← (ea + EMLP([xs, xd, ea])) / 2  (fused.py:237)
  fuse (non-LP):          z = [cls, x_s, x_d]; z ← (z + LN(fuse(z))) / 2;
                          cls ← (cls + z[:, :C]) / 2;
                          x_gnn[touched] ← (x_gnn + mean-pool)/2
                                                            (fused.py:239-268)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.segment import scatter_mean_update
from ..norms import MaskedBatchNorm
from ..transformer import CLSToken, TransformerEncoderLayer
from ..gnn.conv import EdgeUpdateMLP, PNAConv, PNAConvHetero


class FuseMLP(nn.Module):
    """LN → Linear(d→4d) LeakyReLU Drop → Linear(4d→4d) LeakyReLU Drop →
    Linear(4d→d) (``fused.py:241-250``)."""

    dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        h = nn.LayerNorm(name="norm")(z)
        h = nn.leaky_relu(nn.Dense(4 * self.dim, name="fc1")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.leaky_relu(nn.Dense(4 * self.dim, name="fc2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, name="fc3")(h)


class FTTransformerPNAFusedLayer(nn.Module):
    channels: int
    nhidden: int = 128
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    nhead: int = 8
    dropout: float = 0.5
    feedforward_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x_tab, x_gnn, edge_index, edge_attr,
                 target_edge_index, lp: bool = False, edge_mask=None,
                 node_mask=None, train: bool = False):
        det = not train
        conv = TransformerEncoderLayer(
            self.channels, self.nhead, self.feedforward_channels,
            self.dropout, name="tab_conv")(x_tab, det)
        x_tab = x_tab + nn.LayerNorm(name="tab_norm")(conv) / 2.0
        x_tab_cls, x_tab_feat = x_tab[:, 0, :], x_tab[:, 1:, :]

        cls = PNAConvHetero if self.reverse_mp else PNAConv
        h = cls(self.nhidden, self.avg_log_deg, name="gnn_conv")(
            x_gnn, edge_index, edge_attr, edge_mask)
        h = MaskedBatchNorm(self.nhidden, name="gnn_norm")(h, node_mask,
                                                           train)
        x_gnn = (x_gnn + nn.relu(h)) / 2.0
        upd = EdgeUpdateMLP(self.nhidden, name="gnn_edge_update")(
            x_gnn, edge_index, edge_attr)
        edge_attr = (edge_attr + upd) / 2.0

        if not lp:
            fused_dim = self.channels + 2 * self.nhidden
            z = jnp.concatenate(
                [x_tab_cls, x_gnn[target_edge_index[0]],
                 x_gnn[target_edge_index[1]]], axis=-1)
            f = FuseMLP(fused_dim, self.dropout, name="fuse")(z, det)
            z = (z + nn.LayerNorm(name="fuse_norm")(f)) / 2.0
            x_tab_cls = (x_tab_cls + z[:, : self.channels]) / 2.0
            x_tab = jnp.concatenate([x_tab_cls[:, None, :], x_tab_feat],
                                    axis=1)
            # pool the src/dst slices of z back into node states (mean over
            # occurrences, then half-residual) — fused.py:256-268
            index = jnp.concatenate([target_edge_index[0],
                                     target_edge_index[1]])
            emb = jnp.concatenate(
                [z[:, self.channels : self.channels + self.nhidden],
                 z[:, self.channels + self.nhidden :]], axis=0)
            x_gnn = scatter_mean_update(x_gnn, index, emb)
        return x_tab, x_gnn, edge_attr


class _FusedLayerScanBody(nn.Module):
    """``nn.scan`` body wrapping one fused layer: carry =
    (x_tab, x_gnn, edge_attr); the graph topology/masks broadcast across
    steps. Used when ``TABGNNFused.scan_layers`` — the traced program then
    contains ONE layer body instead of ``num_layers`` unrolled copies,
    which is what keeps the C=128/3-layer SSL step's StableHLO small
    enough for memory-bounded AOT compile services."""

    channels: int
    nhidden: int
    avg_log_deg: float
    reverse_mp: bool
    nhead: int
    dropout: float
    feedforward_channels: Optional[int]
    lp: bool
    train: bool

    @nn.compact
    def __call__(self, carry, edge_index, target_edge_index, edge_mask,
                 node_mask):
        x_tab, x_gnn, edge_attr = carry
        out = FTTransformerPNAFusedLayer(
            self.channels, self.nhidden, self.avg_log_deg, self.reverse_mp,
            self.nhead, self.dropout, self.feedforward_channels,
            name="layer")(
            x_tab, x_gnn, edge_index, edge_attr, target_edge_index,
            self.lp, edge_mask, node_mask, self.train)
        # scan requires stable carry dtypes: f32 params promote bf16
        # activations inside the layer, so cast back. (The unrolled path
        # silently promotes to f32 after layer 1; under precision=bf16 the
        # scanned stack keeps activations bf16 across ALL layers — the
        # MXU-native behavior the flag asks for.)
        out = tuple(o.astype(c.dtype) for o, c in zip(out, carry))
        return out, None


class TABGNNFused(nn.Module):
    channels: int
    num_layers: int
    node_dim: int = 1
    nhidden: int = 128
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    nhead: int = 8
    dropout: float = 0.5
    feedforward_channels: Optional[int] = None
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, target_edge_index,
                 target_edge_attr, lp: bool = False, edge_mask=None,
                 node_mask=None, train: bool = False):
        """x: [V, node_dim] flattened node features; edge_attr:
        [E, n_cols, C] neighbor-edge tokens; target_edge_attr: [B, n_cols, C].

        Returns (x_gnn [V, nhidden], edge_attr [E, nhidden],
        target_edge_attr [B, nhidden]).
        """
        det = not train
        x_gnn = nn.Dense(self.nhidden, name="node_emb")(
            x.reshape(x.shape[0], -1))

        cls = CLSToken(self.channels, name="cls_embedding")
        conv = TransformerEncoderLayer(
            self.channels, self.nhead, self.feedforward_channels,
            self.dropout, name="tab_conv")
        norm = nn.LayerNorm(name="tab_norm")
        edge_emb = nn.Dense(self.nhidden, name="edge_emb")

        target_edge_attr = cls(target_edge_attr)
        target_edge_attr = norm(conv(target_edge_attr, det))

        edge_attr = cls(edge_attr)
        edge_attr = (edge_attr + norm(conv(edge_attr, det))) / 2.0
        edge_attr = edge_emb(edge_attr.reshape(edge_attr.shape[0], -1))

        x_tab = target_edge_attr
        if self.scan_layers:
            scanned = nn.scan(
                _FusedLayerScanBody,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers,
            )(self.channels, self.nhidden, self.avg_log_deg,
              self.reverse_mp, self.nhead, self.dropout,
              self.feedforward_channels, lp, train, name="layers")
            (x_tab, x_gnn, edge_attr), _ = scanned(
                (x_tab, x_gnn, edge_attr), edge_index, target_edge_index,
                edge_mask, node_mask)
        else:
            for i in range(self.num_layers):
                x_tab, x_gnn, edge_attr = FTTransformerPNAFusedLayer(
                    self.channels, self.nhidden, self.avg_log_deg,
                    self.reverse_mp, self.nhead, self.dropout,
                    self.feedforward_channels, name=f"layer_{i}")(
                    x_tab, x_gnn, edge_index, edge_attr, target_edge_index,
                    lp, edge_mask, node_mask, train)

        target_edge_attr = (x_tab + target_edge_attr) / 2.0
        target_edge_attr = edge_emb(
            target_edge_attr.reshape(target_edge_attr.shape[0], -1))
        return x_gnn, edge_attr, target_edge_attr


def stack_fused_layers(tree: dict, num_layers: int) -> dict:
    """Convert an unrolled TABGNNFused variable subtree
    (``layer_0`` … ``layer_{N-1}``) to the ``scan_layers`` layout
    (``layers/layer`` with a stacked leading axis). Works on either the
    ``params`` or ``batch_stats`` collection; lets checkpoints saved from
    an unrolled model load into a scanned one."""
    out = {k: v for k, v in tree.items() if not k.startswith("layer_")}
    per = [tree[f"layer_{i}"] for i in range(num_layers)]
    out["layers"] = {"layer": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per)}
    return out


def unstack_fused_layers(tree: dict) -> dict:
    """Inverse of :func:`stack_fused_layers`."""
    out = {k: v for k, v in tree.items() if k != "layers"}
    stacked = tree["layers"]["layer"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"layer_{i}"] = jax.tree_util.tree_map(lambda x, i=i: x[i],
                                                   stacked)
    return out
