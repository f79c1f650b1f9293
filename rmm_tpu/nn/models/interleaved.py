"""TABGNNInterleaved: column attention and PNA interleaved per layer
through the edge CLS token.

Rebuilds ``src/nn/models/inteleaved.py``: each layer runs column attention
over the edge token sequence, takes the CLS state as the edge feature for a
PNA conv + edge-update, and writes the updated CLS back into the sequence.
Formula idioms preserved, including the reference's halved-LN-term update
(``ea + LN(conv(ea)) / 2``, ``inteleaved.py:218``).

Requires ``channels == nhidden`` (the only configuration the reference ever
instantiates: ``utils.py:314-321`` passes n_hidden for both).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..norms import MaskedBatchNorm
from ..transformer import CLSToken, TransformerEncoderLayer
from ..gnn.conv import EdgeUpdateMLP, PNAConv, PNAConvHetero


class FTTransformerPNAInterleavedLayer(nn.Module):
    channels: int
    nhidden: int = 128
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    nhead: int = 8
    dropout: float = 0.5
    feedforward_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x_gnn, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        det = not train
        conv = TransformerEncoderLayer(
            self.channels, self.nhead, self.feedforward_channels,
            self.dropout, name="tab_conv")(edge_attr, det)
        edge_attr = edge_attr + nn.LayerNorm(name="tab_norm")(conv) / 2.0
        ea_cls, ea_feat = edge_attr[:, 0, :], edge_attr[:, 1:, :]

        cls = PNAConvHetero if self.reverse_mp else PNAConv
        h = cls(self.nhidden, self.avg_log_deg, name="gnn_conv")(
            x_gnn, edge_index, ea_cls, edge_mask)
        h = MaskedBatchNorm(self.nhidden, name="gnn_norm")(h, node_mask,
                                                           train)
        x_gnn = (x_gnn + nn.relu(h)) / 2.0
        upd = EdgeUpdateMLP(self.nhidden, name="gnn_edge_update")(
            x_gnn, edge_index, ea_cls)
        ea_cls = (ea_cls + upd) / 2.0
        edge_attr = jnp.concatenate([ea_cls[:, None, :], ea_feat], axis=1)
        return x_gnn, edge_attr


class TABGNNInterleaved(nn.Module):
    channels: int
    num_layers: int
    node_dim: int = 1
    nhidden: int = 128
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    nhead: int = 8
    dropout: float = 0.5
    feedforward_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        """x: [V, node_dim] flattened node features; edge_attr:
        [E, n_cols, C] edge tokens. Returns (x_gnn [V, nhidden],
        x_edge [E, C] — the final CLS state per edge)."""
        assert self.channels == self.nhidden, \
            "interleaved model requires channels == nhidden"
        det = not train
        x_gnn = nn.Dense(self.nhidden, name="node_emb")(
            x.reshape(x.shape[0], -1))

        edge_attr = CLSToken(self.channels, name="cls_embedding")(edge_attr)
        conv = TransformerEncoderLayer(
            self.channels, self.nhead, self.feedforward_channels,
            self.dropout, name="tab_conv")(edge_attr, det)
        edge_attr = (edge_attr + nn.LayerNorm(name="tab_norm")(conv)) / 2.0

        e_attr = edge_attr
        for i in range(self.num_layers):
            x_gnn, e_attr = FTTransformerPNAInterleavedLayer(
                self.channels, self.nhidden, self.avg_log_deg,
                self.reverse_mp, self.nhead, self.dropout,
                self.feedforward_channels, name=f"layer_{i}")(
                x_gnn, edge_index, e_attr, edge_mask, node_mask, train)

        edge_attr = (e_attr + edge_attr) / 2.0
        return x_gnn, edge_attr[:, 0, :]
