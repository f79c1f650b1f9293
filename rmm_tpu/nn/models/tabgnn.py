"""TABGNN: stacked column-transformer → PNA message passing.

Rebuilds ``src/nn/models/tabgnn.py``: CLS-prepended column attention over the
node AND edge token tables through a *shared* layer stack, half-residual
merge, flatten+project into GNN width, then PNA layers with edge-update
MLPs. All reference formula idioms preserved:

  tabular layer:   x ← (x + LN(encoder(x))) / 2            (tabgnn.py:216-219)
  stack residual:  x ← (x_in + x_stack) / 2                (tabgnn.py:129-131)
  PNA layer:       x ← (x + relu(BN(conv))) / 2,
                   ea ← ea + EMLP([x_s, x_d, ea]) / 2      (tabgnn.py:185-188)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..norms import MaskedBatchNorm
from ..transformer import CLSToken, FTTransformerLayer
from ..gnn.conv import EdgeUpdateMLP, PNAConv, PNAConvHetero


class PNALayer(nn.Module):
    """(conv + BN + half-residual) node update, half-EMLP edge update
    (``tabgnn.py:153-191``)."""

    nhidden: int = 128
    avg_log_deg: float = 1.0
    reverse_mp: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        cls = PNAConvHetero if self.reverse_mp else PNAConv
        h = cls(self.nhidden, self.avg_log_deg, name="gnn_conv")(
            x, edge_index, edge_attr, edge_mask)
        h = MaskedBatchNorm(self.nhidden, name="gnn_norm")(h, node_mask,
                                                           train)
        x = (x + nn.relu(h)) / 2.0
        upd = EdgeUpdateMLP(self.nhidden, name="gnn_edge_update")(
            x, edge_index, edge_attr)
        edge_attr = edge_attr + upd / 2.0
        return x, edge_attr


class TABGNN(nn.Module):
    channels: int
    num_layers: int
    nhidden: int = 128
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    nhead: int = 8
    dropout: float = 0.5
    feedforward_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        """x: [V, n_node_cols, C] node tokens; edge_attr: [E, n_edge_cols, C].

        Returns (x_gnn [V, nhidden], edge_attr_gnn [E, nhidden]).
        """
        det = not train
        cls = CLSToken(self.channels, name="cls_embedding")
        x = cls(x)
        edge_attr = cls(edge_attr)

        t_x, t_e = x, edge_attr
        for i in range(self.num_layers):
            layer = FTTransformerLayer(
                self.channels, self.nhead, self.feedforward_channels,
                self.dropout, name=f"tab_layer_{i}")
            t_x = layer(t_x, det)       # shared weights across node/edge
            t_e = layer(t_e, det)       # tables (tabgnn.py:124-127)
        x = (x + t_x) / 2.0
        edge_attr = (edge_attr + t_e) / 2.0

        x = nn.Dense(self.nhidden, name="node_emb")(
            x.reshape(x.shape[0], -1))
        edge_attr = nn.Dense(self.nhidden, name="edge_emb")(
            edge_attr.reshape(edge_attr.shape[0], -1))

        for i in range(self.num_layers):
            x, edge_attr = PNALayer(
                self.nhidden, self.avg_log_deg, self.reverse_mp,
                name=f"gnn_layer_{i}")(
                x, edge_index, edge_attr, edge_mask, node_mask, train)
        return x, edge_attr
