"""Pure-GNN backbone stacks: GINe, PNAS/PNA, CPNA, CPNATAB.

Rebuilds ``src/nn/gnn/gine.py`` / ``src/nn/gnn/pna.py`` as linen modules over
padded subgraphs. Shared idioms preserved from the reference:
  * node update   x  ← (x + relu(BN(conv(x, e)))) / 2
  * edge update   ea ← ea + EMLP([x_src, x_dst, ea]) / 2   (``pna.py:99-101``)
  * per-column conv stacks in CPNA (one conv chain per edge-table column,
    ``pna.py:215-231``), plus row-attention layers in CPNATAB
    (``pna.py:286-303``).
"""
from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from ..norms import MaskedBatchNorm
from ..transformer import TransformerEncoderLayer
from .conv import (
    EdgeUpdateMLP,
    GINEConv,
    GINEConvHetero,
    PNAConv,
    PNAConvHetero,
)


def _make_conv(model: str, channels: int, avg_log_deg: float, reverse_mp: bool,
               name: str):
    if model == "pna":
        cls = PNAConvHetero if reverse_mp else PNAConv
        return cls(channels, avg_log_deg, name=name)
    if model == "gine":
        cls = GINEConvHetero if reverse_mp else GINEConv
        return cls(channels, name=name)
    raise ValueError(model)


class GINe(nn.Module):
    """GINE stack (``src/nn/gnn/gine.py:37-91``)."""

    n_hidden: int = 100
    num_gnn_layers: int = 2
    edge_updates: bool = False
    reverse_mp: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        x = nn.Dense(self.n_hidden, name="node_emb")(
            x.reshape(x.shape[0], -1))
        edge_attr = nn.Dense(self.n_hidden, name="edge_emb")(
            edge_attr.reshape(edge_attr.shape[0], -1))
        for i in range(self.num_gnn_layers):
            conv = _make_conv("gine", self.n_hidden, 0.0, self.reverse_mp,
                              f"conv_{i}")
            h = conv(x, edge_index, edge_attr, edge_mask)
            h = MaskedBatchNorm(self.n_hidden, name=f"bn_{i}")(
                h, node_mask, train)
            x = (x + nn.relu(h)) / 2.0
            if self.edge_updates:
                upd = EdgeUpdateMLP(self.n_hidden, name=f"emlp_{i}")(
                    x, edge_index, edge_attr)
                edge_attr = edge_attr + upd / 2.0
        return x, edge_attr


class PNAS(nn.Module):
    """PNA stack over flattened column embeddings
    (``src/nn/gnn/pna.py:48-101``)."""

    n_hidden: int = 128
    num_gnn_layers: int = 2
    avg_log_deg: float = 1.0
    edge_updates: bool = True
    reverse_mp: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        x = nn.Dense(self.n_hidden, name="node_emb")(
            x.reshape(x.shape[0], -1))
        edge_attr = nn.Dense(self.n_hidden, name="edge_emb")(
            edge_attr.reshape(edge_attr.shape[0], -1))
        for i in range(self.num_gnn_layers):
            conv = _make_conv("pna", self.n_hidden, self.avg_log_deg,
                              self.reverse_mp, f"conv_{i}")
            h = conv(x, edge_index, edge_attr, edge_mask)
            h = MaskedBatchNorm(self.n_hidden, name=f"bn_{i}")(
                h, node_mask, train)
            x = (x + nn.relu(h)) / 2.0
            if self.edge_updates:
                upd = EdgeUpdateMLP(self.n_hidden, name=f"emlp_{i}")(
                    x, edge_index, edge_attr)
                edge_attr = edge_attr + upd / 2.0
        return x, edge_attr


class PNA(nn.Module):
    """PNA stack that also projects a separate target-edge table
    (``src/nn/gnn/pna.py:103-158``)."""

    n_hidden: int = 128
    num_gnn_layers: int = 2
    avg_log_deg: float = 1.0
    edge_updates: bool = True
    reverse_mp: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, target_edge_attr,
                 edge_mask=None, node_mask=None, train: bool = False):
        x = nn.Dense(self.n_hidden, name="node_emb")(x)
        edge_emb = nn.Dense(self.n_hidden, name="edge_emb")
        edge_attr = edge_emb(edge_attr)
        target_edge_attr = edge_emb(target_edge_attr)
        for i in range(self.num_gnn_layers):
            conv = _make_conv("pna", self.n_hidden, self.avg_log_deg,
                              self.reverse_mp, f"conv_{i}")
            h = conv(x, edge_index, edge_attr, edge_mask)
            h = MaskedBatchNorm(self.n_hidden, name=f"bn_{i}")(
                h, node_mask, train)
            x = (x + nn.relu(h)) / 2.0
            if self.edge_updates:
                upd = EdgeUpdateMLP(self.n_hidden, name=f"emlp_{i}")(
                    x, edge_index, edge_attr)
                edge_attr = edge_attr + upd / 2.0
        return x, edge_attr, target_edge_attr


class CPNA(nn.Module):
    """Column-wise PNA: one conv stack per edge-table column, each column's
    [E, F] block message-passed separately and written back
    (``src/nn/gnn/pna.py:164-231``)."""

    n_hidden: int = 128
    num_gnn_layers: int = 2
    num_cols: int = 1
    avg_log_deg: float = 1.0
    edge_updates: bool = True
    reverse_mp: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        # edge_attr: [E, num_cols, F]
        x = nn.Dense(self.n_hidden, name="node_emb")(
            x.reshape(x.shape[0], -1))
        cols = []
        for c in range(self.num_cols):
            col_attr = edge_attr[:, c, :]
            for i in range(self.num_gnn_layers):
                conv = _make_conv("pna", self.n_hidden, self.avg_log_deg,
                                  self.reverse_mp, f"conv_{c}_{i}")
                h = conv(x, edge_index, col_attr, edge_mask)
                h = MaskedBatchNorm(self.n_hidden, name=f"bn_{c}_{i}")(
                    h, node_mask, train)
                x = (x + nn.relu(h)) / 2.0
                if self.edge_updates:
                    upd = EdgeUpdateMLP(self.n_hidden, name=f"emlp_{c}_{i}")(
                        x, edge_index, col_attr)
                    col_attr = col_attr + upd / 2.0
            cols.append(col_attr)
        edge_attr = jnp.stack(cols, axis=1)
        return x, edge_attr


class CPNATAB(nn.Module):
    """CPNA + row-attention transformer layers over the column axis after
    the per-column message passing (``src/nn/gnn/pna.py:233-303``)."""

    n_hidden: int = 128
    num_gnn_layers: int = 2
    num_cols: int = 1
    avg_log_deg: float = 1.0
    edge_updates: bool = True
    reverse_mp: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None,
                 node_mask=None, train: bool = False):
        x, edge_attr = CPNA(self.n_hidden, self.num_gnn_layers, self.num_cols,
                            self.avg_log_deg, self.edge_updates,
                            self.reverse_mp, name="cpna")(
            x, edge_index, edge_attr, edge_mask, node_mask, train)
        for i in range(self.num_gnn_layers):
            att = TransformerEncoderLayer(self.n_hidden, nhead=8,
                                          dropout=self.dropout,
                                          name=f"row_att_{i}")(
                edge_attr, deterministic=not train)
            edge_attr = (edge_attr
                         + nn.LayerNorm(name=f"row_norm_{i}")(att)) / 2.0
        return x, edge_attr
