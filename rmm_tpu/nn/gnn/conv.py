"""Message-passing convolutions over padded static-shape subgraphs.

Rebuilds the torch_geometric convolution surface the reference depends on
(SURVEY §2.2 N3): ``PNAConv`` (towers=1, pre_layers=1, post_layers=1,
divide_input=False — the exact configuration used everywhere, e.g.
``src/nn/models/tabgnn.py:161-169``), the bidirectional ``PNAConvHetero`` /
``GINEConvHetero`` reverse-MP wrappers (``src/nn/gnn/pna.py:17-46``,
``gine.py:16-35``), ``GINEConv``, and the custom ``TGINEConv``
(``src/nn/gnn/conv/tgine_conv.py``).

Messages are computed per padded edge lane and reduced with the masked
segment ops in :mod:`rmm_tpu.ops.segment`; invalid lanes never contribute.
Edge gathers/scatters are XLA gather/scatter — fully fused under jit.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.segment import pna_aggregate, segment_sum


class PNAConv(nn.Module):
    """Principal Neighbourhood Aggregation convolution.

    message  m_e = pre_nn([x_dst_e, x_src_e, edge_enc(edge_attr_e)])
    aggregate    = [mean|min|max|std] × [id|amp|atten] → [N, 12F]
                   (PyG aggregator order, ``src/nn/gnn/pna.py:60-61``)
    update   out = lin(post_nn([x, agg]))
    matching PyG ``PNAConv`` with the reference's configuration.
    ``avg_log_deg`` comes from the train-graph in-degree histogram
    (``utils.py:179-182`` + PyG avg_deg['log']).
    """

    channels: int
    avg_log_deg: float

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None):
        F = self.channels
        src, dst = edge_index[0], edge_index[1]
        e = nn.Dense(F, name="edge_encoder")(edge_attr)
        h = jnp.concatenate([x[dst], x[src], e], axis=-1)  # [E, 3F]
        m = nn.Dense(F, name="pre_nn")(h)
        agg = pna_aggregate(m, dst, x.shape[0], self.avg_log_deg, edge_mask)
        out = jnp.concatenate([x, agg], axis=-1)  # [N, 13F]
        out = nn.Dense(F, name="post_nn")(out)
        return nn.Dense(F, name="lin")(out)


class PNAConvHetero(nn.Module):
    """Bidirectional PNA ("reverse MP"): forward conv on (src→dst), backward
    conv on flipped edges, merge lin([x, a_in, a_out])
    (``src/nn/gnn/pna.py:17-46``)."""

    channels: int
    avg_log_deg: float

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None):
        a_in = PNAConv(self.channels, self.avg_log_deg, name="conv_forw")(
            x, edge_index, edge_attr, edge_mask)
        flipped = jnp.stack([edge_index[1], edge_index[0]])
        a_out = PNAConv(self.channels, self.avg_log_deg, name="conv_back")(
            x, flipped, edge_attr, edge_mask)
        return nn.Dense(self.channels, name="lin")(
            jnp.concatenate([x, a_in, a_out], axis=-1))


class GINEConv(nn.Module):
    """GIN-E: out = nn((1+eps)·x + Σ_e relu(x_src_e + lin(edge_attr_e)))
    (PyG GINEConv as used at ``src/nn/gnn/gine.py:62-67``)."""

    channels: int
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None):
        F = self.channels
        src, dst = edge_index[0], edge_index[1]
        e = nn.Dense(F, name="edge_lin")(edge_attr)
        msg = nn.relu(x[src] + e)
        agg = segment_sum(msg, dst, x.shape[0], edge_mask)
        if self.train_eps:
            eps = self.param("eps", nn.initializers.zeros, ())
        else:
            eps = 0.0
        h = (1.0 + eps) * x + agg
        h = nn.Dense(F, name="nn_0")(h)
        h = nn.relu(h)
        return nn.Dense(F, name="nn_1")(h)


class GINEConvHetero(nn.Module):
    """Bidirectional GINE + merge (``src/nn/gnn/gine.py:16-35``)."""

    channels: int

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None):
        a_in = GINEConv(self.channels, name="conv_forw")(
            x, edge_index, edge_attr, edge_mask)
        flipped = jnp.stack([edge_index[1], edge_index[0]])
        a_out = GINEConv(self.channels, name="conv_back")(
            x, flipped, edge_attr, edge_mask)
        return nn.Dense(self.channels, name="lin")(
            jnp.concatenate([x, a_in, a_out], axis=-1))


class TGINEConv(nn.Module):
    """GINE variant over multi-block edge features: the edge attribute is
    passed through a chain of per-block linears then averaged, message =
    relu(x_src + e) (``src/nn/gnn/conv/tgine_conv.py:18-81``)."""

    channels: int
    edge_dims: Sequence[int]
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask=None):
        F = self.channels
        src, dst = edge_index[0], edge_index[1]
        e = edge_attr
        for i, _ in enumerate(self.edge_dims):
            e = nn.Dense(F, name=f"lin_{i}")(e)
        e = e / float(len(self.edge_dims))
        msg = nn.relu(x[src] + e)
        agg = segment_sum(msg, dst, x.shape[0], edge_mask)
        if self.train_eps:
            eps = self.param("eps", nn.initializers.zeros, ())
        else:
            eps = 0.0
        h = (1.0 + eps) * x + agg
        h = nn.Dense(F, name="nn_0")(h)
        h = nn.relu(h)
        return nn.Dense(F, name="nn_1")(h)


class EdgeUpdateMLP(nn.Module):
    """Edge-update MLP: Linear(3F→F) → ReLU → Linear(F→F) over
    [x_src, x_dst, edge_attr] (the ``emlps`` of ``pna.py:81-85`` and the
    ``gnn_edge_update`` of ``tabgnn.py:172-176``)."""

    channels: int

    @nn.compact
    def __call__(self, x, edge_index, edge_attr):
        src, dst = edge_index[0], edge_index[1]
        h = jnp.concatenate([x[src], x[dst], edge_attr], axis=-1)
        h = nn.Dense(self.channels, name="lin1")(h)
        h = nn.relu(h)
        return nn.Dense(self.channels, name="lin2")(h)
