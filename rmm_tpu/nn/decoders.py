"""Task heads / decoders.

Rebuilds ``src/nn/gnn/decoder.py`` (classification + link prediction heads)
and ``src/nn/decoder/`` (supervised + self-supervised MCM/MV heads) as linen
modules. Architectural choices (layer widths 50/25, σ on LP outputs, the
``w`` width multiplier on MCMHead) mirror the reference so checkpoints and
metrics are comparable.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _MLP50(nn.Module):
    """Linear(in→50) ReLU Dropout Linear(50→25) ReLU Dropout Linear(25→C)
    — the classifier trunk of ``decoder.py:14-21,29-31``."""

    n_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.relu(nn.Dense(50, name="fc1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(25, name="fc2")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.n_classes, name="fc3")(x)


class ClassifierHead(nn.Module):
    """Edge classification: relu([x_src, x_dst]) ∥ edge_attr → MLP
    (``src/nn/gnn/decoder.py:5-21``)."""

    n_classes: int = 1
    n_hidden: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, deterministic: bool = True):
        pair = jnp.concatenate([x[edge_index[0]], x[edge_index[1]]], axis=-1)
        h = jnp.concatenate(
            [nn.relu(pair), edge_attr.reshape(edge_attr.shape[0], -1)],
            axis=-1)
        return _MLP50(self.n_classes, self.dropout, name="mlp")(
            h, deterministic)


class NodeClassificationHead(nn.Module):
    """Node classification MLP (``decoder.py:23-32``)."""

    n_classes: int = 1
    n_hidden: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return _MLP50(self.n_classes, self.dropout, name="mlp")(
            x, deterministic)


class _LPTrunk(nn.Module):
    """Linear(3F→F) ReLU Drop Linear(F→25) ReLU Drop Linear(25→C), σ
    (``decoder.py:47-58``)."""

    n_classes: int
    n_hidden: int
    dropout: float

    @nn.compact
    def __call__(self, h, deterministic: bool = True):
        h = nn.relu(nn.Dense(self.n_hidden, name="fc1")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.relu(nn.Dense(25, name="fc2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.sigmoid(nn.Dense(self.n_classes, name="fc3")(h))


class LinkPredHead(nn.Module):
    """Link prediction head on (pos, neg) edge sets
    (``decoder.py:34-71``)."""

    n_classes: int = 1
    n_hidden: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, pos_edge_index, pos_edge_attr, neg_edge_index,
                 neg_edge_attr, deterministic: bool = True):
        trunk = _LPTrunk(self.n_classes, self.n_hidden, self.dropout,
                         name="mlp")

        def feats(ei, ea):
            pair = nn.relu(
                jnp.concatenate([x[ei[0]], x[ei[1]]], axis=-1))
            return jnp.concatenate([pair, ea.reshape(ea.shape[0], -1)],
                                   axis=-1)

        return (trunk(feats(pos_edge_index, pos_edge_attr), deterministic),
                trunk(feats(neg_edge_index, neg_edge_attr), deterministic))


class LinkPredFusedHead(nn.Module):
    """LP head on pre-fused embeddings (``decoder.py:73-101``)."""

    n_classes: int = 1
    n_hidden: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, pos_emb, neg_emb, deterministic: bool = True):
        trunk = _LPTrunk(self.n_classes, self.n_hidden, self.dropout,
                         name="mlp")
        return trunk(pos_emb, deterministic), trunk(neg_emb, deterministic)


class SupervisedHead(nn.Module):
    """LayerNorm → ReLU → Linear off the CLS state
    (``src/nn/decoder/supervised.py:4-28``)."""

    channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x_cls):
        h = nn.relu(nn.LayerNorm(name="norm")(x_cls))
        return nn.Dense(self.out_channels, name="lin")(h)


class MCMHead(nn.Module):
    """Masked-cell-modeling head: one numerical regressor + one classifier
    per categorical column, each LayerNorm→ReLU→Linear over a ``w``-times
    wider input (``src/nn/decoder/self_supervised.py:134-172``; w=3 when fed
    [x_src, x_dst, edge] concatenations, ``utils.py:131-133``).

    Returns (num_out [B, n_num], cat_out: list of [B, K_i]).
    """

    channels: int
    num_numerical: int
    num_categorical: Sequence[int]
    w: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.LayerNorm(name="num_norm")(x))
        num_out = nn.Dense(max(self.num_numerical, 1), name="num_lin")(h)
        num_out = num_out[:, : self.num_numerical]
        cat_out = []
        for i, k in enumerate(self.num_categorical):
            hc = nn.relu(nn.LayerNorm(name=f"cat_norm_{i}")(x))
            cat_out.append(nn.Dense(k, name=f"cat_lin_{i}")(hc))
        return num_out, cat_out


class SelfSupervisedHead(nn.Module):
    """MCM head off the CLS state (``self_supervised.py:6-43``)."""

    channels: int
    num_numerical: int
    num_categorical: Sequence[int]

    @nn.compact
    def __call__(self, x_cls):
        return MCMHead(self.channels, self.num_numerical,
                       self.num_categorical, w=1, name="mcm")(x_cls)


class MVHead(nn.Module):
    """Mask-vector head (VIME-style; ``self_supervised.py:174-202``)."""

    channels: int
    num_numerical: int
    num_categorical: Sequence[int]

    @nn.compact
    def __call__(self, x_cls):
        h = nn.relu(nn.LayerNorm(name="norm")(x_cls))
        return nn.Dense(self.num_numerical + len(self.num_categorical),
                        name="lin")(h)


class SelfSupervisedMVHead(nn.Module):
    """MCM + mask-vector heads (``self_supervised.py:46-77``)."""

    channels: int
    num_numerical: int
    num_categorical: Sequence[int]

    @nn.compact
    def __call__(self, x_cls):
        num_out, cat_out = SelfSupervisedHead(
            self.channels, self.num_numerical, self.num_categorical,
            name="mcm_decoder")(x_cls)
        mv_out = MVHead(self.channels, self.num_numerical,
                        self.num_categorical, name="mask_vector_decoder")(
            x_cls)
        return num_out, cat_out, mv_out


class SelfSupervisedLPHead(nn.Module):
    """MCM + link-prediction joint head (``self_supervised.py:108-132``)."""

    channels: int
    num_numerical: int
    num_categorical: Sequence[int]
    n_hidden: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x_tab, x_gnn, pos_edge_index, pos_edge_attr,
                 neg_edge_index, neg_edge_attr, deterministic: bool = True):
        num_out, cat_out = SelfSupervisedHead(
            self.channels, self.num_numerical, self.num_categorical,
            name="mcm_decoder")(x_tab)
        pos_pred, neg_pred = LinkPredHead(
            1, self.n_hidden, self.dropout, name="lp_decoder")(
            x_gnn, pos_edge_index, pos_edge_attr, neg_edge_index,
            neg_edge_attr, deterministic)
        return num_out, cat_out, pos_pred, neg_pred


class SelfSupervisedMCMMVLPHead(nn.Module):
    """MCM + MV + LP joint head (``self_supervised.py:80-105``)."""

    channels: int
    num_numerical: int
    num_categorical: Sequence[int]
    n_hidden: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x_cls, x_gnn, pos_edge_index, pos_edge_attr,
                 neg_edge_index, neg_edge_attr, deterministic: bool = True):
        num_out, cat_out, mv_out = SelfSupervisedMVHead(
            self.channels, self.num_numerical, self.num_categorical,
            name="mv_decoder")(x_cls)
        pos_pred, neg_pred = LinkPredHead(
            1, self.n_hidden, self.dropout, name="lp_decoder")(
            x_gnn, pos_edge_index, pos_edge_attr, neg_edge_index,
            neg_edge_attr, deterministic)
        return num_out, cat_out, mv_out, pos_pred, neg_pred
