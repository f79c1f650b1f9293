"""Task wrappers: encoders + backbone + head as one jittable module.

Rebuilds ``utils.py``'s ``TT`` (``:73-109``), ``GNN`` (``:111-233``),
``TABGNNS`` (``:235-328``) and ``TABGNNFusedS`` (``:330-405``) TPU-first:
the wrapper receives the FULL device-resident edge/node TensorFrames plus a
:class:`~rmm_tpu.utils.batch.GraphBatch` of ids/masks, gathers features
with one XLA gather inside jit, and runs encoder → backbone → head in a
single compiled step (replacing the reference's host-side feature indexing
and separate encoder/model/decoder calls).

Conventions (mirroring the reference):
  * seed edges occupy lanes [0, B); classification/mcm read that block
    (``utils.py:144-147, 265-266``);
  * the fused wrapper message-passes over lanes [B:) only and treats the
    seed block as targets (``utils.py:353-360``);
  * ego marking writes the node table's ``ego`` relation column in-jit
    (``util/graph.py:112-145``).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..frame.stype import Stype
from ..frame.tensor_frame import TensorFrame
from ..nn.decoders import (
    ClassifierHead,
    MCMHead,
    NodeClassificationHead,
)
from ..nn.encoders import StypeWiseFeatureEncoder
from ..nn.gnn import CPNA, CPNATAB, GINe, PNAS
from ..nn.models import (
    FTTransformer,
    TABGNN,
    TABGNNFused,
    TABGNNInterleaved,
)
from ..utils.batch import GraphBatch


def gather_rows(tf: TensorFrame, ids) -> TensorFrame:
    """Row gather on a device-resident TensorFrame (in-jit)."""
    return TensorFrame(
        feats={st: v[ids] for st, v in tf.feats.items()},
        col_names=tf.col_names,
        y=None,
    )


def apply_ego(tf: TensorFrame, seed_edge_index, num_nodes: int,
              col_name: str = "ego", seed_mask=None) -> TensorFrame:
    """Overwrite the ``ego`` relation column with a seed-incidence
    indicator, computed in-jit (reference ``add_EgoIDs``).

    ``seed_mask`` [B] excludes padded tail lanes (copies of the last real
    row) so fake seeds never mark ego nodes for real rows sharing the
    subgraph; scatter-max so a fake 0 can't clear a real 1."""
    if Stype.relation not in tf.col_names:
        return tf
    names = list(tf.col_names[Stype.relation])
    if col_name not in names:
        return tf
    idx = names.index(col_name)
    dtype = tf.feats[Stype.relation].dtype
    flags = jnp.zeros((num_nodes,), dtype=dtype)
    if seed_mask is None:
        flags = flags.at[seed_edge_index.reshape(-1)].set(1.0)
    else:
        vals = jnp.broadcast_to(seed_mask.astype(dtype)[None, :],
                                seed_edge_index.shape)
        flags = flags.at[seed_edge_index].max(vals)
    rel = tf.feats[Stype.relation].at[:, idx].set(flags)
    feats = dict(tf.feats)
    feats[Stype.relation] = rel
    return TensorFrame(feats=feats, col_names=tf.col_names, y=tf.y)


def _deghist_to_avg_log(deg_histogram) -> float:
    import numpy as np
    hist = np.asarray(deg_histogram, dtype=np.float64)
    d = np.arange(len(hist))
    return float((hist * np.log(d + 1)).sum() / max(hist.sum(), 1.0))


class TT(nn.Module):
    """Tabular-only wrapper: FTTransformer on node and edge tables
    (``utils.py:73-109``)."""

    node_encoder: StypeWiseFeatureEncoder
    edge_encoder: StypeWiseFeatureEncoder
    channels: int
    num_layers: int
    n_classes: int = 2
    dropout: float = 0.1
    task: str = "edge_classification"
    ego: bool = False

    @nn.compact
    def __call__(self, edge_table: TensorFrame, node_table: TensorFrame,
                 batch: GraphBatch, train: bool = False):
        det = not train
        b = batch.num_seeds
        model = FTTransformer(self.channels, self.num_layers,
                              dropout=self.dropout, name="model")
        if self.task == "edge_classification":
            edge_tf = gather_rows(edge_table, batch.edge_gather)
            e_tok, _ = self.edge_encoder(edge_tf)
            node_tf = gather_rows(node_table, batch.node_gather)
            x_tok, _ = self.node_encoder(node_tf)
            _, x_cls = model(x_tok, det)
            _, e_cls = model(e_tok, det)
            head = ClassifierHead(self.n_classes, self.channels,
                                  self.dropout, name="decoder")
            return head(x_cls, batch.edge_index[:, :b], e_cls[:b], det)
        # node classification over seed nodes (lanes [0, B) of node axis)
        node_tf = gather_rows(node_table, batch.node_gather)
        x_tok, _ = self.node_encoder(node_tf)
        _, x_cls = model(x_tok, det)
        head = NodeClassificationHead(self.n_classes, self.channels,
                                      self.dropout, name="decoder")
        return head(x_cls[:b], det)


class GNNWrap(nn.Module):
    """Pure-GNN wrapper (``utils.py:111-233``): gin | pna | cpna | cpnatab."""

    node_encoder: StypeWiseFeatureEncoder
    edge_encoder: StypeWiseFeatureEncoder
    model_name: str                      # gin / pna / cpna / cpnatab
    n_hidden: int
    n_gnn_layers: int
    num_edge_cols: int
    n_classes: int = 2
    dropout: float = 0.1
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    emlps: bool = False
    ego: bool = False
    task: str = "edge_classification"
    mcm_num_numerical: int = 0
    mcm_categorical: Sequence[int] = ()

    def _backbone(self):
        if self.model_name == "gin":
            return GINe(self.n_hidden, self.n_gnn_layers, self.emlps,
                        self.reverse_mp, name="model")
        if self.model_name == "pna":
            return PNAS(self.n_hidden, self.n_gnn_layers, self.avg_log_deg,
                        self.emlps, self.reverse_mp, name="model")
        if self.model_name == "cpna":
            return CPNA(self.n_hidden, self.n_gnn_layers, self.num_edge_cols,
                        self.avg_log_deg, self.emlps, self.reverse_mp,
                        name="model")
        if self.model_name == "cpnatab":
            return CPNATAB(self.n_hidden, self.n_gnn_layers,
                           self.num_edge_cols, self.avg_log_deg, self.emlps,
                           self.reverse_mp, name="model")
        raise ValueError(self.model_name)

    @nn.compact
    def __call__(self, edge_table: TensorFrame, node_table: TensorFrame,
                 batch: GraphBatch, train: bool = False):
        det = not train
        b = batch.num_seeds
        node_tf = gather_rows(node_table, batch.node_gather)
        if self.ego:
            node_tf = apply_ego(node_tf, batch.edge_index[:, :b],
                                batch.node_gather.shape[0],
                                seed_mask=batch.seed_mask)
        x_tok, _ = self.node_encoder(node_tf)
        edge_tf = gather_rows(edge_table, batch.edge_gather)
        e_tok, _ = self.edge_encoder(edge_tf)

        x, edge_attr = self._backbone()(
            x_tok, batch.edge_index, e_tok, batch.edge_mask, batch.node_mask,
            train)
        wide = self.model_name in ("cpna", "cpnatab")
        if wide:
            edge_attr = edge_attr.reshape(edge_attr.shape[0], -1)

        if self.task == "edge_classification":
            head = ClassifierHead(self.n_classes, self.n_hidden,
                                  self.dropout, name="decoder")
            return head(x, batch.edge_index[:, :b], edge_attr[:b], det)
        if self.task == "node_classification":
            head = NodeClassificationHead(
                self.n_classes,
                self.num_edge_cols * self.n_hidden if wide else self.n_hidden,
                self.dropout, name="decoder")
            return head(x[:b], det)
        if self.task == "mcm_edge_table":
            tgt_ei = batch.edge_index[:, :b]
            x_target = jnp.concatenate(
                [x[tgt_ei[0]], x[tgt_ei[1]], edge_attr[:b]], axis=-1)
            w = self.num_edge_cols + 2 if wide else 3
            head = MCMHead(self.n_hidden, self.mcm_num_numerical,
                           self.mcm_categorical, w=w, name="decoder")
            return head(x_target)
        raise ValueError(self.task)


class TABGNNS(nn.Module):
    """Hybrid tabular+GNN wrapper (``utils.py:235-328``):
    tabgnn | tabgnninterleaved."""

    node_encoder: StypeWiseFeatureEncoder
    edge_encoder: StypeWiseFeatureEncoder
    model_name: str                      # tabgnn / tabgnninterleaved
    channels: int
    n_gnn_layers: int
    n_classes: int = 2
    dropout: float = 0.1
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    ego: bool = False
    task: str = "edge_classification"
    mcm_num_numerical: int = 0
    mcm_categorical: Sequence[int] = ()

    @nn.compact
    def __call__(self, edge_table: TensorFrame, node_table: TensorFrame,
                 batch: GraphBatch, train: bool = False):
        det = not train
        b = batch.num_seeds
        node_tf = gather_rows(node_table, batch.node_gather)
        if self.ego:
            node_tf = apply_ego(node_tf, batch.edge_index[:, :b],
                                batch.node_gather.shape[0],
                                seed_mask=batch.seed_mask)
        x_tok, _ = self.node_encoder(node_tf)
        edge_tf = gather_rows(edge_table, batch.edge_gather)
        e_tok, _ = self.edge_encoder(edge_tf)

        if self.model_name == "tabgnn":
            model = TABGNN(channels=self.channels,
                           num_layers=self.n_gnn_layers,
                           nhidden=self.channels,
                           avg_log_deg=self.avg_log_deg,
                           reverse_mp=self.reverse_mp,
                           dropout=self.dropout, name="model")
            x, edge_attr = model(x_tok, batch.edge_index, e_tok,
                                 batch.edge_mask, batch.node_mask, train)
        else:
            model = TABGNNInterleaved(
                channels=self.channels, num_layers=self.n_gnn_layers,
                node_dim=x_tok.shape[1] * x_tok.shape[2],
                nhidden=self.channels, avg_log_deg=self.avg_log_deg,
                reverse_mp=self.reverse_mp, dropout=self.dropout,
                name="model")
            x, edge_attr = model(x_tok, batch.edge_index, e_tok,
                                 batch.edge_mask, batch.node_mask, train)

        if self.task == "edge_classification":
            head = ClassifierHead(self.n_classes, self.channels,
                                  self.dropout, name="decoder")
            return head(x, batch.edge_index[:, :b], edge_attr[:b], det)
        if self.task == "node_classification":
            head = NodeClassificationHead(self.n_classes, self.channels,
                                          self.dropout, name="decoder")
            return head(x[:b], det)
        if self.task == "mcm_edge_table":
            tgt_ei = batch.edge_index[:, :b]
            x_target = jnp.concatenate(
                [x[tgt_ei[0]], x[tgt_ei[1]], edge_attr[:b]], axis=-1)
            head = MCMHead(self.channels, self.mcm_num_numerical,
                           self.mcm_categorical, w=3, name="decoder")
            return head(x_target)
        raise ValueError(self.task)


class TABGNNFusedS(nn.Module):
    """Fused wrapper (``utils.py:330-405``): message-passes over context
    lanes [B:) and fuses the seed block as targets."""

    node_encoder: StypeWiseFeatureEncoder
    edge_encoder: StypeWiseFeatureEncoder
    channels: int
    n_gnn_layers: int
    n_classes: int = 2
    dropout: float = 0.1
    avg_log_deg: float = 1.0
    reverse_mp: bool = False
    ego: bool = False
    task: str = "edge_classification"
    mcm_num_numerical: int = 0
    mcm_categorical: Sequence[int] = ()
    scan_layers: bool = False

    @nn.compact
    def __call__(self, edge_table: TensorFrame, node_table: TensorFrame,
                 batch: GraphBatch, train: bool = False):
        det = not train
        b = batch.num_seeds
        node_tf = gather_rows(node_table, batch.node_gather)
        if self.ego:
            node_tf = apply_ego(node_tf, batch.edge_index[:, :b],
                                batch.node_gather.shape[0],
                                seed_mask=batch.seed_mask)
        x_tok, _ = self.node_encoder(node_tf)
        edge_tf = gather_rows(edge_table, batch.edge_gather)
        e_tok_all, _ = self.edge_encoder(edge_tf)

        neigh_ei = batch.edge_index[:, b:]
        neigh_mask = batch.edge_mask[b:]
        neigh_tok = e_tok_all[b:]
        target_ei = batch.edge_index[:, :b]
        target_tok = e_tok_all[:b]

        model = TABGNNFused(
            channels=self.channels, num_layers=self.n_gnn_layers,
            node_dim=x_tok.shape[1] * x_tok.shape[2],
            nhidden=self.channels, avg_log_deg=self.avg_log_deg,
            reverse_mp=self.reverse_mp, dropout=self.dropout,
            scan_layers=self.scan_layers, name="model")
        x, edge_attr, target_edge_attr = model(
            x_tok.reshape(x_tok.shape[0], -1), neigh_ei, neigh_tok,
            target_ei, target_tok, False, neigh_mask, batch.node_mask, train)

        if self.task == "edge_classification":
            head = ClassifierHead(self.n_classes, self.channels,
                                  self.dropout, name="decoder")
            return head(x, target_ei, target_edge_attr, det)
        if self.task == "node_classification":
            head = NodeClassificationHead(self.n_classes, self.channels,
                                          self.dropout, name="decoder")
            return head(x[:b], det)
        if self.task == "mcm_edge_table":
            x_target = jnp.concatenate(
                [x[target_ei[0]], x[target_ei[1]], target_edge_attr],
                axis=-1)
            head = MCMHead(self.channels, self.mcm_num_numerical,
                           self.mcm_categorical, w=3, name="decoder")
            return head(x_target)
        raise ValueError(self.task)
