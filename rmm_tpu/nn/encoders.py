"""Per-stype feature encoders and the stype-wise dispatcher.

TPU-native rebuild of the torch-frame encoder surface used by the reference:
``EmbeddingEncoder``, ``LinearEncoder``, ``TimestampEncoder`` (``main.py:11-15``),
fork-only ``ProjectionEncoder`` (``src/datasets/ibm_transactions_for_aml.py:8``),
``LinearEmbeddingEncoder`` / ``MultiCategoricalEmbeddingEncoder``
(``downstream_model_LLM.py:18-26``) and ``StypeWiseFeatureEncoder``
(``src/datasets/ibm_transactions_for_aml.py:289-294``), which concatenates the
per-stype blocks into ``[batch, num_cols, channels]``.

All encoders are pure flax.linen modules operating on the static-shape blocks
of a :class:`~rmm_tpu.frame.tensor_frame.TensorFrame`, so the whole encode
step fuses into the jitted model. Numerical normalization happens here (from
recorded column stats) rather than at materialization, mirroring torch-frame.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..frame.stats import StatType
from ..frame.stype import Stype, STYPE_ORDER
from ..frame.tensor_frame import TensorFrame

NA_EMB_IDX = 0  # embedding row reserved for missing (-1) categories


class EmbeddingEncoder(nn.Module):
    """Categorical columns → embeddings. One table per column; index −1
    (missing) maps to a dedicated row 0."""

    channels: int
    cardinalities: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: [B, n_cat] int
        outs = []
        for i, card in enumerate(self.cardinalities):
            table = self.param(
                f"embedding_{i}",
                nn.initializers.normal(stddev=0.1),
                (card + 1, self.channels),
            )
            idx = jnp.clip(x[:, i] + 1, 0, card)
            outs.append(jnp.take(table, idx, axis=0))
        return jnp.stack(outs, axis=1)  # [B, n_cat, C]


class LinearEncoder(nn.Module):
    """Numerical columns → affine lift of the z-scored value.

    out[:, i] = ((x_i - mean_i)/std_i) * w_i + b_i, w_i, b_i ∈ R^C
    (torch-frame LinearEncoder semantics)."""

    channels: int
    means: Sequence[float]
    stds: Sequence[float]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: [B, n_num] float
        n = x.shape[1]
        mean = jnp.asarray(self.means, dtype=x.dtype)
        std = jnp.maximum(jnp.asarray(self.stds, dtype=x.dtype), 1e-6)
        xn = (x - mean) / std
        xn = jnp.nan_to_num(xn)
        w = self.param("weight", nn.initializers.normal(0.1),
                       (n, self.channels))
        b = self.param("bias", nn.initializers.zeros, (n, self.channels))
        return xn[:, :, None] * w[None] + b[None]  # [B, n_num, C]


def timestamp_cyclic_features(ts: jnp.ndarray) -> jnp.ndarray:
    """Unix seconds [B, n_ts] → cyclic calendar features [B, n_ts, 10].

    sin/cos of (second-of-day, day-of-week, day-of-month, month-of-year)
    plus linear day index scaled to ~unit range and a constant bias slot.
    """
    ts = ts.astype(jnp.float32)
    sod = jnp.mod(ts, 86400.0) / 86400.0
    dow = jnp.mod(ts / 86400.0 + 4.0, 7.0) / 7.0  # 1970-01-01 = Thursday
    dom = jnp.mod(ts / 86400.0, 30.4375) / 30.4375
    moy = jnp.mod(ts / 86400.0, 365.2425) / 365.2425
    day_lin = ts / (86400.0 * 365.2425 * 60.0)
    two_pi = 2.0 * jnp.pi
    feats = [
        jnp.sin(two_pi * sod), jnp.cos(two_pi * sod),
        jnp.sin(two_pi * dow), jnp.cos(two_pi * dow),
        jnp.sin(two_pi * dom), jnp.cos(two_pi * dom),
        jnp.sin(two_pi * moy), jnp.cos(two_pi * moy),
        day_lin, jnp.ones_like(day_lin),
    ]
    return jnp.stack(feats, axis=-1)


class TimestampEncoder(nn.Module):
    """Timestamp columns → linear map of cyclic calendar features
    (torch-frame TimestampEncoder analogue; main.py:11-15)."""

    channels: int
    num_cols: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, n_ts] int64
        feats = timestamp_cyclic_features(x)  # [B, n_ts, 10]
        w = self.param("weight", nn.initializers.normal(0.1),
                       (self.num_cols, 10, self.channels))
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_cols, self.channels))
        return jnp.einsum("btf,tfc->btc", feats, w) + b[None]


class ProjectionEncoder(nn.Module):
    """Relation/id columns → per-column affine lift (fork-only encoder used
    for the synthetic node tables, ``ibm_transactions_for_aml.py:318``)."""

    channels: int
    num_cols: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, n_rel] float
        w = self.param("weight", nn.initializers.normal(0.1),
                       (self.num_cols, self.channels))
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_cols, self.channels))
        return x[:, :, None] * w[None] + b[None]


class LinearEmbeddingEncoder(nn.Module):
    """Pre-computed text/embedding columns → Linear(emb_dim → C)
    (``downstream_model_LLM.py:18-26`` frozen-embedder path)."""

    channels: int
    emb_dim: int
    num_cols: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, n, emb_dim]
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.num_cols, self.emb_dim, self.channels))
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_cols, self.channels))
        return jnp.einsum("bne,nec->bnc", x, w) + b[None]


class MultiCategoricalEmbeddingEncoder(nn.Module):
    """Multicategorical columns → mean of tag embeddings
    (``downstream_model_LLM.py:328``). Pad tags are −1."""

    channels: int
    cardinalities: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, n, max_tags] int
        outs = []
        for i, card in enumerate(self.cardinalities):
            table = self.param(
                f"embedding_{i}", nn.initializers.normal(stddev=0.1),
                (card + 1, self.channels))
            tags = x[:, i]                          # [B, T]
            valid = (tags >= 0).astype(jnp.float32)  # [B, T]
            idx = jnp.clip(tags + 1, 0, card)
            emb = jnp.take(table, idx, axis=0)       # [B, T, C]
            denom = jnp.maximum(valid.sum(-1, keepdims=True), 1.0)
            outs.append((emb * valid[..., None]).sum(1) / denom)
        return jnp.stack(outs, axis=1)


class LinearModelEncoder(nn.Module):
    """Tokenized text columns → trainable text-model pooled states → Linear.

    The reference's ``LinearModelEncoder`` runs an LLM inside the forward
    pass (``downstream_model_LLM.py:302-331``). Here the text model is a
    pluggable callable (e.g. a flax adapter over frozen token states; see
    ``rmm_tpu.nn.text``); it maps token ids [B, L] → pooled [B, H].
    """

    channels: int
    num_cols: int
    text_model: Callable[[jnp.ndarray], jnp.ndarray]
    model_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, n, L] int
        outs = []
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.num_cols, self.model_dim, self.channels))
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_cols, self.channels))
        for i in range(self.num_cols):
            pooled = self.text_model(x[:, i])  # [B, H]
            outs.append(pooled @ w[i] + b[i])
        return jnp.stack(outs, axis=1)


class StypeWiseFeatureEncoder(nn.Module):
    """Dispatch each stype block to its encoder; concat to
    ``[B, num_cols, C]`` in canonical stype order (reference:
    ``StypeWiseFeatureEncoder``, ``ibm_transactions_for_aml.py:283-294``).

    Construct via :func:`make_stypewise_encoder` from a Dataset so the column
    stats are baked in as static config.
    """

    channels: int
    col_names: dict          # Stype -> tuple of column names
    col_config: dict         # Stype -> static per-stype config
    text_model: Optional[Callable] = None

    @nn.compact
    def __call__(self, tf: TensorFrame) -> tuple[jnp.ndarray, list]:
        blocks = []
        names = []
        for st in STYPE_ORDER:
            if st not in self.col_names or st not in tf.feats:
                continue
            x = tf.feats[st]
            cfg = self.col_config.get(st, {})
            n = len(self.col_names[st])
            if st == Stype.numerical:
                enc = LinearEncoder(self.channels, cfg["means"], cfg["stds"],
                                    name="numerical")
            elif st == Stype.categorical:
                enc = EmbeddingEncoder(self.channels, cfg["cardinalities"],
                                       name="categorical")
            elif st == Stype.timestamp:
                enc = TimestampEncoder(self.channels, n, name="timestamp")
            elif st == Stype.relation:
                enc = ProjectionEncoder(self.channels, x.shape[1],
                                        name="relation")
            elif st in (Stype.text_embedded, Stype.embedding):
                enc = LinearEmbeddingEncoder(self.channels, cfg["emb_dim"], n,
                                             name=str(st))
            elif st == Stype.multicategorical:
                enc = MultiCategoricalEmbeddingEncoder(
                    self.channels, cfg["cardinalities"],
                    name="multicategorical")
            elif st == Stype.text_tokenized:
                enc = LinearModelEncoder(self.channels, n, self.text_model,
                                         cfg["model_dim"],
                                         name="text_tokenized")
            else:
                continue
            blocks.append(enc(x))
            names.extend(self.col_names[st])
        out = jnp.concatenate(blocks, axis=1)
        return out, names


def stype_encoder_config(dataset) -> tuple[dict, dict]:
    """Static (col_names, col_config) for a materialized Dataset."""
    tf = dataset.tensor_frame
    col_names = {st: tuple(cols) for st, cols in tf.col_names.items()}
    col_config: dict[Stype, dict[str, Any]] = {}
    for st, cols in tf.col_names.items():
        if st == Stype.numerical:
            col_config[st] = {
                "means": tuple(dataset.col_stats[c][StatType.MEAN] for c in cols),
                "stds": tuple(dataset.col_stats[c][StatType.STD] for c in cols),
            }
        elif st == Stype.categorical:
            col_config[st] = {
                "cardinalities": tuple(
                    len(dataset.col_stats[c][StatType.COUNT][0]) for c in cols),
            }
        elif st == Stype.multicategorical:
            col_config[st] = {
                "cardinalities": tuple(
                    len(dataset.col_stats[c][StatType.MULTI_COUNT][0])
                    for c in cols),
            }
        elif st in (Stype.text_embedded, Stype.embedding):
            col_config[st] = {
                "emb_dim": int(tf.feats[st].shape[-1]),
            }
        elif st == Stype.text_tokenized:
            col_config[st] = {"model_dim": 0}  # set by caller with text model
    return col_names, col_config


def make_stypewise_encoder(dataset, channels: int,
                           text_model: Optional[Callable] = None,
                           model_dim: int = 0) -> StypeWiseFeatureEncoder:
    """Build the dispatcher for a materialized Dataset
    (reference: ``init_encoder``, ``ibm_transactions_for_aml.py:283-294``)."""
    col_names, col_config = stype_encoder_config(dataset)
    if Stype.text_tokenized in col_config:
        col_config[Stype.text_tokenized]["model_dim"] = model_dim
    return StypeWiseFeatureEncoder(
        channels=channels,
        col_names=col_names,
        col_config=col_config,
        text_model=text_model,
    )
