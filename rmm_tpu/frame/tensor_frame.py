"""TensorFrame: columnar device tensors grouped by stype.

TPU-native replacement for the forked pytorch-frame ``TensorFrame``
(reference surface: ``feat_dict``, ``col_names_dict``, ``y``, ``num_cols``,
``get_col_feat(name)``, row ``__getitem__``, ``.to(device)`` — see
``src/utils/batch_processing.py:143`` and ``main.py:295-300``).

Design: a frozen pytree dataclass whose leaves are JAX/NumPy arrays keyed by
:class:`~rmm_tpu.frame.stype.Stype` (IntEnum — sorted dict flattening gives a
deterministic column-block order). All shapes are static; row selection is an
XLA gather so it fuses into the jitted step instead of the reference's
per-batch host indexing (``ibm_transactions_for_aml.py:163``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .stype import Stype, STYPE_ORDER


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TensorFrame:
    """Columnar features grouped by stype.

    Attributes:
        feats: maps Stype -> array. Canonical dtypes/shapes:
            numerical        [N, n_num]            float32
            categorical      [N, n_cat]            int32  (−1 = missing)
            multicategorical [N, n_multi, max_tag] int32  (−1 = pad)
            timestamp        [N, n_ts]             int64  (unix seconds)
            text_embedded    [N, n_text, emb_dim]  float32
            text_tokenized   [N, n_text, max_len]  int32
            embedding        [N, n_emb, emb_dim]   float32
            relation         [N, n_rel]            float32
            mask             [N, 2]                float32
        col_names: Stype -> list of column names (aux data, static).
        y: optional packed target array [N, T].
    """

    feats: dict[Stype, Any]
    col_names: dict[Stype, list]
    y: Optional[Any] = None

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self.feats.keys())
        children = tuple(self.feats[k] for k in keys) + (self.y,)
        aux = (tuple(keys), tuple((k, tuple(v)) for k, v in self.col_names.items()))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, col_names = aux
        feats = dict(zip(keys, children[:-1]))
        return cls(feats=feats,
                   col_names={k: list(v) for k, v in col_names},
                   y=children[-1])

    # -- reference-parity surface -----------------------------------------
    @property
    def feat_dict(self) -> dict[Stype, Any]:
        return self.feats

    @property
    def col_names_dict(self) -> dict[Stype, list]:
        return self.col_names

    @property
    def num_rows(self) -> int:
        for v in self.feats.values():
            return int(v.shape[0])
        return 0 if self.y is None else int(self.y.shape[0])

    def __len__(self) -> int:
        return self.num_rows

    @property
    def num_cols(self) -> int:
        return sum(len(v) for v in self.col_names.values())

    @property
    def stypes(self) -> list:
        return sorted(self.feats.keys())

    def all_col_names(self) -> list:
        """Column names in canonical (stype-block) order."""
        out = []
        for st in STYPE_ORDER:
            if st in self.col_names:
                out.extend(self.col_names[st])
        return out

    def get_col_feat(self, name: str):
        """Column feature by name: shape [N, 1, ...]."""
        for st, names in self.col_names.items():
            if name in names:
                i = names.index(name)
                return self.feats[st][:, i : i + 1]
        raise KeyError(name)

    def __getitem__(self, idx):
        """Row selection (int array / slice) — an XLA gather when jitted."""
        if isinstance(idx, (int, np.integer)):
            idx = np.asarray([idx])
        feats = {st: v[idx] for st, v in self.feats.items()}
        y = self.y[idx] if self.y is not None else None
        return TensorFrame(feats=feats, col_names=self.col_names, y=y)

    def to_device(self, device=None, sharding=None):
        """Move all leaves onto a device (or a NamedSharding)."""
        target = sharding if sharding is not None else device
        put = (lambda a: jax.device_put(a, target)) if target is not None else jax.device_put
        return jax.tree_util.tree_map(put, self)

    def to_numpy(self) -> "TensorFrame":
        return jax.tree_util.tree_map(np.asarray, self)

    @staticmethod
    def concat(frames: list["TensorFrame"]) -> "TensorFrame":
        first = frames[0]
        feats = {
            st: jnp.concatenate([f.feats[st] for f in frames], axis=0)
            for st in first.feats
        }
        y = None
        if first.y is not None:
            y = jnp.concatenate([f.y for f in frames], axis=0)
        return TensorFrame(feats=feats, col_names=first.col_names, y=y)

    def pad_rows(self, total: int, fill: float = 0.0) -> "TensorFrame":
        """Pad to ``total`` rows with ``fill`` (static-shape batching)."""
        n = self.num_rows
        if n == total:
            return self
        if n > total:
            raise ValueError(f"cannot pad {n} rows down to {total}")
        pad = total - n

        def _pad(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill)

        feats = {st: _pad(v) for st, v in self.feats.items()}
        y = _pad(self.y) if self.y is not None else None
        return TensorFrame(feats=feats, col_names=self.col_names, y=y)
