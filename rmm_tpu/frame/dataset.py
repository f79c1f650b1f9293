"""Dataset: pandas → materialized TensorFrame with column statistics.

TPU-native replacement of the forked pytorch-frame ``Dataset`` surface used by
the reference: ctor ``(df, col_to_stype, split_col=, target_col=,
maskable_columns=)`` (``src/datasets/ibm_transactions_for_aml.py:281``),
``materialize()``, ``split()``, ``col_stats`` (``fused.py:519,538``,
``main.py:279-281``).

Materialization maps every column into a fixed-dtype numpy block per stype:
categorical values are integer-coded by count-descending rank (mirroring
torch-frame's ``StatType.COUNT`` ordering used at ``main.py:303``), numerical
columns stay raw (normalization happens inside the stype encoder with the
recorded stats), timestamps become unix seconds.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pandas as pd

from .stats import StatType, compute_col_stats
from .stype import Stype, STYPE_ORDER
from .tensor_frame import TensorFrame


def _to_unix_seconds(ser: pd.Series) -> np.ndarray:
    if np.issubdtype(ser.dtype, np.number):
        return ser.to_numpy(dtype=np.int64)
    dt = pd.to_datetime(ser, errors="coerce")
    return (dt.astype("int64") // 10**9).to_numpy()


class Dataset:
    """A table with a stype schema, materializable to a TensorFrame."""

    def __init__(
        self,
        df: pd.DataFrame,
        col_to_stype: dict[str, Stype],
        split_col: Optional[str] = None,
        target_col: Optional[str] = None,
        maskable_columns: Optional[Sequence[str]] = None,
    ):
        self.df = df
        self.col_to_stype = dict(col_to_stype)
        self.split_col = split_col
        self.target_col = target_col if target_col else None
        self.maskable_columns = list(maskable_columns) if maskable_columns else None
        self.col_stats: dict[str, dict[StatType, Any]] = {}
        self.tensor_frame: Optional[TensorFrame] = None
        self._cat_codes: dict[str, dict[Any, int]] = {}

    # ------------------------------------------------------------------
    @property
    def feat_cols(self) -> list[str]:
        return [
            c for c in self.col_to_stype
            if c != self.target_col and c != self.split_col
        ]

    def materialize(self) -> "Dataset":
        if self.tensor_frame is not None:
            return self
        # column stats for feature + target columns
        for col, st in self.col_to_stype.items():
            if col == self.target_col:
                continue
            self.col_stats[col] = compute_col_stats(self.df[col], st)
            if st == Stype.categorical:
                values, _ = self.col_stats[col][StatType.COUNT]
                self._cat_codes[col] = {v: i for i, v in enumerate(values)}

        by_stype: dict[Stype, list[str]] = {}
        for col in self.feat_cols:
            by_stype.setdefault(self.col_to_stype[col], []).append(col)

        feats: dict[Stype, np.ndarray] = {}
        col_names: dict[Stype, list[str]] = {}
        n = len(self.df)
        for st in STYPE_ORDER:
            if st not in by_stype:
                continue
            cols = by_stype[st]
            col_names[st] = cols
            if st == Stype.numerical:
                block = np.stack(
                    [pd.to_numeric(self.df[c], errors="coerce")
                       .to_numpy(dtype=np.float32) for c in cols], axis=1)
            elif st == Stype.categorical:
                block = np.stack(
                    [self.df[c].map(self._cat_codes[c]).fillna(-1)
                       .to_numpy(dtype=np.int32) for c in cols], axis=1)
            elif st == Stype.timestamp:
                block = np.stack([_to_unix_seconds(self.df[c]) for c in cols],
                                 axis=1)
            elif st == Stype.relation:
                # relation columns may hold scalars or fixed-length lists
                blocks = []
                for c in cols:
                    first = self.df[c].iloc[0] if n else 0
                    if isinstance(first, (list, tuple, np.ndarray)):
                        blocks.append(np.asarray(
                            [np.asarray(v, dtype=np.float32) for v in self.df[c]]))
                    else:
                        blocks.append(
                            pd.to_numeric(self.df[c], errors="coerce")
                            .to_numpy(dtype=np.float32)[:, None])
                block = np.concatenate(blocks, axis=1)
            elif st in (Stype.text_embedded, Stype.embedding):
                block = np.stack(
                    [np.stack([np.asarray(v, dtype=np.float32)
                               for v in self.df[c]]) for c in cols], axis=1)
            elif st == Stype.text_tokenized:
                block = np.stack(
                    [np.stack([np.asarray(v, dtype=np.int32)
                               for v in self.df[c]]) for c in cols], axis=1)
            elif st == Stype.multicategorical:
                block = self._materialize_multicat(cols)
            elif st == Stype.mask:
                block = np.asarray(
                    [np.asarray(v, dtype=np.float32) for v in self.df[cols[0]]])
            else:
                raise NotImplementedError(f"stype {st}")
            feats[st] = block

        y = None
        if self.target_col is not None and self.target_col in self.df.columns:
            tgt = self.df[self.target_col]
            first = tgt.iloc[0] if n else 0
            if isinstance(first, (list, tuple, np.ndarray)):
                y = np.asarray([np.asarray(v, dtype=np.float32) for v in tgt])
            else:
                y = pd.to_numeric(tgt, errors="coerce").to_numpy(
                    dtype=np.float32)[:, None]

        self.tensor_frame = TensorFrame(feats=feats, col_names=col_names, y=y)
        return self

    def _materialize_multicat(self, cols: list[str]) -> np.ndarray:
        blocks = []
        for c in cols:
            values, _ = self.col_stats[c][StatType.MULTI_COUNT]
            code = {v: i for i, v in enumerate(values)}
            rows = []
            for v in self.df[c]:
                if isinstance(v, (list, tuple, set)):
                    tags = [code.get(t, -1) for t in v]
                elif pd.isna(v):
                    tags = []
                else:
                    tags = [code.get(t, -1) for t in str(v).split("|")]
                rows.append(tags)
            width = max((len(r) for r in rows), default=1) or 1
            block = np.full((len(rows), width), -1, dtype=np.int32)
            for i, r in enumerate(rows):
                block[i, : len(r)] = r
            blocks.append(block)
        width = max(b.shape[1] for b in blocks)
        blocks = [
            np.pad(b, [(0, 0), (0, width - b.shape[1])], constant_values=-1)
            for b in blocks
        ]
        return np.stack(blocks, axis=1)

    # ------------------------------------------------------------------
    def split(self):
        """Return (train, val, test) views sharing stats and encoders.

        Mirrors the reference's ``Dataset.split()`` over an integer
        ``split_col`` (0=train, 1=val, 2=test; ``util/split.py``).
        """
        if self.split_col is None:
            raise ValueError("dataset has no split column")
        self.materialize()
        split = self.df[self.split_col].to_numpy()
        out = []
        for part in (0, 1, 2):
            idx = np.nonzero(split == part)[0]
            sub = DatasetView(self, idx)
            out.append(sub)
        return tuple(out)

    @property
    def num_numerical(self) -> int:
        return len(self.tensor_frame.col_names.get(Stype.numerical, []))

    @property
    def num_categorical(self) -> int:
        return len(self.tensor_frame.col_names.get(Stype.categorical, []))

    def categorical_cardinalities(self) -> list[int]:
        """Cardinality per categorical column (reference: ``main.py:303``)."""
        cols = self.tensor_frame.col_names.get(Stype.categorical, [])
        return [len(self.col_stats[c][StatType.COUNT][0]) for c in cols]


class DatasetView:
    """Row-subset view of a materialized Dataset (one split)."""

    def __init__(self, parent: Dataset, indices: np.ndarray):
        self.parent = parent
        self.indices = indices
        self.tensor_frame = parent.tensor_frame.to_numpy()[indices]

    def __len__(self):
        return len(self.indices)

    @property
    def col_stats(self):
        return self.parent.col_stats


def generate_random_split(length: int, seed: int, train_ratio: float,
                          val_ratio: float) -> np.ndarray:
    """Random 0/1/2 split vector (reference ``util/split.py:23`` surface)."""
    rng = np.random.RandomState(seed)
    out = np.full(length, 2, dtype=np.int64)
    perm = rng.permutation(length)
    n_train = int(length * train_ratio)
    n_val = int(length * val_ratio)
    out[perm[:n_train]] = 0
    out[perm[n_train : n_train + n_val]] = 1
    return out
