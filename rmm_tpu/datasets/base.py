"""Dataset plumbing shared by all graph datasets: splits, masking, target
packing, graph wiring.

Rebuilds ``src/datasets/util/``:
  * ``mask.py`` — PretrainType, reproducible per-row mask-column choice,
    packed target layouts;
  * ``split.py`` — random / cutoff / temporal / temporal_daily splits;
  * ``graph.py`` — graph construction + the packed ``link`` column.

Packed target layouts (consumed by the loss/batch code, matching
``util/mask.py:37-77``):
  supervised:        [label, src, dst, edge_id]
  MASK+LINK_PRED:    [masked_value, masked_col_idx, src, dst, edge_id]
  MASK only:         [masked_value, masked_col_idx]
  LINK_PRED only:    [src, dst, edge_id]
Masked-column indices are numerical-maskable columns first, then
categorical-maskable, in tensor-frame order (the ordering ``mcm_loss``
assumes, ``loss.py:44-57``).
"""
from __future__ import annotations

import enum
import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..frame.dataset import generate_random_split


class PretrainType(enum.Enum):
    MASK = 1
    MASK_VECTOR = 2
    LINK_PRED = 3


def parse_pretrain_args(pretrain) -> set:
    """'mask'/'mv'/'lp' strings → PretrainType set (``fused.py:476-496``)."""
    table = {"mask": PretrainType.MASK, "mv": PretrainType.MASK_VECTOR,
             "lp": PretrainType.LINK_PRED}
    out = set()
    for p in pretrain or ():
        out.add(table[p])
    return out


# ---------------------------------------------------------------------------
# splits (util/split.py)
# ---------------------------------------------------------------------------

def apply_split(df: pd.DataFrame, split_type: str, splits: Sequence[float],
                timestamp_col: str) -> pd.DataFrame:
    if split_type == "temporal_daily":
        return temporal_balanced_split(df, splits, timestamp_col)
    if split_type == "temporal":
        return temporal_split(df, splits, timestamp_col)
    if split_type == "cutoff":
        return cutoff_split(df, splits, timestamp_col)
    return random_split(df, splits)


def random_split(df, splits):
    df["split"] = generate_random_split(len(df), seed=0,
                                        train_ratio=splits[0],
                                        val_ratio=splits[1])
    return df


def cutoff_split(df, cutoffs, timestamp_col):
    assert timestamp_col in df.columns
    df["split"] = 1
    df.loc[df[timestamp_col] < cutoffs[0], "split"] = 0
    df.loc[df[timestamp_col] > cutoffs[-1], "split"] = 2
    return df


def temporal_split(df, splits, timestamp_col):
    assert timestamp_col in df.columns
    order = df[timestamp_col].to_numpy().argsort(kind="stable")
    rank = np.empty(len(df), dtype=np.int64)
    rank[order] = np.arange(len(df))
    n_train = int(len(df) * splits[0])
    n_val = int(len(df) * splits[1])
    split = np.full(len(df), 2, dtype=np.int64)
    split[rank < n_train] = 0
    split[(rank >= n_train) & (rank < n_train + n_val)] = 1
    df["split"] = split
    return df


def temporal_balanced_split(df, splits, timestamp_col):
    """Day-boundary split minimizing the max relative deviation from the
    target ratios (``util/split.py:59-123``)."""
    assert timestamp_col in df.columns
    ts = df[timestamp_col].to_numpy()
    ts = ts - ts.min()
    df[timestamp_col] = ts
    day = (ts // (24 * 3600)).astype(np.int64)
    n_days = int(day.max()) + 1
    daily = np.bincount(day, minlength=n_days).astype(np.float64)

    # prefix sums + broadcast over all (i, j) pairs: O(days²) instead of the
    # reference's O(days³) pair loop (pathological on multi-year data)
    csum = np.concatenate([[0.0], np.cumsum(daily)])
    total = csum[-1]
    best = None
    if n_days >= 2 and total > 0:
        I, J = np.triu_indices(n_days, k=1)
        t0, t1, t2 = csum[I], csum[J] - csum[I], total - csum[J]
        err = np.maximum.reduce([
            np.abs(t / total - p) / p
            for t, p in zip((t0, t1, t2), splits)])
        k = int(err.argmin())
        best = (int(I[k]), int(J[k]))
    i, j = best if best is not None else (max(n_days - 2, 0),
                                          max(n_days - 1, 1))
    split = np.zeros(len(df), dtype=np.int64)
    split[(day >= i) & (day < j)] = 1
    split[day >= j] = 2
    df["split"] = split
    return df


# ---------------------------------------------------------------------------
# masking + target packing (util/mask.py)
# ---------------------------------------------------------------------------

def create_mask(cache_root: Optional[str], df: pd.DataFrame,
                maskable_columns: Sequence[str], seed: int = 0) -> np.ndarray:
    """Per-row choice of which column to mask, cached to ``<root>.npy`` for
    reproducibility across runs (``util/mask.py:25-34``)."""
    cache = f"{cache_root}.mask.npy" if cache_root else None
    if cache and os.path.exists(cache):
        mask = np.load(cache, allow_pickle=True)
        if len(mask) == len(df):
            return mask
    rng = np.random.RandomState(seed)
    mask = rng.choice(list(maskable_columns), size=len(df), replace=True)
    if cache:
        try:
            np.save(cache, mask)
        except OSError:
            pass
    return mask


def build_mask_target(df: pd.DataFrame, mask_col: np.ndarray,
                      masked_numerical: Sequence[str],
                      masked_categorical: Sequence[str],
                      cat_codes: dict[str, dict]) -> np.ndarray:
    """[original_value, masked_col_idx] per row; categorical originals are
    stored as their integer codes so the packed target is numeric."""
    col_idx = {c: i for i, c in enumerate(masked_numerical)}
    off = len(masked_numerical)
    col_idx.update({c: off + i for i, c in enumerate(masked_categorical)})
    out = np.zeros((len(df), 2), dtype=np.float32)
    for c in set(mask_col):
        rows = mask_col == c
        if c in cat_codes:
            vals = df.loc[rows, c].map(cat_codes[c]).fillna(-1).to_numpy()
        else:
            vals = pd.to_numeric(df.loc[rows, c], errors="coerce").to_numpy()
        out[rows, 0] = vals
        out[rows, 1] = col_idx[c]
    return out


def blank_masked_cells(df: pd.DataFrame, mask_col: np.ndarray) -> None:
    """Hide each row's masked cell from the model ("replace" mask type): the
    cell becomes NaN → numerical encodes to the column mean, categorical to
    the NA embedding row."""
    for c in set(mask_col):
        rows = mask_col == c
        df.loc[rows, c] = np.nan


def pack_link_column(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """[src, dst, edge_id] per row (``util/graph.py:27-29``)."""
    ids = np.arange(len(src), dtype=np.float32)
    return np.stack([src.astype(np.float32), dst.astype(np.float32), ids],
                    axis=1)


def pack_target(pretrain: set, link: Optional[np.ndarray],
                mask_target: Optional[np.ndarray],
                supervised: Optional[np.ndarray]) -> Optional[np.ndarray]:
    """Assemble the packed target column (``util/mask.py:37-77``)."""
    if not pretrain:
        if supervised is None:
            return None
        sup = supervised.astype(np.float32).reshape(len(supervised), -1)
        return np.concatenate([sup, link], axis=1) if link is not None else sup
    if {PretrainType.MASK, PretrainType.LINK_PRED}.issubset(pretrain):
        return np.concatenate([mask_target, link], axis=1)
    if PretrainType.MASK in pretrain:
        return mask_target
    if PretrainType.LINK_PRED in pretrain:
        return link
    return None
