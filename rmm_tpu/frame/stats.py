"""Column statistics computed at materialization time.

Replaces the surface of ``torch_frame.data.stats.StatType`` used by the
reference (``main.py:303`` — ``StatType.COUNT`` for categorical
cardinalities; LinearEncoder normalization needs mean/std).
"""
from __future__ import annotations

import enum
from typing import Any

import numpy as np
import pandas as pd


class StatType(enum.Enum):
    COUNT = "COUNT"            # (ordered category values, counts) — count-desc
    MEAN = "MEAN"
    STD = "STD"
    QUANTILES = "QUANTILES"    # [min, 25%, 50%, 75%, max]
    YEAR_RANGE = "YEAR_RANGE"  # [min_year, max_year] for timestamps
    MULTI_COUNT = "MULTI_COUNT"
    EMB_DIM = "EMB_DIM"


def compute_numerical_stats(ser: pd.Series) -> dict[StatType, Any]:
    vals = pd.to_numeric(ser, errors="coerce").to_numpy(dtype=np.float64)
    finite = vals[np.isfinite(vals)]
    if finite.size == 0:
        finite = np.zeros(1)
    return {
        StatType.MEAN: float(finite.mean()),
        StatType.STD: float(finite.std()),
        StatType.QUANTILES: [
            float(np.quantile(finite, q)) for q in (0.0, 0.25, 0.5, 0.75, 1.0)
        ],
    }


def compute_categorical_stats(ser: pd.Series) -> dict[StatType, Any]:
    counts = ser.dropna().value_counts()  # count-desc, ties by first-seen
    return {StatType.COUNT: (list(counts.index), counts.to_list())}


def compute_timestamp_stats(ser: pd.Series) -> dict[StatType, Any]:
    vals = pd.to_numeric(ser, errors="coerce").dropna().to_numpy(dtype=np.int64)
    if vals.size == 0:
        vals = np.zeros(1, dtype=np.int64)
    years = 1970 + vals / (365.2425 * 24 * 3600)
    return {StatType.YEAR_RANGE: [int(years.min()), int(years.max())]}


def compute_col_stats(ser: pd.Series, st) -> dict[StatType, Any]:
    from .stype import Stype

    if st == Stype.numerical:
        return compute_numerical_stats(ser)
    if st == Stype.categorical:
        return compute_categorical_stats(ser)
    if st == Stype.timestamp:
        return compute_timestamp_stats(ser)
    if st == Stype.multicategorical:
        flat: list[Any] = []
        for row in ser.dropna():
            if isinstance(row, (list, tuple, set)):
                flat.extend(row)
            else:
                flat.extend(str(row).split("|"))
        counts = pd.Series(flat).value_counts() if flat else pd.Series(dtype=int)
        return {StatType.MULTI_COUNT: (list(counts.index), counts.to_list())}
    if st == Stype.text_embedded or st == Stype.embedding:
        first = next((v for v in ser if v is not None), None)
        dim = int(len(first)) if first is not None else 0
        return {StatType.EMB_DIM: dim}
    return {}
