"""AML transactions preparation.

Rebuilds ``data/prepare_AML_transactions.py``: raw Kaggle IBM-AML CSV →
training CSV with (a) bank+account columns collapsed into global integer
account IDs, (b) timestamps parsed to unix seconds, (c) float columns
log1p + min-max normalized to [0, 1] (which is what makes the MCM
regression RMSE well-scaled).

Usage: python -m rmm_tpu.datasets.prepare_aml <in.csv> <out.csv>
"""
from __future__ import annotations

import sys

import numpy as np
import pandas as pd


def prepare_aml_transactions(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    # global account ids from (bank, account) pairs; RENAME IN PLACE so
    # the output keeps the reference's column order (Timestamp, From
    # Bank, From ID, To Bank, To ID, ... — the raw Kaggle layout with
    # Account/Account.1 relabeled, prepare_AML_transactions.py:24) —
    # IBMTransactionsAML relabels headerless CSVs positionally to that
    # order (ibm_aml.py:53-54)
    if "Account" in df.columns and "Account.1" in df.columns:
        df = df.rename(columns={"Account": "From ID", "Account.1": "To ID"})
    from_key = df["From Bank"].astype(str) + "_" + df["From ID"].astype(str)
    to_key = df["To Bank"].astype(str) + "_" + df["To ID"].astype(str)
    codes = pd.concat([from_key, to_key]).astype("category").cat
    n = len(df)
    df["From ID"] = codes.codes[:n].to_numpy().astype(np.float64)
    df["To ID"] = codes.codes[n:].to_numpy().astype(np.float64)

    # timestamps → unix seconds (raw Kaggle CSVs carry '%Y/%m/%d %H:%M'
    # strings; pandas may load them as StringDtype, which np.issubdtype
    # cannot interpret — use the pandas dtype API)
    if not pd.api.types.is_numeric_dtype(df["Timestamp"]):
        df["Timestamp"] = (
            # explicit [s] unit: pandas 3 parses to datetime64[us] by
            # default, where astype(int64)//1e9 would yield milli-scale
            # values and collapse day-boundary (temporal_daily) splits
            pd.to_datetime(df["Timestamp"]).astype("datetime64[s]")
            .astype("int64"))

    # log1p + min-max normalize float amount columns
    for col in ("Amount Received", "Amount Paid"):
        if col in df.columns:
            v = np.log1p(pd.to_numeric(df[col], errors="coerce")
                         .to_numpy(dtype=np.float64))
            lo, hi = np.nanmin(v), np.nanmax(v)
            df[col] = (v - lo) / max(hi - lo, 1e-12)
    return df


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    src, dst = argv[0], argv[1]
    df = pd.read_csv(src)
    prepare_aml_transactions(df).to_csv(dst, index=False)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
