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
    # global account ids from (bank, account) pairs
    if "Account" in df.columns and "Account.1" in df.columns:
        from_key = df["From Bank"].astype(str) + "_" + df["Account"].astype(str)
        to_key = df["To Bank"].astype(str) + "_" + df["Account.1"].astype(str)
    else:
        from_key = df["From Bank"].astype(str) + "_" + df["From ID"].astype(str)
        to_key = df["To Bank"].astype(str) + "_" + df["To ID"].astype(str)
    codes = pd.concat([from_key, to_key]).astype("category").cat
    n = len(df)
    df["From ID"] = codes.codes[:n].to_numpy().astype(np.float64)
    df["To ID"] = codes.codes[n:].to_numpy().astype(np.float64)
    df = df.drop(columns=[c for c in ("Account", "Account.1")
                          if c in df.columns])

    # timestamps → unix seconds
    if not np.issubdtype(df["Timestamp"].dtype, np.number):
        df["Timestamp"] = (
            pd.to_datetime(df["Timestamp"]).astype("int64") // 10**9)

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
