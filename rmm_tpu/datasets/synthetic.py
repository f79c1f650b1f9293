"""Synthetic dataset generators — the dummy.csv-style fixtures the
reference leans on for smoke tests and profiling (``test/ibm.py:6``,
``benchmark.py:111``)."""
from __future__ import annotations

import numpy as np
import pandas as pd


def synthetic_aml_frame(num_rows: int = 2000, num_accounts: int = 300,
                        num_days: int = 10, fraud_rate: float = 0.1,
                        seed: int = 0) -> pd.DataFrame:
    """AML-shaped transactions with a planted fraud signal: laundering
    transactions skew to large amounts, a specific currency pair and a
    small ring of accounts, so models have structure to learn."""
    rng = np.random.RandomState(seed)
    n = num_rows
    is_fraud = rng.rand(n) < fraud_rate
    ring = rng.choice(num_accounts, size=max(num_accounts // 20, 2),
                      replace=False)

    from_id = rng.randint(0, num_accounts, n)
    to_id = rng.randint(0, num_accounts, n)
    from_id[is_fraud] = rng.choice(ring, is_fraud.sum())
    to_id[is_fraud] = rng.choice(ring, is_fraud.sum())
    amount = np.where(is_fraud, rng.lognormal(6, 1, n), rng.lognormal(3, 1, n))
    currencies = np.array(["USD", "EUR", "GBP", "BTC"])
    pay_cur = currencies[rng.randint(0, 4, n)]
    pay_cur[is_fraud & (rng.rand(n) < 0.7)] = "BTC"
    formats = np.array(["Wire", "ACH", "Cheque", "Card", "Bitcoin"])
    fmt = formats[rng.randint(0, 5, n)]
    fmt[is_fraud & (rng.rand(n) < 0.6)] = "Bitcoin"

    return pd.DataFrame({
        "Timestamp": rng.randint(0, num_days * 86400, n).astype(np.int64),
        "From Bank": rng.randint(0, 10, n),
        "From ID": from_id.astype(np.float64),
        "To Bank": rng.randint(0, 10, n),
        "To ID": to_id.astype(np.float64),
        "Amount Received": amount,
        "Receiving Currency": currencies[rng.randint(0, 4, n)],
        "Amount Paid": amount,
        "Payment Currency": pay_cur,
        "Payment Format": fmt,
        "Is Laundering": is_fraud.astype(int).astype(str),
    })


def write_synthetic_aml_csv(path: str, **kw) -> str:
    synthetic_aml_frame(**kw).to_csv(path, index=False)
    return path
