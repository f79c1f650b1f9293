"""Evaluation metrics: F1, MRR/Hits@k, MCM accuracy/RMSE.

Rebuilds ``src/utils/metric.py``. The reference ranks each positive against
its negatives with a per-edge numpy argsort-of-argsort loop
(``metric.py:10-52``); here ranking is one vectorized comparison (rank =
1 + #{neg ≥ pos}, which matches stable descending argsort with the positive
appended last — ties rank the positive after equal negatives, as in the
reference). F1 mirrors sklearn's binary/weighted modes used at
``main.py:94-97``.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def f1_score(y_true, y_pred, average: str = "binary") -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    labels = np.unique(np.concatenate([y_true, y_pred]))

    def f1_for(c):
        tp = np.sum((y_pred == c) & (y_true == c))
        fp = np.sum((y_pred == c) & (y_true != c))
        fn = np.sum((y_pred != c) & (y_true == c))
        denom = 2 * tp + fp + fn
        return 2 * tp / denom if denom > 0 else 0.0

    if average == "binary":
        return float(f1_for(1))
    if average == "weighted":
        support = np.array([(y_true == c).sum() for c in labels], dtype=float)
        scores = np.array([f1_for(c) for c in labels])
        total = support.sum()
        return float((scores * support).sum() / total) if total else 0.0
    raise ValueError(average)


class SSMetric:
    """Self-supervised metrics (``src/utils/metric.py:6-66``)."""

    def __init__(self, num_numerical: int):
        self.num_numerical = num_numerical

    @staticmethod
    def mrr(pos_pred, neg_pred, ks: Sequence[int], num_neg_samples: int):
        """MRR + Hits@k ranking each positive among its own negatives."""
        pos = np.asarray(pos_pred).reshape(-1)
        neg = np.asarray(neg_pred).reshape(len(pos), num_neg_samples)
        ranks = 1 + (neg >= pos[:, None]).sum(axis=1)
        mrr = float(np.mean(1.0 / ranks))
        hits = {f"hits@{k}": float(np.mean(ranks <= k)) for k in ks}
        return mrr, hits

    def mv_accuracy(self, mv_out, y) -> float:
        """Fraction of rows whose argmax matches the masked-column index
        (``metric.py:54-66``)."""
        mv_out = np.asarray(mv_out)
        idx = np.asarray(y)[:, 1].astype(int)
        return float(np.mean(mv_out.argmax(axis=1) == idx))


class MCMAccumulator:
    """Streams MCM eval accuracy/RMSE over batches
    (``fused.py:164-177`` accumulators)."""

    def __init__(self, num_numerical: int):
        self.num_numerical = num_numerical
        self.acc_sum = 0.0
        self.l2_sum = 0.0
        self.t_c = 0
        self.t_n = 0

    def update(self, cat_out, num_out, y, valid=None):
        y = np.asarray(y)
        num_out = np.asarray(num_out)
        n = len(y) if valid is None else int(valid)
        for i in range(n):
            val, idx = y[i, 0], int(y[i, 1])
            if idx >= self.num_numerical:
                logits = np.asarray(cat_out[idx - self.num_numerical])[i]
                self.acc_sum += float(logits.argmax() == int(val))
                self.t_c += 1
            else:
                self.l2_sum += float((val - num_out[i, idx]) ** 2)
                self.t_n += 1

    @property
    def accuracy(self) -> float:
        return self.acc_sum / max(self.t_c, 1)

    @property
    def rmse(self) -> float:
        return float(np.sqrt(self.l2_sum / max(self.t_n, 1)))
