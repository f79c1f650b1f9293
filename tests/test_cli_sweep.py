"""Sweep-runner smoke (reference supervised_sweep.py / fused_sweep.py):
random search over the documented spaces, JSONL leaderboard."""
import json
import os

import numpy as np
import pytest

from rmm_tpu.datasets.synthetic import write_synthetic_aml_csv

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


def test_sweep_supervised_two_trials(tmp_path):
    csv = str(tmp_path / "aml.csv")
    write_synthetic_aml_csv(csv, num_rows=400, num_accounts=60, seed=0)
    from rmm_tpu.cli import sweep

    out = str(tmp_path / "results.jsonl")
    results, best = sweep.main([
        "--kind", "supervised", "--data", csv, "--model", "tabgnn",
        "--trials", "2", "--epochs", "1", "--batch_size", "32",
        "--num_neighs", "4", "4", "--edge_capacity", "256",
        "--node_capacity", "256", "--out", out, "--testing",
    ])
    assert len(results) == 2
    assert best is not None and np.isfinite(best["val_f1"])
    with open(out) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 2
    # sampled params differ across trials (the search actually searches)
    assert rows[0]["params"] != rows[1]["params"]
