"""Smoke tests for the profiling-harness CLI (reference benchmark.py):
both loops produce per-phase timing tables and a rows/sec figure."""
import numpy as np
import pytest

from rmm_tpu.datasets.synthetic import write_synthetic_aml_csv

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def csv(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aml") / "bench.csv")
    return write_synthetic_aml_csv(path, num_rows=400, num_accounts=60,
                                   seed=0)


def test_benchmark_cli_supervised(csv, tmp_path):
    from rmm_tpu.cli import benchmark

    out = benchmark.main([
        "--data", csv, "--model", "tabgnn", "--batch_size", "16",
        "--n_hidden", "8", "--n_gnn_layers", "1", "--num_neighs", "4", "4",
        "--testing", "--iters", "3",
    ])
    assert out["train_rows_per_sec"] > 0
    for phase in ("pre-processing", "cpu-to-device", "forward",
                  "train-step", "copy-back"):
        assert phase in out["phases"], phase
        assert np.isfinite(out["phases"][phase]["mean_ms"])


def test_benchmark_cli_pretrain_loop(csv):
    from rmm_tpu.cli import benchmark

    out = benchmark.main([
        "--data", csv, "--model", "tabgnnfused", "--batch_size", "16",
        "--n_hidden", "8", "--n_gnn_layers", "1", "--num_neighs", "4", "4",
        "--testing", "--iters", "2", "--loop", "mcm-lp",
    ])
    assert out["loop"] == "pretrain:mcm-lp"
    assert out["rows_per_sec"] > 0
    assert "train-step" in out["phases"]
