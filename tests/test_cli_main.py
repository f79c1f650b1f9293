"""argv-level smoke for the supervised CLI (main.py analogue) and the
tabular-only SSL CLI (fttransformer.py analogue) — the arg-parsing/wiring
layer above the heavily-tested trainers."""
import os

import numpy as np
import pytest

from rmm_tpu.datasets.synthetic import write_synthetic_aml_csv

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


def test_main_cli_train_save_resume(tmp_path):
    csv = str(tmp_path / "aml.csv")
    write_synthetic_aml_csv(csv, num_rows=400, num_accounts=60, seed=0)
    from rmm_tpu.cli import main as cli_main

    wandb_dir = str(tmp_path / "wandb")
    common = [
        "--data", csv, "--model", "tabgnn", "--task", "edge_classification",
        "--batch_size", "32", "--n_hidden", "16", "--n_gnn_layers", "1",
        "--num_neighs", "4", "4", "--edge_capacity", "256",
        "--node_capacity", "256", "--testing", "--wandb_dir", wandb_dir,
    ]
    hist, best = cli_main.main(common + ["--epochs", "2", "--save_model"])
    assert len(hist) == 2 and np.isfinite(hist[-1]["loss"])
    # per-epoch dir pruning: only the last epoch's checkpoint remains
    run_dirs = [d for d in os.listdir(wandb_dir)]
    assert len(run_dirs) == 1
    run = os.path.join(wandb_dir, run_dirs[0])
    assert os.path.isdir(os.path.join(run, "1"))
    assert not os.path.exists(os.path.join(run, "0"))

    # resume from the saved epoch (reference main.py:195-210 semantics)
    hist2, _ = cli_main.main(common + [
        "--epochs", "1", "--checkpoint",
        "--load_model", os.path.join(run, "1")])
    assert hist2[0]["epoch"] == 2


def test_fttransformer_cli_mcm(tmp_path):
    csv = str(tmp_path / "aml.csv")
    write_synthetic_aml_csv(csv, num_rows=300, num_accounts=50, seed=1)
    from rmm_tpu.cli import fttransformer

    hist, best = fttransformer.main([
        "--dataset", csv, "--epochs", "1", "--batch_size", "32",
        "--channels", "8", "--num_layers", "1", "--testing",
    ])
    assert np.isfinite(hist[-1]["loss"])
    assert "val_rmse" in hist[-1] or "rmse" in str(best)
