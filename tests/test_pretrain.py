"""Tests for the SSL pretrainers (fused joint MCM+LP, tabular MCM, MoCo)."""
import numpy as np
import pandas as pd
import pytest

from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
from rmm_tpu.datasets.base import PretrainType
from rmm_tpu.datasets.prepare_aml import prepare_aml_transactions
from rmm_tpu.train.pretrain import PretrainTrainer
from rmm_tpu.train.tabular import TabularMCMTrainer
from rmm_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def prepared_csv(tmp_path_factory):
    from rmm_tpu.datasets.synthetic import synthetic_aml_frame

    df = synthetic_aml_frame(num_rows=500, num_accounts=60, seed=0)
    df = prepare_aml_transactions(df)
    path = str(tmp_path_factory.mktemp("aml") / "prep.csv")
    df.to_csv(path, index=False)
    return path


def make_cfg(**kw):
    base = dict(model="tabgnnfused", batch_size=32, epochs=1, n_hidden=16,
                n_gnn_layers=1, num_neighs=(4, 4), edge_capacity=256,
                node_capacity=256, lr=2e-4, num_neg_samples=4, testing=True)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def ds(prepared_csv):
    cfg = make_cfg(data=prepared_csv)
    return IBMTransactionsAML(
        root=prepared_csv,
        pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        khop_neighbors=cfg.num_neighs, channels=cfg.n_hidden,
        edge_capacity=cfg.edge_capacity, node_capacity=cfg.node_capacity)


def test_prepare_normalizes_amounts(prepared_csv):
    df = pd.read_csv(prepared_csv)
    assert df["Amount Paid"].min() >= 0.0
    assert df["Amount Paid"].max() <= 1.0


@pytest.mark.parametrize("mode", ["lp", "mcm", "mcm-lp"])
def test_pretrain_modes(prepared_csv, ds, mode):
    cfg = make_cfg(data=prepared_csv)
    tr = PretrainTrainer(cfg, ds, mode=mode)
    hist, best = tr.fit()
    rec = hist[-1]
    assert np.isfinite(rec["loss"])
    if "lp" in mode:
        assert 0.0 < rec["val_mrr"] <= 1.0
        assert rec["val_hits@1"] <= rec["val_hits@5"]
    if "mcm" in mode:
        # normalized amounts → val rmse must be O(1), not O(raw amount)
        assert rec["val_rmse"] < 5.0
        assert 0.0 <= rec["val_accuracy"] <= 1.0


def test_moco_weighting_runs(prepared_csv, ds):
    cfg = make_cfg(data=prepared_csv, moo="moco")
    tr = PretrainTrainer(cfg, ds, mode="mcm-lp")
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    lam = np.asarray(tr.moco_state.lambd)
    np.testing.assert_allclose(lam.sum(), 1.0, rtol=1e-5)  # simplex weights


def test_tabular_mcm_trains(prepared_csv):
    cfg = make_cfg(data=prepared_csv, model="fttransformer", epochs=2)
    dsm = IBMTransactionsAML(root=prepared_csv,
                             pretrain={PretrainType.MASK},
                             channels=cfg.n_hidden)
    tr = TabularMCMTrainer(cfg, dsm.edges)
    hist, best = tr.fit()
    assert hist[-1]["loss"] < hist[0]["loss"] * 1.05
    assert best["rmse"] < 5.0


def test_tabular_mcm_with_mask_vector(prepared_csv):
    cfg = make_cfg(data=prepared_csv, model="fttransformer", epochs=1)
    dsm = IBMTransactionsAML(root=prepared_csv,
                             pretrain={PretrainType.MASK},
                             channels=cfg.n_hidden)
    tr = TabularMCMTrainer(cfg, dsm.edges, mask_vector=True)
    hist, best = tr.fit()
    import numpy as np
    assert np.isfinite(hist[-1]["loss"])
    assert 0.0 <= hist[-1]["val_mv_accuracy"] <= 1.0
