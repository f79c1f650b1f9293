"""Mixed-precision (--precision bf16) training: f32 master params, bf16
compute, f32 losses — convergence parity with f32 on the synthetic
fixture."""
import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML
from rmm_tpu.datasets.base import PretrainType
from rmm_tpu.datasets.prepare_aml import prepare_aml_transactions
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config


@pytest.fixture(scope="module")
def prepared_csv(tmp_path_factory):
    from rmm_tpu.datasets.synthetic import synthetic_aml_frame

    df = synthetic_aml_frame(num_rows=600, num_accounts=80, seed=0)
    df = prepare_aml_transactions(df)
    path = str(tmp_path_factory.mktemp("aml") / "prep.csv")
    df.to_csv(path, index=False)
    return path


@pytest.fixture(scope="module")
def sup_ds(prepared_csv):
    return IBMTransactionsAML(root=prepared_csv, pretrain={},
                              khop_neighbors=(4, 4), channels=16,
                              edge_capacity=256, node_capacity=256)


def make_cfg(csv, **kw):
    base = dict(model="tabgnn", data=csv, task="edge_classification",
                batch_size=64, epochs=2, n_hidden=16, n_gnn_layers=1,
                num_neighs=(4, 4), edge_capacity=256, node_capacity=256,
                lr=1e-3, testing=True)
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_bf16_master_params_stay_f32(prepared_csv, sup_ds):
    import jax

    cfg = make_cfg(prepared_csv, precision="bf16", epochs=1)
    tr = Trainer(cfg, sup_ds)
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    for leaf in jax.tree_util.tree_leaves(tr.variables["params"]):
        if np.issubdtype(np.asarray(leaf).dtype, np.floating):
            assert np.asarray(leaf).dtype == np.float32


@pytest.mark.slow
def test_bf16_convergence_parity(prepared_csv, sup_ds):
    """bf16 training reaches comparable quality to f32 on the planted
    fraud signal (the signal is strong; both should find it)."""
    h32, _ = Trainer(make_cfg(prepared_csv, precision="f32"),
                     sup_ds).fit()
    h16, _ = Trainer(make_cfg(prepared_csv, precision="bf16"),
                     sup_ds).fit()
    f32_f1 = max(r["val_f1"] for r in h32)
    bf16_f1 = max(r["val_f1"] for r in h16)
    assert np.isfinite(h16[-1]["loss"])
    assert bf16_f1 >= f32_f1 - 0.15, (bf16_f1, f32_f1)


@pytest.mark.slow
def test_bf16_pretrain_step(prepared_csv):
    from rmm_tpu.train.pretrain import PretrainTrainer

    ds = IBMTransactionsAML(
        root=prepared_csv,
        pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        khop_neighbors=(4, 4), channels=16,
        edge_capacity=256, node_capacity=256)
    cfg = Config(model="tabgnnfused", data=prepared_csv, batch_size=32,
                 epochs=1, n_hidden=16, n_gnn_layers=1, num_neighs=(4, 4),
                 edge_capacity=256, node_capacity=256, lr=2e-4,
                 num_neg_samples=4, testing=True, precision="bf16")
    tr = PretrainTrainer(cfg, ds, mode="mcm-lp")
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])


@pytest.mark.slow
def test_bf16_tabular_and_text_steps(tmp_path):
    """--precision bf16 now also covers the tabular-only MCM trainer and
    the downstream text trainer (f32 losses, finite)."""
    from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.train.tabular import TabularMCMTrainer
    from rmm_tpu.utils.config import Config

    csv = write_synthetic_aml_csv(str(tmp_path / "t.csv"), num_rows=300,
                                  num_accounts=50, seed=0)
    cfg = Config(model="fttransformer", data=csv, batch_size=32,
                 n_hidden=16, n_gnn_layers=1, epochs=1, testing=True,
                 precision="bf16", lr=1e-3)
    ds = IBMTransactionsAML(root=csv, pretrain={PretrainType.MASK},
                            channels=cfg.n_hidden)
    tr = TabularMCMTrainer(cfg, ds.edges)
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    # master params stay f32
    import jax
    for leaf in jax.tree_util.tree_leaves(tr.params):
        if hasattr(leaf, "dtype") and "float" in str(leaf.dtype):
            assert leaf.dtype == np.float32
