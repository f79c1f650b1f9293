"""End-to-end training tests on synthetic AML (the dummy.csv strategy of
the reference, SURVEY §4)."""
import os

import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
from rmm_tpu.datasets.base import PretrainType
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def synth_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("aml") / "synth.csv"
    return write_synthetic_aml_csv(str(path), num_rows=1200,
                                   num_accounts=120, seed=0)


BASE = dict(batch_size=128, epochs=1, n_hidden=16, n_gnn_layers=1,
            num_neighs=(8, 8), edge_capacity=1024, node_capacity=512,
            lr=1e-3, testing=True)


def make_ds(csv, cfg, pretrain=None):
    return IBMTransactionsAML(
        root=csv, pretrain=pretrain, khop_neighbors=cfg.num_neighs,
        channels=cfg.n_hidden, edge_capacity=cfg.edge_capacity,
        node_capacity=cfg.node_capacity)


def test_fttransformer_learns(synth_csv):
    cfg = Config(model="fttransformer", data=synth_csv,
                 task="edge_classification", **{**BASE, "epochs": 3})
    ds = make_ds(synth_csv, cfg)
    tr = Trainer(cfg, ds)
    hist, best = tr.fit()
    # planted fraud signal is learnable: F1 should clearly beat chance
    assert hist[-1]["f1"] > 0.3
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_tabgnn_trains_one_epoch(synth_csv):
    cfg = Config(model="tabgnn", data=synth_csv,
                 task="edge_classification", **BASE)
    tr = Trainer(cfg, make_ds(synth_csv, cfg))
    hist, best = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    assert 0.0 <= hist[-1]["f1"] <= 1.0


def test_mcm_task_trains(synth_csv):
    cfg = Config(model="tabgnn", data=synth_csv, task="mcm_edge_table",
                 **BASE)
    ds = make_ds(synth_csv, cfg,
                 pretrain={PretrainType.MASK, PretrainType.LINK_PRED})
    tr = Trainer(cfg, ds)
    hist, best = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    assert 0.0 <= hist[-1]["train_acc"] <= 1.0


def test_checkpoint_roundtrip_and_encoder_transfer(synth_csv, tmp_path):
    import jax
    from rmm_tpu.utils.checkpoint import load_components, save_checkpoint

    cfg = Config(model="fttransformer", data=synth_csv,
                 task="edge_classification", **BASE)
    tr = Trainer(cfg, make_ds(synth_csv, cfg))
    run_dir = str(tmp_path / "run")
    tr.fit(run_dir=run_dir)
    ck = f"{run_dir}/0"

    tr2 = Trainer(cfg, make_ds(synth_csv, cfg))
    before = jax.tree_util.tree_leaves(
        tr2.variables["params"]["edge_encoder"])[0]
    tr2.variables = load_components(ck, tr2.variables,
                                    ["node_encoder", "edge_encoder"])
    after_tree = tr2.variables["params"]["edge_encoder"]
    trained_tree = tr.variables["params"]["edge_encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(after_tree),
                    jax.tree_util.tree_leaves(trained_tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # full restore
    tr3 = Trainer(cfg, make_ds(synth_csv, cfg))
    tr3.variables = load_components(ck, tr3.variables)
    for a, b in zip(jax.tree_util.tree_leaves(tr3.variables["params"]),
                    jax.tree_util.tree_leaves(tr.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_supervised_checkpoint_across_scan_layouts(synth_csv, tmp_path):
    """A tabgnnfused checkpoint saved UNROLLED restores into a trainer
    built with --scan_layers (and evaluates identically) — the layout
    bridge working through the full task-model tree."""
    from rmm_tpu.utils.checkpoint import load_components

    def cfg_of(scan):
        return Config(model="tabgnnfused", data=synth_csv,
                      task="edge_classification", batch_size=32,
                      n_hidden=16, n_gnn_layers=2, num_neighs=(4, 4),
                      edge_capacity=256, node_capacity=256, epochs=1,
                      testing=True, lr=1e-3, scan_layers=scan)

    def make_ds(cfg):
        return IBMTransactionsAML(root=synth_csv,
                                  khop_neighbors=cfg.num_neighs,
                                  channels=cfg.n_hidden,
                                  edge_capacity=cfg.edge_capacity,
                                  node_capacity=cfg.node_capacity)

    cfg_u = cfg_of(False)
    tr_u = Trainer(cfg_u, make_ds(cfg_u))
    run_dir = str(tmp_path / "run")
    tr_u.fit(run_dir=run_dir)
    va = tr_u.dataset.edges.split()[1]
    ref = tr_u.evaluate(va, "val")

    cfg_s = cfg_of(True)
    tr_s = Trainer(cfg_s, make_ds(cfg_s))
    tr_s.variables = load_components(os.path.join(run_dir, "0"),
                                     tr_s.variables)
    assert "layers" in tr_s.variables["params"]["model"]
    got = tr_s.evaluate(va, "val")
    assert got["f1"] == pytest.approx(ref["f1"], abs=1e-6)
