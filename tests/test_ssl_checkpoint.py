"""SSL checkpoint / resume / export + SSL→supervised transfer (the
reference's two-stage workflow: ``fused.py:420-446,698-766`` per-epoch +
best-metric saves, ``main.py:271-276`` strict=False encoder transfer,
``:347-350`` backbone freeze)."""
import os

import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML
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


def _leaves_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


@pytest.fixture(scope="module")
def pretrain_run(prepared_csv, ds, tmp_path_factory):
    """One mcm-lp epoch with checkpointing; shared across the tests."""
    run_dir = str(tmp_path_factory.mktemp("ssl_run"))
    cfg = make_cfg(data=prepared_csv)
    tr = PretrainTrainer(cfg, ds, mode="mcm-lp")
    hist, best = tr.fit(run_dir=run_dir)
    return run_dir, cfg, tr, hist, best


def test_pretrain_saves_components_and_best(pretrain_run):
    run_dir, _, _, hist, best = pretrain_run
    ck = os.path.join(run_dir, "0")
    for comp in ("edge_encoder", "model", "mcm_head", "lp_head",
                 "opt_state", "best_m.json"):
        assert os.path.exists(os.path.join(ck, comp)), comp
    # epoch 0 improved on the -inf initial best → best-metric exports
    assert os.path.isdir(os.path.join(run_dir, "best_acc"))
    assert os.path.isdir(os.path.join(run_dir, "best_mrr"))
    assert os.path.isdir(os.path.join(run_dir, "best_rmse"))
    # best dirs carry weights but no optimizer state
    assert not os.path.exists(
        os.path.join(run_dir, "best_acc", "opt_state"))
    assert np.isfinite(hist[-1]["loss"]) and best["mrr"] > 0


def test_pretrain_restore_roundtrip(prepared_csv, ds, pretrain_run):
    run_dir, cfg, tr, _, best = pretrain_run
    fresh = PretrainTrainer(cfg, ds, mode="mcm-lp")
    assert not _leaves_equal(fresh.params, tr.params)  # different init
    rbest = fresh.restore(os.path.join(run_dir, "0"))
    assert _leaves_equal(fresh.params, tr.params)
    assert _leaves_equal(fresh.opt_state, tr.opt_state)
    assert rbest["mrr"] == pytest.approx(best["mrr"])
    # restored trainer evaluates identically
    va = ds.edges.split()[1]
    m1 = tr.evaluate(va, "val")
    m2 = fresh.evaluate(va, "val")
    assert m1["mrr"] == pytest.approx(m2["mrr"], rel=1e-5)


def test_pretrain_resume_continues(prepared_csv, ds, pretrain_run, tmp_path):
    import shutil

    src_dir, cfg, _, _, _ = pretrain_run
    # work on a copy so the shared fixture's run_dir stays at epoch 0
    run_dir = str(tmp_path / "resumed")
    shutil.copytree(src_dir, run_dir)
    tr2 = PretrainTrainer(cfg, ds, mode="mcm-lp")
    best = tr2.restore(os.path.join(run_dir, "0"))
    hist2, _ = tr2.fit(run_dir=run_dir, start_epoch=1, best=best)
    assert hist2[0]["epoch"] == 1
    assert np.isfinite(hist2[0]["loss"])
    # epoch 1 checkpoint written, epoch 0 pruned (main.py:397-405 scheme)
    assert os.path.isdir(os.path.join(run_dir, "1"))
    assert not os.path.exists(os.path.join(run_dir, "0"))


def test_ssl_to_supervised_transfer_and_freeze(prepared_csv, pretrain_run):
    """The full two-stage chain: pretrained encoder → supervised trainer
    via load_components (strict=False semantics), then one frozen-backbone
    train epoch."""
    from rmm_tpu.train.trainer import Trainer
    from rmm_tpu.utils.checkpoint import load_components

    run_dir, pcfg, ptr, _, _ = pretrain_run
    sup = IBMTransactionsAML(root=prepared_csv, pretrain={},
                             khop_neighbors=(4, 4),
                             channels=pcfg.n_hidden,
                             edge_capacity=256, node_capacity=256)
    cfg = make_cfg(data=prepared_csv, model="tabgnn",
                   task="edge_classification", epochs=1)
    trainer = Trainer(cfg, sup, freeze_tabular=True)
    before = trainer.variables["params"]["edge_encoder"]
    trainer.variables = load_components(
        os.path.join(run_dir, "best_mrr"), trainer.variables,
        ["node_encoder", "edge_encoder"])
    after = trainer.variables["params"]["edge_encoder"]
    # encoder weights actually changed to the pretrained ones
    assert not _leaves_equal(before, after)
    assert _leaves_equal(after, ptr.params["encoder"]["params"])
    import jax

    def tab_layers(params):
        return [np.asarray(v) for p, v in
                jax.tree_util.tree_leaves_with_path(params["model"])
                if "tab_layer" in str(p)]

    frozen_before = tab_layers(trainer.variables["params"])
    hist, best = trainer.fit()
    assert np.isfinite(hist[-1]["loss"])
    # frozen tabular backbone layers must not move (main.py:347-350);
    # the transferred encoder remains trainable
    frozen_after = tab_layers(trainer.variables["params"])
    assert frozen_before and all(
        np.array_equal(a, b) for a, b in zip(frozen_before, frozen_after))


def test_tabular_save_restore_resume(prepared_csv, tmp_path):
    cfg = make_cfg(data=prepared_csv, model="fttransformer", epochs=1)
    dsm = IBMTransactionsAML(root=prepared_csv,
                             pretrain={PretrainType.MASK},
                             channels=cfg.n_hidden)
    run_dir = str(tmp_path / "tab_run")
    tr = TabularMCMTrainer(cfg, dsm.edges)
    hist, best = tr.fit(run_dir=run_dir)
    ck = os.path.join(run_dir, "0")
    for comp in ("edge_encoder", "model", "head", "opt_state"):
        assert os.path.exists(os.path.join(ck, comp)), comp
    fresh = TabularMCMTrainer(cfg, dsm.edges)
    rbest = fresh.restore(ck)
    assert _leaves_equal(fresh.params, tr.params)
    assert rbest["rmse"] == pytest.approx(best["rmse"])
    hist2, _ = fresh.fit(run_dir=run_dir, start_epoch=1, best=rbest)
    assert hist2[0]["epoch"] == 1 and np.isfinite(hist2[0]["loss"])
