"""End-to-end training with the in-jit device sampler (sampler="device")."""
import os

import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def small_ds(tmp_path_factory):
    csv = str(tmp_path_factory.mktemp("devsamp") / "aml.csv")
    write_synthetic_aml_csv(csv, num_rows=800, num_accounts=120, seed=0)
    return csv


def make(csv, **over):
    kw = dict(sampler="device")
    kw.update(over)
    cfg = Config(model="tabgnn", data=csv, task="edge_classification",
                 batch_size=32, n_hidden=8, n_gnn_layers=1,
                 num_neighs=(4, 4), epochs=1, steps_per_dispatch=2,
                 testing=True, **kw)
    ds = IBMTransactionsAML(root=csv, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden)
    return cfg, ds, Trainer(cfg, ds)


def test_device_sampler_trains_and_evaluates(small_ds):
    cfg, ds, tr = make(small_ds)
    assert tr._use_device_sampler() or os.environ.get(
        "JAX_PLATFORMS") != "cpu"  # explicit "device" wins even on cpu
    view = ds.edges.split()[0]
    m0 = tr.train_epoch(view, 0)
    assert np.isfinite(m0["loss"])
    assert 0.0 <= m0["drop_rate"] <= 1.0
    ev = tr.evaluate(ds.edges.split()[1], "val")
    assert 0.0 <= ev["f1"] <= 1.0

    # epoch freshness: device path must also resample per epoch — params
    # keep moving and the loss changes
    m1 = tr.train_epoch(view, 1)
    assert m1["loss"] != m0["loss"]


def test_node_task_device_sampler(tmp_path):
    from rmm_tpu.datasets.elliptic import EllipticBitcoin
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset

    root = write_synthetic_node_dataset(str(tmp_path / "ell"),
                                        family="elliptic")
    ds = EllipticBitcoin(root=root, khop_neighbors=(4, 4),
                         edge_capacity=1024, node_capacity=512)
    cfg = Config(model="tabgnn", task="node_classification", n_classes=2,
                 batch_size=64, epochs=1, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(4, 4), lr=1e-3, sampler="device",
                 edge_capacity=1024, node_capacity=512, testing=True)
    tr = Trainer(cfg, ds)
    hist, best = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    # ignore-label rows excluded from the loss mask but still sample
    sb = next(iter(tr._seed_batches(ds.nodes.split()[0], "train")))
    labels = np.asarray(sb.y[:, 0])
    assert not (labels[np.asarray(sb.seed_mask)] == 2).any()
    assert sb.sample_mask.sum() >= sb.seed_mask.sum()


def test_device_and_host_paths_agree_on_metric_scale(small_ds):
    """Not bit-identical (different samplers) but both must learn."""
    _, ds_d, tr_d = make(small_ds)
    _, ds_h, tr_h = make(small_ds, sampler="host")
    vd = ds_d.edges.split()[0]
    vh = ds_h.edges.split()[0]
    for ep in range(2):
        ld = tr_d.train_epoch(vd, ep)["loss"]
        lh = tr_h.train_epoch(vh, ep)["loss"]
    assert np.isfinite(ld) and np.isfinite(lh)
    assert abs(ld - lh) < 1.0


def test_pretrain_device_sampler(tmp_path):
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.datasets.prepare_aml import prepare_aml_transactions
    from rmm_tpu.datasets.synthetic import synthetic_aml_frame
    from rmm_tpu.train.pretrain import PretrainTrainer

    df = prepare_aml_transactions(
        synthetic_aml_frame(num_rows=500, num_accounts=60, seed=0))
    csv = str(tmp_path / "prep.csv")
    df.to_csv(csv, index=False)
    cfg = Config(model="tabgnnfused", data=csv, batch_size=32, epochs=1,
                 n_hidden=16, n_gnn_layers=1, num_neighs=(4, 4),
                 edge_capacity=256, node_capacity=256, lr=2e-4,
                 num_neg_samples=4, steps_per_dispatch=2,
                 sampler="device", testing=True)
    ds = IBMTransactionsAML(
        root=csv, pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        khop_neighbors=cfg.num_neighs, channels=cfg.n_hidden,
        edge_capacity=cfg.edge_capacity, node_capacity=cfg.node_capacity)
    tr = PretrainTrainer(cfg, ds, mode="mcm-lp")
    hist, _ = tr.fit()
    rec = hist[-1]
    assert np.isfinite(rec["loss"])
    assert 0.0 < rec["val_mrr"] <= 1.0


def test_node_task_dp_device_sampler(tmp_path):
    """node classification × --dp × --sampler device: the DP device step
    routes node-seeded SeedBatches through sample_nodes_device per chip."""
    from rmm_tpu.datasets.elliptic import EllipticBitcoin
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset
    from rmm_tpu.train.dp_trainer import DataParallelTrainer

    root = write_synthetic_node_dataset(str(tmp_path / "ell"),
                                        family="elliptic")
    ds = EllipticBitcoin(root=root, khop_neighbors=(4, 4),
                         edge_capacity=1024, node_capacity=512)
    cfg = Config(model="tabgnn", task="node_classification", n_classes=2,
                 batch_size=32, epochs=1, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(4, 4), lr=1e-3, sampler="device",
                 edge_capacity=1024, node_capacity=512, testing=True)
    tr = DataParallelTrainer(cfg, ds, n_devices=4)
    hist, best = tr.fit()
    assert hist[-1]["chips"] == 4
    assert np.isfinite(hist[-1]["loss"])
