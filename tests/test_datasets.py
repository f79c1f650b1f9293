"""Tests for the full dataset family zoo on synthetic fixtures."""
import numpy as np
import pytest

from rmm_tpu.datasets.base import PretrainType
from rmm_tpu.datasets.elliptic import EllipticBitcoin
from rmm_tpu.datasets.eth_phishing import EthereumPhishing
from rmm_tpu.datasets.lastfm_asia import LastFMAsia
from rmm_tpu.datasets.musae_github import MusaeGitHub
from rmm_tpu.datasets.ogbn_arxiv import OgbnArxiv
from rmm_tpu.datasets.rel_hm import RelHM
from rmm_tpu.datasets.synthetic import (
    write_synthetic_hm_csv,
    write_synthetic_node_dataset,
)
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config

CAP = dict(edge_capacity=1024, node_capacity=512)
SMALL = dict(khop_neighbors=(6, 6), **CAP)


def cfg_for(task, n_classes, model="tabgnn"):
    return Config(model=model, task=task, n_classes=n_classes,
                  batch_size=64, epochs=1, n_hidden=16, n_gnn_layers=1,
                  num_neighs=(6, 6), lr=1e-3, testing=True, **CAP)


@pytest.mark.parametrize("family,cls,n_classes", [
    ("ogbn", OgbnArxiv, 4),
    ("musae", MusaeGitHub, 2),
    ("lastfm", LastFMAsia, 4),
])
@pytest.mark.slow
def test_node_families_train(tmp_path, family, cls, n_classes):
    root = write_synthetic_node_dataset(str(tmp_path / family),
                                        family=family, n_classes=n_classes)
    kw = dict(SMALL)
    if family == "lastfm":
        kw["n_classes"] = n_classes
    ds = cls(root=root, **kw)
    cfg = cfg_for("node_classification", ds.n_classes)
    tr = Trainer(cfg, ds)
    hist, best = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    assert 0.0 <= best <= 1.0


@pytest.mark.slow
def test_elliptic_masks_unknown_class(tmp_path):
    root = write_synthetic_node_dataset(str(tmp_path / "ell"),
                                        family="elliptic")
    ds = EllipticBitcoin(root=root, **SMALL)
    assert ds.ignore_label == 2
    cfg = cfg_for("node_classification", 2)
    tr = Trainer(cfg, ds)
    gb = next(iter(tr._batches(ds.nodes.split()[0], "train")))
    labels = np.asarray(gb.y[:, 0])
    assert not (labels[np.asarray(gb.seed_mask)] == 2).any()
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])


@pytest.mark.slow
def test_eth_phishing_node_and_mcm(tmp_path):
    root = write_synthetic_node_dataset(str(tmp_path / "eth"), family="eth")
    ds = EthereumPhishing(
        root=root, pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        use_cutoffs=True, **SMALL)
    # node classification path
    cfg = cfg_for("node_classification", 2)
    tr = Trainer(cfg, ds)
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    # edge-seeded mcm path (the eth-specific get_mcm_inputs)
    cfg = cfg_for("mcm_edge_table", 2)
    tr = Trainer(cfg, ds)
    hist, _ = tr.fit()
    assert np.isfinite(hist[-1]["loss"])


@pytest.mark.slow
def test_rel_hm_pretrain(tmp_path):
    csv = write_synthetic_hm_csv(str(tmp_path / "hm.csv"))
    ds = RelHM(root=csv, pretrain={PretrainType.MASK,
                                   PretrainType.LINK_PRED}, **SMALL)
    from rmm_tpu.train.pretrain import PretrainTrainer

    cfg = Config(model="tabgnnfused", batch_size=32, epochs=1, n_hidden=16,
                 n_gnn_layers=1, num_neighs=(6, 6), lr=2e-4,
                 num_neg_samples=4, testing=True, **CAP)
    tr = PretrainTrainer(cfg, ds, mode="mcm-lp")
    hist, best = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    assert 0 < hist[-1]["val_mrr"] <= 1.0
