"""Unit tests for the ColumnFrame core (stypes, stats, TensorFrame, Dataset)."""
import numpy as np
import pandas as pd
import pytest

from rmm_tpu.frame import (
    Dataset,
    DataLoader,
    StatType,
    Stype,
    TensorFrame,
    generate_random_split,
)


def make_df(n=50, seed=0):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "amount": rng.lognormal(1, 1, n),
        "currency": rng.choice(["usd", "eur", "btc"], n),
        "fmt": rng.choice(["wire", "ach"], n),
        "ts": rng.randint(0, 10 * 86400, n).astype(np.int64),
        "label": rng.randint(0, 2, n),
    })


def make_dataset(n=50):
    df = make_df(n)
    df["split"] = generate_random_split(n, seed=0, train_ratio=0.6,
                                        val_ratio=0.2)
    ds = Dataset(
        df,
        {
            "amount": Stype.numerical,
            "currency": Stype.categorical,
            "fmt": Stype.categorical,
            "ts": Stype.timestamp,
            "label": Stype.categorical,
        },
        split_col="split",
        target_col="label",
    )
    return ds.materialize()


def test_materialize_shapes():
    ds = make_dataset()
    tf = ds.tensor_frame
    assert tf.feats[Stype.numerical].shape == (50, 1)
    assert tf.feats[Stype.categorical].shape == (50, 2)
    assert tf.feats[Stype.timestamp].shape == (50, 1)
    assert tf.y.shape == (50, 1)
    assert tf.num_cols == 4
    assert tf.num_rows == 50


def test_categorical_codes_count_desc():
    ds = make_dataset()
    values, counts = ds.col_stats["currency"][StatType.COUNT]
    assert counts == sorted(counts, reverse=True)
    # code 0 is the most frequent value
    codes = ds.tensor_frame.feats[Stype.categorical][:, 0]
    most_frequent_code = np.bincount(np.asarray(codes)).argmax()
    assert most_frequent_code == 0


def test_numerical_stats():
    ds = make_dataset()
    st = ds.col_stats["amount"]
    raw = ds.df["amount"].to_numpy()
    assert st[StatType.MEAN] == pytest.approx(raw.mean())
    assert st[StatType.STD] == pytest.approx(raw.std())


def test_split_partition():
    ds = make_dataset()
    tr, va, te = ds.split()
    assert len(tr) + len(va) + len(te) == 50
    assert len(tr) > len(va)


def test_getitem_gather():
    ds = make_dataset()
    tf = ds.tensor_frame
    sub = tf[np.array([3, 1, 4])]
    assert sub.num_rows == 3
    np.testing.assert_allclose(
        np.asarray(sub.feats[Stype.numerical][0]),
        np.asarray(tf.feats[Stype.numerical][3]),
    )


def test_get_col_feat():
    ds = make_dataset()
    col = ds.tensor_frame.get_col_feat("amount")
    assert col.shape == (50, 1)


def test_pytree_roundtrip():
    import jax

    ds = make_dataset()
    tf = ds.tensor_frame
    leaves, treedef = jax.tree_util.tree_flatten(tf)
    tf2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert tf2.col_names == tf.col_names
    np.testing.assert_array_equal(
        np.asarray(tf2.feats[Stype.categorical]),
        np.asarray(tf.feats[Stype.categorical]),
    )


def test_loader_pads_final_batch():
    ds = make_dataset()
    loader = DataLoader(ds.tensor_frame, batch_size=16, shuffle=True)
    batches = list(loader)
    assert len(batches) == 4
    for tf, valid in batches:
        assert tf.num_rows == 16  # static shape
        assert 0 < valid <= 16
    assert batches[-1][1] == 50 - 3 * 16


def test_concat_and_pad():
    ds = make_dataset()
    tf = ds.tensor_frame
    cat = TensorFrame.concat([tf[np.arange(5)], tf[np.arange(5, 8)]])
    assert cat.num_rows == 8
    padded = tf[np.arange(5)].pad_rows(9)
    assert padded.num_rows == 9
