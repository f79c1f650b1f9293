"""Hostile-input probes at the frame/encoder boundary (SURVEY §4 test
strategy: the failure modes production CSVs actually contain): NaN
numericals, missing/unseen categoricals, empty splits, schema column
names absent from the frame."""
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from rmm_tpu.frame import Dataset, StatType, Stype
from rmm_tpu.nn.encoders import make_stypewise_encoder


def df_with_holes(n=40, seed=0):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "amount": rng.lognormal(1, 1, n),
        "currency": rng.choice(["usd", "eur", "btc"], n).astype(object),
        "label": rng.randint(0, 2, n),
    })
    df.loc[3, "amount"] = np.nan
    df.loc[7, "amount"] = np.nan
    df.loc[5, "currency"] = None
    return df


def materialized(df, split=None):
    schema = {"amount": Stype.numerical, "currency": Stype.categorical,
              "label": Stype.categorical}
    return Dataset(df, schema, split_col=split,
                   target_col="label").materialize()


def test_nan_numericals_encode_finite_and_mean_imputed():
    """NaN floats must (a) not poison the column stats and (b) encode to
    the normalized-mean token (z=0 → bias-only lift), never NaN."""
    ds = materialized(df_with_holes())
    mean = ds.col_stats["amount"][StatType.MEAN]
    assert np.isfinite(mean) and np.isfinite(
        ds.col_stats["amount"][StatType.STD])

    enc = make_stypewise_encoder(ds, channels=8)
    tf = ds.tensor_frame
    params = enc.init(jax.random.PRNGKey(0), tf)
    tokens = jax.jit(lambda p, t: enc.apply(p, t)[0])(params, tf)
    assert bool(jnp.isfinite(tokens).all())
    # the NaN rows' numerical token equals the bias row (z-score 0)
    bias = params["params"]["numerical"]["bias"][0]
    np.testing.assert_allclose(np.asarray(tokens[3, 0]), np.asarray(bias),
                               rtol=1e-6)
    # ... which equals encoding the column mean explicitly
    import dataclasses
    feats = dict(tf.feats)
    num = np.asarray(feats[Stype.numerical]).copy()
    num[10, 0] = mean
    feats[Stype.numerical] = jnp.asarray(num)
    tf2 = dataclasses.replace(tf, feats=feats)
    tokens2, _ = enc.apply(params, tf2)
    np.testing.assert_allclose(np.asarray(tokens2[10, 0]),
                               np.asarray(tokens[3, 0]), rtol=1e-5,
                               atol=1e-6)


def test_missing_categorical_maps_to_na_row():
    """None/unseen categories materialize to code −1 and must select the
    dedicated NA embedding row (row 0), not wrap into a real category."""
    ds = materialized(df_with_holes())
    codes = np.asarray(ds.tensor_frame.feats[Stype.categorical])
    cur_idx = ds.tensor_frame.col_names[Stype.categorical].index("currency")
    assert codes[5, cur_idx] == -1

    enc = make_stypewise_encoder(ds, channels=8)
    tf = ds.tensor_frame
    params = enc.init(jax.random.PRNGKey(0), tf)
    tokens, _ = enc.apply(params, tf)
    na_row = params["params"]["categorical"][f"embedding_{cur_idx}"][0]
    n_num = len(tf.col_names[Stype.numerical])   # numerical tokens first
    np.testing.assert_allclose(
        np.asarray(tokens[5, n_num + cur_idx]),
        np.asarray(na_row), rtol=1e-6)


def test_empty_split_views_are_usable():
    """A split column with no validation rows yields an empty view that
    reports its emptiness instead of crashing materialization/split."""
    df = df_with_holes()
    df["split"] = 0
    df.loc[df.index[-8:], "split"] = 2     # train + test only, no val
    ds = materialized(df, split="split")
    tr, va, te = ds.split()
    assert len(tr) > 0 and len(te) == 8
    assert len(va) == 0
    assert va.tensor_frame.num_rows == 0


def test_unknown_schema_column_raises_key_error():
    df = df_with_holes()
    with pytest.raises(KeyError):
        Dataset(df, {"amount": Stype.numerical,
                     "no_such_column": Stype.categorical,
                     "label": Stype.categorical},
                target_col="label").materialize()
