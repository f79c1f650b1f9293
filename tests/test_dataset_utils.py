"""Tests for dataset plumbing: packed target layouts, split algorithms,
mask reproducibility, config overrides, checkpoint path parsing."""
import argparse

import numpy as np
import pandas as pd
import pytest

from rmm_tpu.datasets.base import (
    PretrainType,
    apply_split,
    build_mask_target,
    create_mask,
    pack_link_column,
    pack_target,
    parse_pretrain_args,
    temporal_balanced_split,
)
from rmm_tpu.utils.checkpoint import parse_checkpoint_path
from rmm_tpu.utils.config import config_from_args, create_parser


def test_pack_target_layouts():
    link = pack_link_column(np.array([3, 4]), np.array([5, 6]))
    assert link.shape == (2, 3)
    np.testing.assert_array_equal(link[:, 2], [0, 1])  # edge ids

    sup = pack_target(set(), link, None, np.array([1.0, 0.0]))
    assert sup.shape == (2, 4)  # [label, src, dst, id]  (util/mask.py:43)
    np.testing.assert_array_equal(sup[0], [1, 3, 5, 0])

    mask_t = np.array([[2.5, 0], [1.0, 2]], np.float32)
    both = pack_target({PretrainType.MASK, PretrainType.LINK_PRED}, link,
                       mask_t, None)
    assert both.shape == (2, 5)  # [val, col, src, dst, id] (mask.py:56-63)

    only_mask = pack_target({PretrainType.MASK}, link, mask_t, None)
    assert only_mask.shape == (2, 2)
    only_lp = pack_target({PretrainType.LINK_PRED}, link, mask_t, None)
    assert only_lp.shape == (2, 3)


def test_parse_pretrain_args():
    assert parse_pretrain_args(["mask", "lp"]) == {
        PretrainType.MASK, PretrainType.LINK_PRED}
    assert parse_pretrain_args(None) == set()


def test_temporal_balanced_split_hits_ratios():
    rng = np.random.RandomState(0)
    n = 3000
    df = pd.DataFrame({"ts": rng.randint(0, 20 * 86400, n)})
    df = temporal_balanced_split(df, [0.6, 0.2, 0.2], "ts")
    frac = df["split"].value_counts(normalize=True).sort_index()
    assert abs(frac[0] - 0.6) < 0.08
    assert abs(frac[1] - 0.2) < 0.08
    # temporal ordering: max train ts <= min test ts day-wise
    day = df["ts"] // 86400
    assert day[df.split == 0].max() <= day[df.split == 2].min()


def test_split_dispatch_modes():
    df = pd.DataFrame({"ts": np.arange(100)})
    for mode in ("random", "temporal", "temporal_daily"):
        out = apply_split(df.copy(), mode, [0.6, 0.2, 0.2], "ts")
        assert set(out["split"].unique()) <= {0, 1, 2}
    out = apply_split(df.copy(), "cutoff", [30, 70], "ts")
    assert (out.loc[out.ts < 30, "split"] == 0).all()
    assert (out.loc[out.ts > 70, "split"] == 2).all()


def test_create_mask_cached(tmp_path):
    df = pd.DataFrame({"a": np.arange(50), "b": np.arange(50)})
    root = str(tmp_path / "ds")
    m1 = create_mask(root, df, ["a", "b"], seed=0)
    m2 = create_mask(root, df, ["a", "b"], seed=999)  # seed ignored: cached
    np.testing.assert_array_equal(m1, m2)
    assert set(m1) <= {"a", "b"}


def test_build_mask_target_indices():
    df = pd.DataFrame({"num": [1.5, 2.5], "cat": ["x", "y"]})
    mask_col = np.array(["num", "cat"])
    t = build_mask_target(df, mask_col, ["num"], ["cat"],
                          {"cat": {"x": 0, "y": 1}})
    np.testing.assert_array_equal(t[0], [1.5, 0])   # numerical col idx 0
    np.testing.assert_array_equal(t[1], [1.0, 1])   # cat code 1, col idx 1


def test_config_dataset_overrides():
    parser = create_parser()
    args = parser.parse_args([
        "--model", "gin", "--data", "/x/ethereum-phishing-transaction-network"])
    cfg = config_from_args(args)
    assert cfg.lr == 0.0008 and cfg.w_ce2 == 1.16  # main.py:229-233
    args = parser.parse_args(["--model", "gin", "--data", "/x/ogbn_arxiv"])
    cfg = config_from_args(args)
    assert cfg.task == "node_classification" and cfg.n_classes == 40


def test_parse_checkpoint_path():
    run_id, epoch = parse_checkpoint_path("/w/run_ab12/7/")
    assert run_id == "run_ab12" and epoch == 7


def test_parse_checkpoint_path_best_tags():
    """best_* exports resume at epoch 0; other tags raise clearly
    (advisor r3 #2)."""
    import pytest

    run_id, epoch = parse_checkpoint_path("/w/run_x/best_mrr")
    assert run_id == "run_x" and epoch == 0
    with pytest.raises(ValueError, match="best_"):
        parse_checkpoint_path("/w/run_x/garbage_tag")


def test_checkpoint_mismatch_warns_and_raises(tmp_path, caplog):
    """strict=False loads warn about every fresh-init leaf; serving/resume
    paths (on_mismatch='raise') error instead of silently predicting from
    random weights (advisor r3 #1)."""
    import logging

    import pytest

    from rmm_tpu.utils.checkpoint import (
        load_components, load_pytree, save_pytree)

    import numpy as _np

    saved = {"dense": {"kernel": _np.ones((4, 4), _np.float32),
                       "bias": _np.zeros((4,), _np.float32)}}
    p = str(tmp_path / "model")
    save_pytree(p, saved)

    # different n_hidden → shape mismatch on kernel, bias fine
    template = {"dense": {"kernel": _np.zeros((8, 8), _np.float32),
                          "bias": _np.zeros((4,), _np.float32)}}
    with caplog.at_level(logging.WARNING):
        out = load_pytree(p, template, strict=False)
    assert any("FRESH INIT" in r.message for r in caplog.records)
    assert out["dense"]["kernel"].shape == (8, 8)          # kept fresh
    assert float(out["dense"]["bias"].sum()) == 0.0        # loaded

    with pytest.raises(ValueError, match="FRESH INIT"):
        load_pytree(p, template, strict=False, on_mismatch="raise")

    # a whole component missing from the checkpoint dir
    vars_ = {"params": {"model": template, "decoder": template}}
    save_pytree(str(tmp_path / "model2"), template)
    with pytest.raises(FileNotFoundError, match="decoder"):
        load_components(str(tmp_path), vars_, ["model2", "decoder"],
                        on_mismatch="raise")


def test_ckpt_format_warning(tmp_path, caplog):
    """Pre-v2 checkpoints (no meta.json) trigger the PNA-reorder warning;
    fresh saves carry ckpt_format=2 and stay silent (advisor r3 #3)."""
    import logging

    from rmm_tpu.utils.checkpoint import check_ckpt_format, save_checkpoint

    old = str(tmp_path / "old")
    import os as _os
    _os.makedirs(old)
    with caplog.at_level(logging.WARNING):
        v = check_ckpt_format(old)
    assert v == 1
    assert any("SWAPPED" in r.message for r in caplog.records)

    caplog.clear()
    new = save_checkpoint(str(tmp_path / "run"), 0,
                          {"params": {"model": {"w": np.zeros(2)}}})
    with caplog.at_level(logging.WARNING):
        v = check_ckpt_format(new)
    assert v == 2
    assert not any("SWAPPED" in r.message for r in caplog.records)
