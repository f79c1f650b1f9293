"""Orbax checkpoint backend: async directory components behind the same
save/restore surface (SURVEY §7.6 names orbax; --ckpt_backend orbax).
Backends must interoperate — a run can save msgpack and resume orbax or
vice versa, because load_pytree detects the entry type on disk."""
import os

import numpy as np
import pytest

from rmm_tpu.utils.checkpoint import (
    load_components,
    load_pytree,
    save_checkpoint,
    save_pytree,
    wait_for_saves,
)


def tree(seed=0, h=4):
    r = np.random.RandomState(seed)
    return {"dense": {"kernel": r.randn(3, h).astype(np.float32),
                      "bias": r.randn(h).astype(np.float32)},
            "scale": r.randn(h).astype(np.float32)}


def assert_tree_equal(a, b):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_pytree_roundtrip_strict_and_loose(tmp_path):
    t = tree(1)
    p = str(tmp_path / "comp")
    save_pytree(p, t, backend="orbax")
    wait_for_saves()
    assert os.path.isdir(p)  # orbax components are directories

    got = load_pytree(p, tree(2))            # strict: exact structure
    assert_tree_equal(got, t)

    # loose merge: a shape-mismatched leaf keeps its fresh init, loudly
    bigger = tree(3, h=8)
    merged = load_pytree(p, bigger, strict=False, on_mismatch="warn")
    np.testing.assert_array_equal(merged["dense"]["kernel"],
                                  bigger["dense"]["kernel"])
    with pytest.raises(ValueError):
        load_pytree(p, bigger, strict=False, on_mismatch="raise")


def test_save_checkpoint_orbax_and_cross_backend_restore(tmp_path):
    variables = {"params": {"node_encoder": tree(4), "model": tree(5)},
                 "batch_stats": {"model": {"bn": {"mean": np.ones(4,
                                                  np.float32)}}}}
    opt = {"mu": tree(6)}

    run_o = str(tmp_path / "orbax_run")
    ck_o = save_checkpoint(run_o, 3, variables, opt_state=opt,
                           backend="orbax")
    wait_for_saves()
    run_m = str(tmp_path / "msgpack_run")
    ck_m = save_checkpoint(run_m, 3, variables, opt_state=opt)

    import jax
    fresh = jax.tree_util.tree_map(np.zeros_like, variables)
    for ck in (ck_o, ck_m):                     # either backend restores
        got = load_components(ck, fresh, on_mismatch="raise")
        assert_tree_equal(got["params"], variables["params"])
        assert_tree_equal(got["batch_stats"], variables["batch_stats"])
        got_opt = load_pytree(os.path.join(ck, "opt_state"),
                              jax.tree_util.tree_map(np.zeros_like, opt))
        assert_tree_equal(got_opt, opt)


def test_orbax_prune_is_safe_against_inflight_saves(tmp_path):
    variables = {"params": {"model": tree(7)}}
    run = str(tmp_path / "run")
    save_checkpoint(run, 0, variables, backend="orbax")
    # epoch-1 save prunes epoch 0 WITHOUT a global flush: the shared
    # AsyncCheckpointer serializes commits, so epoch 0 is fully committed
    # before epoch 1's components enqueue — no torn directory either way
    save_checkpoint(run, 1, variables, backend="orbax")
    wait_for_saves()
    assert not os.path.exists(os.path.join(run, "0"))
    import jax
    fresh = jax.tree_util.tree_map(np.zeros_like, variables)
    got = load_components(os.path.join(run, "1"), fresh,
                          on_mismatch="raise")
    assert_tree_equal(got["params"], variables["params"])
