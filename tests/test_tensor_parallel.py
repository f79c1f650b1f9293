"""Tensor-parallel (model-axis-sharded feature tables) tests on the
8-device virtual CPU mesh: distributed gather correctness and
dp×tp ≡ dp training-step equivalence."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
from rmm_tpu.parallel import (
    make_dp_train_step,
    make_dp_tp_eval_step,
    make_dp_tp_train_step,
    make_mesh,
    shard_batch,
    shard_table,
    stack_batches,
)
from rmm_tpu.parallel.data_parallel import _shmap
from rmm_tpu.parallel.tensor_parallel import distributed_gather_rows
from rmm_tpu.train.task_models import gather_rows
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    csv = write_synthetic_aml_csv(
        str(tmp_path_factory.mktemp("aml_tp") / "s.csv"), num_rows=1000,
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


def test_distributed_gather_matches_local(setup):
    """Gathering global ids from a model-sharded table must reproduce the
    plain local gather, including rows on every shard."""
    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    mesh = make_mesh(8, axes=("model",))
    table = shard_table(mesh, trainer.edge_table)
    n = trainer.edge_table.num_rows
    rng = np.random.RandomState(0)
    ids = rng.randint(0, n, size=64).astype(np.int32)
    # include extremes so the first and last shard are both exercised
    ids[0], ids[1] = 0, n - 1

    def body(table, ids):
        return distributed_gather_rows(table, ids[0], axis="model")

    fn = jax.jit(_shmap(body, mesh=mesh, in_specs=(P("model"), P()),
                        out_specs=P()))
    got = fn(table, ids[None])
    want = gather_rows(trainer.edge_table, ids)
    for st in want.feats:
        np.testing.assert_array_equal(np.asarray(got.feats[st]),
                                      np.asarray(want.feats[st]))


def test_dp_tp_step_matches_dp(setup):
    """A (4 data × 2 model) step must produce the same params/loss as a
    plain 4-chip DP step: the model axis only re-shards table memory."""
    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    tr, _, _ = ds.edges.split()
    batches = list(trainer._batches(tr, "train"))[:4]
    stacked = stack_batches(batches)
    rngs = jax.random.split(jax.random.PRNGKey(0), 4)
    real = np.ones(4, dtype=bool)

    mesh_dp = make_mesh(4)
    dp_step = make_dp_train_step(trainer.model, trainer.tx,
                                 trainer._loss_from_pred, mesh_dp)
    v_dp, _, loss_dp, aux_dp = dp_step(
        trainer.variables, trainer.opt_state, shard_batch(mesh_dp, stacked),
        rngs, real, trainer.edge_table, trainer.node_table)

    mesh2 = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    tp_step = make_dp_tp_train_step(trainer.model, trainer.tx,
                                    trainer._loss_from_pred, mesh2)
    v_tp, _, loss_tp, aux_tp = tp_step(
        trainer.variables, trainer.opt_state, shard_batch(mesh2, stacked),
        rngs, real, shard_table(mesh2, trainer.edge_table),
        shard_table(mesh2, trainer.node_table))

    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(aux_tp["pred_cls"]),
                                  np.asarray(aux_dp["pred_cls"]))
    for x, y in zip(jax.tree_util.tree_leaves(v_tp["params"]),
                    jax.tree_util.tree_leaves(v_dp["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3,
                                   atol=1e-5)


def test_dp_tp_eval_matches_single_chip(setup):
    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    tr, _, _ = ds.edges.split()
    batches = list(trainer._batches(tr, "train"))[:2]
    mesh2 = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    ev = make_dp_tp_eval_step(trainer.model, trainer._loss_from_pred, mesh2)
    losses, auxes = ev(trainer.variables, shard_batch(mesh2,
                                                      stack_batches(batches)),
                       shard_table(mesh2, trainer.edge_table),
                       shard_table(mesh2, trainer.node_table))
    for j, gb in enumerate(batches):
        _, aux = trainer._eval_step(trainer.variables, gb,
                                    trainer.edge_table, trainer.node_table)
        got = np.asarray(auxes["pred_cls"]).reshape(2, -1)[j]
        np.testing.assert_array_equal(got, np.asarray(aux["pred_cls"]))


def test_shard_table_pads_to_equal_shards(setup):
    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    mesh = make_mesh(8, axes=("model",))
    table = shard_table(mesh, trainer.edge_table)
    for v in table.feats.values():
        assert v.shape[0] % 8 == 0
