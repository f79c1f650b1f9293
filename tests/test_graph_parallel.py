"""Graph-partition parallelism: edge-chunk-sharded CSR sampling + the
DP×GP train step (SURVEY §2.3 graph-partition row — the 'multi-host
edge-chunk sharding for giant graphs' disposition, realized as mesh-axis
sharding with one all_gather pair per hop)."""
import numpy as np
import pytest

from rmm_tpu.datasets import IBMTransactionsAML
from rmm_tpu.datasets.synthetic import write_synthetic_aml_csv
from rmm_tpu.parallel import make_mesh, shard_batch, stack_batches
from rmm_tpu.train.trainer import Trainer
from rmm_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    csv = write_synthetic_aml_csv(
        str(tmp_path_factory.mktemp("aml") / "s.csv"), num_rows=1000,
        num_accounts=100, seed=0)
    # fanout 64 >> max degree: the deterministic exact-parity regime
    # (every k-hop edge is drawn, no random subset, no truncation)
    cfg = Config(model="tabgnn", data=csv, task="edge_classification",
                 batch_size=32, epochs=1, n_hidden=16, n_gnn_layers=1,
                 num_neighs=(64, 64), edge_capacity=1024,
                 node_capacity=512, lr=1e-3, testing=True,
                 sampler="device")
    ds = IBMTransactionsAML(root=csv, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden,
                            edge_capacity=cfg.edge_capacity,
                            node_capacity=cfg.node_capacity)
    return cfg, ds


def test_split_csr_edge_balanced_and_lossless(setup):
    """The edge-quantile row partition (a) balances the O(E) payload
    across shards regardless of degree skew and (b) loses nothing: the
    concatenated chunks reconstruct the original adjacency exactly."""
    from rmm_tpu.graph.sharded_csr import ShardedDeviceGraph

    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    dg = trainer._dgraph("train")
    D = 8
    sdg = ShardedDeviceGraph.from_device_graph(dg, D)

    sizes = sdg.chunk_sizes()
    E = int(np.asarray(dg.indptr)[-1])
    assert sizes.sum() == E
    assert sizes.max() <= max(2 * E // D, int(np.asarray(
        dg.indptr[1:] - dg.indptr[:-1]).max()) + E // D), sizes

    # losslessness: per-row adjacency slices concatenate back exactly
    ip = np.asarray(dg.indptr)
    nbr, eid = np.asarray(dg.nbr), np.asarray(dg.eid)
    lip = np.asarray(sdg.indptr)
    lnb, lei = np.asarray(sdg.nbr), np.asarray(sdg.eid)
    n_rows = ip.shape[0] - 1
    for row in range(0, n_rows, 7):          # stride keeps the test fast
        glob_n = nbr[ip[row]:ip[row + 1]]
        glob_e = eid[ip[row]:ip[row + 1]]
        # exactly one shard owns the row's full slice
        parts_n, parts_e = [], []
        for k in range(D):
            lo, hi = lip[k, row], lip[k, row + 1]
            parts_n.append(lnb[k, lo:hi])
            parts_e.append(lei[k, lo:hi])
        np.testing.assert_array_equal(np.concatenate(parts_n), glob_n)
        np.testing.assert_array_equal(np.concatenate(parts_e), glob_e)


def test_sharded_sampling_bit_identical_to_replicated(setup):
    """In the deterministic regime, 8-way edge-chunk-sharded sampling
    (local ranked expansion + per-hop all_gather) produces the SAME
    subgraph batch, bit for bit, as the replicated device sampler —
    the sorted dedup downstream of the gathered candidate set erases
    lane-order differences."""
    import jax
    from jax.sharding import PartitionSpec as P

    from rmm_tpu.graph.device_sampler import sample_edges_device
    from rmm_tpu.graph.sharded_csr import ShardedDeviceGraph
    from rmm_tpu.parallel.data_parallel import _shmap

    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    dg = trainer._dgraph("train")
    D = 8
    sdg = ShardedDeviceGraph.from_device_graph(dg, D)
    mesh = make_mesh(D, axes=("graph",))
    parts, g_specs = sdg.shard_parts("graph")

    tr_view = ds.edges.split()[0]
    sb = next(iter(trainer._seed_batches(tr_view, "train")))
    key = jax.random.PRNGKey(int(sb.sampler_seed))

    ref = sample_edges_device(
        dg, sb.seeds, sb.seed_mask, key, cfg.num_neighs,
        cfg.edge_capacity, cfg.node_capacity)

    def body(seeds, mask, parts):
        local = ShardedDeviceGraph.local_device_graph(parts)
        out = sample_edges_device(
            local, seeds, mask, key, cfg.num_neighs,
            cfg.edge_capacity, cfg.node_capacity,
            axis_name="graph", n_shards=D)
        return tuple(out[k] for k in sorted(out))

    fn = _shmap(body, mesh=mesh,
                in_specs=(P(), P(), g_specs),
                out_specs=tuple(P() for _ in range(7)))
    got = dict(zip(sorted(ref), jax.jit(fn)(
        np.asarray(sb.seeds), np.asarray(sb.seed_mask), parts)))

    assert int(got["num_dropped"]) == 0 and int(ref["num_dropped"]) == 0
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_sharded_node_seeded_sampling_bit_identical(setup):
    """Node-seeded k-hop sampling (the node-classification path) through
    the sharded CSR matches the replicated sampler bit for bit."""
    import jax
    from jax.sharding import PartitionSpec as P

    from rmm_tpu.graph.device_sampler import sample_nodes_device
    from rmm_tpu.graph.sharded_csr import ShardedDeviceGraph
    from rmm_tpu.parallel.data_parallel import _shmap

    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    dg = trainer._dgraph("train")
    D = 8
    sdg = ShardedDeviceGraph.from_device_graph(dg, D)
    mesh = make_mesh(D, axes=("graph",))
    parts, g_specs = sdg.shard_parts("graph")

    rng = np.random.default_rng(3)
    seeds = np.sort(rng.choice(dg.num_nodes, size=24, replace=False)
                    ).astype(np.int32)
    mask = np.ones(24, bool)
    mask[-2:] = False
    key = jax.random.PRNGKey(11)

    ref = sample_nodes_device(dg, seeds, mask, key, cfg.num_neighs,
                              cfg.edge_capacity, cfg.node_capacity)

    def body(seeds, mask, parts):
        local = ShardedDeviceGraph.local_device_graph(parts)
        out = sample_nodes_device(
            local, seeds, mask, key, cfg.num_neighs,
            cfg.edge_capacity, cfg.node_capacity,
            axis_name="graph", n_shards=D)
        return tuple(out[k] for k in sorted(out))

    fn = _shmap(body, mesh=mesh, in_specs=(P(), P(), g_specs),
                out_specs=tuple(P() for _ in range(7)))
    got = dict(zip(sorted(ref), jax.jit(fn)(seeds, mask, parts)))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_dp_gp_train_step_matches_dp_device(setup):
    """One (data=2 × graph=4) train step equals the pure-DP device-sampler
    step on the same two seed batches: identical loss and parameters —
    the graph-axis gather is exact and grads reduce over data only."""
    import jax
    from rmm_tpu.graph.sharded_csr import ShardedDeviceGraph
    from rmm_tpu.parallel import (
        make_dp_device_train_step, make_dp_gp_train_step)

    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    dg = trainer._dgraph("train")
    tr_view = ds.edges.split()[0]
    it = iter(trainer._seed_batches(tr_view, "train"))
    sbs = [next(it), next(it)]
    stacked = stack_batches(sbs)
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)
    real = np.ones(2, dtype=bool)

    mesh_dp = make_mesh(2, axes=("data",))
    step_dp = make_dp_device_train_step(
        trainer.model, trainer.tx, trainer._loss_from_pred,
        trainer._materialize_dev, mesh_dp)
    v1, o1, l1, d1, k1 = step_dp(
        trainer.variables, trainer.opt_state,
        shard_batch(mesh_dp, stacked), rngs, real,
        trainer.edge_table, trainer.node_table, dg)

    mesh_gp = make_mesh(8, axes=("data", "graph"), shape=(2, 4))
    sdg = ShardedDeviceGraph.from_device_graph(dg, 4)
    parts, _ = sdg.shard_parts("graph")
    step_gp = make_dp_gp_train_step(
        trainer.model, trainer.tx, trainer._loss_from_pred,
        trainer._materialize_dev, mesh_gp, sdg)
    v2, o2, l2, d2, k2 = step_gp(
        trainer.variables, trainer.opt_state,
        shard_batch(mesh_gp, stacked), rngs, real,
        trainer.edge_table, trainer.node_table, parts)

    assert int(np.asarray(d1).sum()) == 0 and int(np.asarray(d2).sum()) == 0
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    assert abs(float(l1) - float(l2)) < 1e-6, (float(l1), float(l2))
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_dp_gp_multi_step_epoch_matches_dp_device(setup):
    """Epoch-level evidence for the DP×GP composition: THREE sequential
    dispatches (the last one ragged — real=[True, False]) evolve the
    parameters identically to the pure-DP device-sampler path. Extends the
    one-step equality above through optimizer state and ragged-group
    handling."""
    import jax
    from rmm_tpu.graph.sharded_csr import ShardedDeviceGraph
    from rmm_tpu.parallel import (
        make_dp_device_train_step, make_dp_gp_train_step)

    cfg, ds = setup
    trainer = Trainer(cfg, ds)
    dg = trainer._dgraph("train")
    tr_view = ds.edges.split()[0]
    sbs = []
    for sb in trainer._seed_batches(tr_view, "train"):
        sbs.append(sb)
        if len(sbs) >= 5:
            break
    # groups of 2 per dispatch; final group padded with a copy → ragged
    groups = [(sbs[0:2], [True, True]),
              (sbs[2:4], [True, True]),
              ([sbs[4], sbs[4]], [True, False])]

    mesh_dp = make_mesh(2, axes=("data",))
    step_dp = make_dp_device_train_step(
        trainer.model, trainer.tx, trainer._loss_from_pred,
        trainer._materialize_dev, mesh_dp)

    mesh_gp = make_mesh(8, axes=("data", "graph"), shape=(2, 4))
    sdg = ShardedDeviceGraph.from_device_graph(dg, 4)
    parts, _ = sdg.shard_parts("graph")
    step_gp = make_dp_gp_train_step(
        trainer.model, trainer.tx, trainer._loss_from_pred,
        trainer._materialize_dev, mesh_gp, sdg)

    v1, o1 = trainer.variables, trainer.opt_state
    v2, o2 = trainer.variables, trainer.opt_state
    losses1, losses2 = [], []
    for i, (grp, real) in enumerate(groups):
        stacked = stack_batches(grp)
        rngs = jax.random.split(jax.random.PRNGKey(100 + i), 2)
        real = np.asarray(real, dtype=bool)
        v1, o1, l1, d1, _ = step_dp(
            v1, o1, shard_batch(mesh_dp, stacked), rngs, real,
            trainer.edge_table, trainer.node_table, dg)
        v2, o2, l2, d2, _ = step_gp(
            v2, o2, shard_batch(mesh_gp, stacked), rngs, real,
            trainer.edge_table, trainer.node_table, parts)
        assert int(np.asarray(d1).sum()) == 0
        assert int(np.asarray(d2).sum()) == 0
        losses1.append(float(l1))
        losses2.append(float(l2))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
