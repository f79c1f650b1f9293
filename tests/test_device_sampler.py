"""In-jit device sampler vs the host sampler contract.

In the deterministic regime (fanout >= max degree: every in-edge is taken)
the device sampler must reproduce the host sampler's edge SET and its
sorted-unique node ordering exactly. Random-fanout runs are checked for
structural invariants instead (the draw order differs by design).
"""
import jax
import numpy as np
import pytest

from rmm_tpu.graph.device_sampler import (
    DeviceGraph,
    negative_samples_device,
    sample_edges_device,
    sample_nodes_device,
)
from rmm_tpu.graph.sampler import NeighborSampler


def random_graph(rng, num_nodes=40, num_edges=300):
    src = rng.randint(0, num_nodes, num_edges)
    dst = rng.randint(0, num_nodes, num_edges)
    return src.astype(np.int64), dst.astype(np.int64), num_nodes


def make_pair(src, dst, n, fanouts, undirected=False):
    host = NeighborSampler(np.stack([src, dst]), None, n, fanouts=fanouts,
                           undirected=undirected, use_native=False)
    dev = DeviceGraph.from_arrays(src, dst, np.arange(len(src)), n,
                                  undirected=undirected)
    return host, dev


def seed_batch(rng, src, dst, b):
    idx = rng.choice(len(src), size=b, replace=False)
    seeds = np.stack([src[idx], dst[idx], idx], axis=1).astype(np.int32)
    return seeds


@pytest.mark.parametrize("undirected", [False, True])
def test_exact_match_when_fanout_exceeds_degree(undirected):
    rng = np.random.RandomState(0)
    src, dst, n = random_graph(rng)
    fanouts = (512, 512)         # > max degree -> deterministic full 2-hop
    host, dev = make_pair(src, dst, n, fanouts, undirected)
    seeds = seed_batch(rng, src, dst, b=8)
    E_cap, N_cap = 512, 128

    sub = host.sample_edges(seeds[:, 0], seeds[:, 1], seeds[:, 2],
                            E_cap, N_cap, rng_seed=7)
    out = jax.jit(
        lambda s, m, k: sample_edges_device(
            dev, s, m, k, fanouts, E_cap, N_cap)
    )(seeds, np.ones(8, bool), jax.random.PRNGKey(0))

    host_edges = set(sub.edge_ids[sub.edge_mask].tolist())
    dev_edges = set(np.asarray(out["edge_gather"])[
        np.asarray(out["edge_mask"])].tolist())
    assert host_edges == dev_edges
    assert int(out["num_dropped"]) == sub.num_dropped == 0

    # node ordering contract: sorted unique — must match exactly
    host_nodes = sub.node_ids[sub.node_mask]
    dev_nodes = np.asarray(out["node_gather"])[np.asarray(out["node_mask"])]
    np.testing.assert_array_equal(host_nodes, dev_nodes)

    # seed lanes come first, in input order
    np.testing.assert_array_equal(
        np.asarray(out["edge_gather"])[:8], seeds[:, 2])

    # relabel consistency: local ids map back to the global endpoints
    ei = np.asarray(out["edge_index"])
    em = np.asarray(out["edge_mask"])
    gsrc = dev_nodes_at(out, ei[0][em])
    gdst = dev_nodes_at(out, ei[1][em])
    eids = np.asarray(out["edge_gather"])[em]
    np.testing.assert_array_equal(gsrc, src[eids])
    np.testing.assert_array_equal(gdst, dst[eids])


def dev_nodes_at(out, local_ids):
    return np.asarray(out["node_gather"])[local_ids]


def test_invariants_random_fanout():
    rng = np.random.RandomState(1)
    src, dst, n = random_graph(rng, num_nodes=30, num_edges=600)  # dense
    fanouts = (4, 4)
    _, dev = make_pair(src, dst, n, fanouts)
    seeds = seed_batch(rng, src, dst, b=6)
    E_cap, N_cap = 256, 128
    fn = jax.jit(lambda s, m, k: sample_edges_device(
        dev, s, m, k, fanouts, E_cap, N_cap))

    for trial in range(3):
        out = fn(seeds, np.ones(6, bool), jax.random.PRNGKey(trial))
        eg = np.asarray(out["edge_gather"])
        em = np.asarray(out["edge_mask"])
        kept = eg[em]
        # no duplicate edges
        assert len(set(kept.tolist())) == len(kept)
        # seed block first
        np.testing.assert_array_equal(eg[:6], seeds[:, 2])
        # all kept edges exist and relabel consistently
        ei = np.asarray(out["edge_index"])
        np.testing.assert_array_equal(
            dev_nodes_at(out, ei[0][em]), src[kept])
        np.testing.assert_array_equal(
            dev_nodes_at(out, ei[1][em]), dst[kept])
        # per-hop fanout bound: hop-1 edges <= 2B * f1 (+dedup), total
        # bounded by capacity
        assert em.sum() <= E_cap

    # different keys -> different subgraphs (stochastic when deg > fanout)
    o1 = fn(seeds, np.ones(6, bool), jax.random.PRNGKey(10))
    o2 = fn(seeds, np.ones(6, bool), jax.random.PRNGKey(11))
    s1 = set(np.asarray(o1["edge_gather"])[np.asarray(o1["edge_mask"])]
             .tolist())
    s2 = set(np.asarray(o2["edge_gather"])[np.asarray(o2["edge_mask"])]
             .tolist())
    assert s1 != s2
    # same key -> identical
    o3 = fn(seeds, np.ones(6, bool), jax.random.PRNGKey(10))
    s3 = set(np.asarray(o3["edge_gather"])[np.asarray(o3["edge_mask"])]
             .tolist())
    assert s1 == s3


def test_padded_seed_lanes_excluded():
    rng = np.random.RandomState(2)
    src, dst, n = random_graph(rng)
    # deterministic regime (fanout >= degree) so batch width can't change
    # the RNG draws — padded vs unpadded runs must agree exactly
    _, dev = make_pair(src, dst, n, (512, 512))
    seeds = seed_batch(rng, src, dst, b=8)
    mask = np.array([True] * 5 + [False] * 3)
    out = jax.jit(lambda s, m, k: sample_edges_device(
        dev, s, m, k, (512, 512), 1024, 128))(
            seeds, mask, jax.random.PRNGKey(0))
    em = np.asarray(out["edge_mask"])
    np.testing.assert_array_equal(em[:8], mask)
    # padded seeds' endpoints must not enter the node set (unless reached
    # from real seeds)
    real_out = jax.jit(lambda s, m, k: sample_edges_device(
        dev, s, m, k, (512, 512), 1024, 128))(
            seeds[:5], np.ones(5, bool), jax.random.PRNGKey(0))
    nodes_padded = set(np.asarray(out["node_gather"])[
        np.asarray(out["node_mask"])].tolist())
    nodes_real = set(np.asarray(real_out["node_gather"])[
        np.asarray(real_out["node_mask"])].tolist())
    assert nodes_padded == nodes_real


def test_node_seeded_exact_match_when_fanout_exceeds_degree():
    rng = np.random.RandomState(5)
    src, dst, n = random_graph(rng)
    fanouts = (512, 512)
    host, dev = make_pair(src, dst, n, fanouts)
    seed_nodes = rng.choice(n, size=6, replace=False).astype(np.int32)
    E_cap, N_cap = 512, 128

    sub = host.sample_nodes(seed_nodes.astype(np.int64), E_cap, N_cap,
                            rng_seed=3)
    out = jax.jit(lambda s, m, k: sample_nodes_device(
        dev, s, m, k, fanouts, E_cap, N_cap))(
            seed_nodes, np.ones(6, bool), jax.random.PRNGKey(0))

    host_edges = set(sub.edge_ids[sub.edge_mask].tolist())
    dev_edges = set(np.asarray(out["edge_gather"])[
        np.asarray(out["edge_mask"])].tolist())
    assert host_edges == dev_edges
    # node contract: seeds first in input order, then sorted rest
    host_nodes = sub.node_ids[sub.node_mask]
    dev_nodes = np.asarray(out["node_gather"])[np.asarray(out["node_mask"])]
    np.testing.assert_array_equal(host_nodes, dev_nodes)
    np.testing.assert_array_equal(dev_nodes[:6], seed_nodes)
    # relabel consistency
    ei = np.asarray(out["edge_index"])
    em = np.asarray(out["edge_mask"])
    eids = np.asarray(out["edge_gather"])[em]
    np.testing.assert_array_equal(dev_nodes_at(out, ei[0][em]), src[eids])
    np.testing.assert_array_equal(dev_nodes_at(out, ei[1][em]), dst[eids])


def test_negative_samples_device():
    rng = np.random.RandomState(9)
    n_nodes, n_edges, B, num_neg = 50, 120, 6, 8
    ei = rng.randint(0, n_nodes, (2, n_edges)).astype(np.int32)
    mask = np.ones(n_edges, bool)
    pos = ei[:, :B]
    neg, residual = jax.jit(lambda k: negative_samples_device(
        ei, mask, pos[0], pos[1], np.ones(B, bool), num_neg,
        node_capacity=n_nodes, num_nodes=n_nodes, key=k))(
            jax.random.PRNGKey(0))
    neg = np.asarray(neg)
    assert neg.shape == (2, B * num_neg)
    assert int(residual) == 0

    adj = {}
    for u, v in ei.T:
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    half = num_neg // 2
    for i in range(B):
        s, d = int(pos[0, i]), int(pos[1, i])
        block = neg[:, i * num_neg:(i + 1) * num_neg]
        # first half keeps src and corrupts dst; second half the reverse
        np.testing.assert_array_equal(block[0, :half], s)
        np.testing.assert_array_equal(block[1, half:], d)
        for j in range(num_neg):
            v = int(block[1, j] if j < half else block[0, j])
            anchor_s, anchor_d = s, d
            assert v not in (anchor_s, anchor_d)
            assert v not in adj.get(anchor_s, set())
            assert v not in adj.get(anchor_d, set())


def test_capacity_truncation_counted():
    rng = np.random.RandomState(3)
    src, dst, n = random_graph(rng, num_nodes=20, num_edges=500)
    host, dev = make_pair(src, dst, n, (64, 64))
    seeds = seed_batch(rng, src, dst, b=4)
    tight_E = 32
    out = jax.jit(lambda s, m, k: sample_edges_device(
        dev, s, m, k, (64, 64), tight_E, 64))(
            seeds, np.ones(4, bool), jax.random.PRNGKey(0))
    loose = jax.jit(lambda s, m, k: sample_edges_device(
        dev, s, m, k, (64, 64), 1024, 64))(
            seeds, np.ones(4, bool), jax.random.PRNGKey(0))
    total_kept = int(np.asarray(loose["edge_mask"]).sum())
    kept = int(np.asarray(out["edge_mask"]).sum())
    assert int(out["num_dropped"]) == total_kept - kept > 0


def test_frontier_capacity_parity_and_accounting():
    """A frontier buffer >= the true distinct hop-1 frontier reproduces the
    uncapped sampler exactly; an undersized one truncates coverage but
    counts it in num_node_dropped (never silent)."""
    rng = np.random.RandomState(3)
    src, dst, n = random_graph(rng)
    fanouts = (512, 512)
    _, dev = make_pair(src, dst, n, fanouts)
    seeds = seed_batch(rng, src, dst, b=8)
    E_cap, N_cap = 512, 128

    def run(fcap):
        return jax.jit(
            lambda s, m, k: sample_edges_device(
                dev, s, m, k, fanouts, E_cap, N_cap, fcap)
        )(seeds, np.ones(8, bool), jax.random.PRNGKey(0))

    base = run(None)
    # true hop-1 frontier is bounded by the distinct in-neighbors of the
    # 16 seed endpoints — N_cap lanes certainly cover it
    ample = run(N_cap)
    for k in ("edge_gather", "edge_mask", "edge_index", "node_gather",
              "node_mask"):
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(ample[k]), err_msg=k)
    assert int(ample["num_node_dropped"]) == int(base["num_node_dropped"])

    tiny = run(4)   # frontier of 4 lanes cannot hold the hop-1 neighbors
    assert int(tiny["num_node_dropped"]) > 0
    # truncation loses edges vs the ample run
    kept_t = int(np.asarray(tiny["edge_mask"]).sum())
    kept_a = int(np.asarray(ample["edge_mask"]).sum())
    assert kept_t < kept_a


def test_calibration_sets_frontier_capacity(aml_csv):
    from rmm_tpu.datasets import IBMTransactionsAML

    ds = IBMTransactionsAML(root=aml_csv, khop_neighbors=(8, 8), channels=8)
    ec, nc = ds.calibrate_capacities(batch_size=16)
    assert ds.frontier_capacity >= 256
    assert ds.frontier_capacity <= nc


def test_three_hop_exact_parity():
    """3-hop config: non-final hops keep full draw budgets, so the
    deterministic regime still matches the host sampler exactly."""
    rng = np.random.RandomState(7)
    src, dst, n = random_graph(rng, num_nodes=60, num_edges=240)
    fanouts = (256, 256, 256)
    host, dev = make_pair(src, dst, n, fanouts)
    seeds = seed_batch(rng, src, dst, b=4)
    E_cap, N_cap = 512, 128

    sub = host.sample_edges(seeds[:, 0], seeds[:, 1], seeds[:, 2],
                            E_cap, N_cap, rng_seed=3)
    out = jax.jit(lambda s, m, k: sample_edges_device(
        dev, s, m, k, fanouts, E_cap, N_cap))(
            seeds, np.ones(4, bool), jax.random.PRNGKey(0))
    host_edges = set(sub.edge_ids[sub.edge_mask].tolist())
    dev_edges = set(np.asarray(out["edge_gather"])[
        np.asarray(out["edge_mask"])].tolist())
    assert host_edges == dev_edges
    assert int(out["num_dropped"]) == 0
