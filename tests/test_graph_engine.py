"""Tests for the C++/NumPy graph engine: CSR sampling, ordering contracts,
negative sampling properties, ports, ego ids."""
import numpy as np
import pytest

from rmm_tpu.graph import (
    GraphStore,
    NeighborSampler,
    add_ego_ids,
    generate_negative_samples,
    load_library,
)

HAS_NATIVE = load_library() is not None


def chain_graph(n=30):
    # 0->1->2->...->n-1 plus some extra random edges
    rng = np.random.RandomState(0)
    src = np.concatenate([np.arange(n - 1), rng.randint(0, n, 40)])
    dst = np.concatenate([np.arange(1, n), rng.randint(0, n, 40)])
    keep = src != dst
    return np.stack([src[keep], dst[keep]]), n


def test_native_library_builds():
    assert HAS_NATIVE, "C++ graph engine failed to build"


@pytest.mark.parametrize("use_native", [True, False])
def test_edge_seed_first_ordering(use_native):
    ei, n = chain_graph()
    s = NeighborSampler(ei, None, n, fanouts=[5, 5], seed=1,
                        use_native=use_native)
    seed_ids = np.array([3, 10, 7])
    sub = s.sample_edges(ei[0][seed_ids], ei[1][seed_ids], seed_ids,
                         max_edges=256, max_nodes=128)
    np.testing.assert_array_equal(sub.edge_ids[:3], seed_ids)
    assert sub.num_edges >= 3
    assert sub.edge_mask[: sub.num_edges].all()
    assert not sub.edge_mask[sub.num_edges:].any()


@pytest.mark.parametrize("use_native", [True, False])
def test_local_relabel_consistency(use_native):
    ei, n = chain_graph()
    s = NeighborSampler(ei, None, n, fanouts=[4, 4], seed=2,
                        use_native=use_native)
    seed_ids = np.array([0, 5])
    sub = s.sample_edges(ei[0][seed_ids], ei[1][seed_ids], seed_ids,
                         max_edges=200, max_nodes=100)
    # every local edge endpoint maps back to the matching global endpoint
    for k in range(sub.num_edges):
        e = sub.edge_ids[k]
        assert sub.node_ids[sub.edge_index[0, k]] == ei[0][e]
        assert sub.node_ids[sub.edge_index[1, k]] == ei[1][e]
    # edge-seeded node order is sorted unique
    valid_nodes = sub.node_ids[: sub.num_nodes]
    np.testing.assert_array_equal(valid_nodes, np.sort(valid_nodes))


@pytest.mark.parametrize("use_native", [True, False])
def test_node_seeded_seeds_first(use_native):
    ei, n = chain_graph()
    s = NeighborSampler(ei, None, n, fanouts=[3], seed=3,
                        use_native=use_native)
    seeds = np.array([9, 2, 17])
    sub = s.sample_nodes(seeds, max_edges=100, max_nodes=100)
    np.testing.assert_array_equal(sub.node_ids[:3], seeds)
    rest = sub.node_ids[3 : sub.num_nodes]
    np.testing.assert_array_equal(rest, np.sort(rest))


def test_fanout_respected():
    # star graph: many in-edges into node 0
    m = 50
    ei = np.stack([np.arange(1, m + 1), np.zeros(m, dtype=np.int64)])
    s = NeighborSampler(ei, None, m + 1, fanouts=[10], seed=4)
    sub = s.sample_nodes(np.array([0]), max_edges=64, max_nodes=64)
    assert sub.num_edges == 10  # sampled exactly fanout of 50 in-edges


def test_overflow_drops_and_counts():
    m = 50
    ei = np.stack([np.arange(1, m + 1), np.zeros(m, dtype=np.int64)])
    s = NeighborSampler(ei, None, m + 1, fanouts=[-1], seed=5)
    sub = s.sample_nodes(np.array([0]), max_edges=20, max_nodes=64)
    assert sub.num_edges == 20
    assert sub.num_dropped == 30


def test_sampler_determinism_with_seed():
    ei, n = chain_graph()
    s = NeighborSampler(ei, None, n, fanouts=[3, 3], seed=6)
    a = s.sample_nodes(np.array([4]), 100, 100, rng_seed=42)
    b = s.sample_nodes(np.array([4]), 100, 100, rng_seed=42)
    np.testing.assert_array_equal(a.edge_ids, b.edge_ids)


def test_graph_store_splits():
    ei, n = chain_graph()
    E = ei.shape[1]
    split = np.zeros(E, dtype=np.int64)
    split[E // 2 : 3 * E // 4] = 1
    split[3 * E // 4 :] = 2
    gs = GraphStore(ei[0], ei[1], split=split, fanouts=[4, 4])
    # train sampler only ever returns split-0 edge ids
    seed_ids = np.nonzero(split == 0)[0][:4]
    sub = gs.sample_edges(
        np.stack([ei[0][seed_ids], ei[1][seed_ids], seed_ids], 1), "train",
        max_edges=200, max_nodes=100)
    sampled = sub.edge_ids[: sub.num_edges]
    assert (split[sampled] == 0).all()
    # val sampler can include split-1; test includes everything
    hist = gs.in_degree_histogram()
    assert hist.sum() == gs.num_nodes  # one histogram entry per node
    # weighted by degree, the histogram counts exactly the train edges
    assert (hist * np.arange(len(hist))).sum() == (split == 0).sum()
    with pytest.raises(ValueError):
        gs.sampler("bogus")


@pytest.mark.parametrize("use_native", [True, False])
def test_negative_sampling_no_collisions(use_native):
    ei, n = chain_graph()
    pos = ei[:, :6]
    neg = generate_negative_samples(ei, pos, num_neg_samples=8, num_nodes=n,
                                    seed=7, use_native=use_native)
    assert neg.shape == (2, 48)
    adj = set(map(tuple, ei.T.tolist())) | set(
        map(tuple, ei[::-1].T.tolist()))
    for i in range(pos.shape[1]):
        s, d = pos[0, i], pos[1, i]
        block = neg[:, i * 8 : (i + 1) * 8]
        # first half corrupts dst, second half corrupts src
        assert (block[0, :4] == s).all()
        assert (block[1, 4:] == d).all()
        for u, v in block.T:
            assert (u, v) not in adj and (v, u) not in adj
            assert not (u == s and v == d)


def test_negative_sampling_deterministic():
    ei, n = chain_graph()
    pos = ei[:, :3]
    a = generate_negative_samples(ei, pos, 4, n, seed=9)
    b = generate_negative_samples(ei, pos, 4, n, seed=9)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("use_native", [True, False])
def test_ports_numbering(use_native):
    # node 0 receives from 1 (t=5), 2 (t=1), 1 again (t=9)
    src = np.array([1, 2, 1, 0])
    dst = np.array([0, 0, 0, 3])
    ts = np.array([5, 1, 9, 0])
    gs = GraphStore(src, dst, timestamps=ts, fanouts=[2],
                    use_native=use_native)
    in_p, out_p = gs.ports()
    # time-sorted unique in-neighbors of 0: [2 (t=1), 1 (t=5)] → ports 1,0,1
    assert in_p[1] == 0  # edge (2->0, t=1) is first unique neighbor
    assert in_p[0] == 1
    assert in_p[2] == 1  # repeat neighbor keeps its port
    assert in_p[3] == 0  # only in-neighbor of 3
    assert out_p[0] == 0 and out_p[2] == 0  # 1's repeated out-neighbor 0


def test_add_ego_ids():
    x = np.zeros((6, 2), dtype=np.float32)
    seed_ei = np.array([[0, 2], [1, 2]])
    out = add_ego_ids(x, seed_ei)
    assert out.shape == (6, 3)
    np.testing.assert_array_equal(out[:, 2], [1, 1, 1, 0, 0, 0])
    out2 = add_ego_ids(x, seed_ei, column=1)
    np.testing.assert_array_equal(out2[:, 1], [1, 1, 1, 0, 0, 0])
