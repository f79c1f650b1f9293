"""Property/fuzz tests: native C++ sampler vs NumPy fallback on random
graphs — structural invariants that must hold for BOTH implementations
(outputs differ by RNG stream; the contracts must not)."""
import numpy as np
import pytest

from rmm_tpu.graph import NeighborSampler


def random_graph(rng, n_nodes, n_edges):
    src = rng.randint(0, n_nodes, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    keep = src != dst
    return np.stack([src[keep], dst[keep]]), n_nodes


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("trial", range(3))
def test_edge_sample_invariants(use_native, trial):
    rng = np.random.RandomState(100 + trial)
    ei, n = random_graph(rng, rng.randint(20, 80), rng.randint(50, 300))
    E = ei.shape[1]
    s = NeighborSampler(ei, None, n, fanouts=[rng.randint(1, 6),
                                              rng.randint(1, 6)],
                        seed=trial, use_native=use_native)
    b = min(rng.randint(2, 12), E)
    seed_ids = rng.choice(E, b, replace=False)
    sub = s.sample_edges(ei[0][seed_ids], ei[1][seed_ids], seed_ids,
                         max_edges=4 * E, max_nodes=4 * n)

    # 1. seed-first, input order
    np.testing.assert_array_equal(sub.edge_ids[:b], seed_ids)
    # 2. no duplicate edges among valid lanes
    valid = sub.edge_ids[: sub.num_edges]
    assert len(np.unique(valid)) == len(valid)
    # 3. every sampled id is a real edge id
    assert ((valid >= 0) & (valid < E)).all()
    # 4. local endpoints decode to the true global endpoints
    for k in range(sub.num_edges):
        e = sub.edge_ids[k]
        assert sub.node_ids[sub.edge_index[0, k]] == ei[0][e]
        assert sub.node_ids[sub.edge_index[1, k]] == ei[1][e]
    # 5. node list: sorted unique, covers exactly the endpoints
    nodes = sub.node_ids[: sub.num_nodes]
    np.testing.assert_array_equal(nodes, np.sort(np.unique(nodes)))
    endpoints = np.unique(
        np.concatenate([ei[0][valid], ei[1][valid]]))
    np.testing.assert_array_equal(nodes, endpoints)
    # 6. masks consistent with counts
    assert sub.edge_mask.sum() == sub.num_edges
    assert sub.node_mask.sum() == sub.num_nodes


@pytest.mark.parametrize("use_native", [True, False])
def test_node_sample_invariants(use_native):
    rng = np.random.RandomState(7)
    ei, n = random_graph(rng, 60, 240)
    s = NeighborSampler(ei, None, n, fanouts=[3, 3], seed=1,
                        use_native=use_native)
    seeds = rng.choice(n, 6, replace=False)
    sub = s.sample_nodes(seeds, max_edges=1024, max_nodes=256)
    np.testing.assert_array_equal(sub.node_ids[:6], seeds)
    rest = sub.node_ids[6 : sub.num_nodes]
    np.testing.assert_array_equal(rest, np.sort(rest))
    assert not np.isin(rest, seeds).any()
    # sampled edges' endpoints are all in the node list
    nodes = set(sub.node_ids[: sub.num_nodes].tolist())
    for k in range(sub.num_edges):
        e = sub.edge_ids[k]
        assert int(ei[0][e]) in nodes and int(ei[1][e]) in nodes
