"""Negative edge sampling (C++ engine + NumPy fallback).

Same contract as the reference primitive
(``src/primitives/negative_sampling/negative_sampling.cpp:10-76``): for each
positive edge emit ``num_neg/2`` destination-corruptions followed by
``num_neg/2`` source-corruptions, drawn uniformly over the local node-id
space, excluding both endpoints and their full undirected adjacency within
the batch subgraph. Unlike the reference's ``std::random_device`` seeding,
sampling here is deterministic given ``seed`` (bounded rejection + linear
probe — SURVEY §7 hard part 7).
"""
from __future__ import annotations

import ctypes

import numpy as np

from .build import load_library


def generate_negative_samples(edge_index, pos_edge_index, num_neg_samples,
                              num_nodes=None, seed: int = 0,
                              use_native: bool = True) -> np.ndarray:
    """Return neg_edge_index [2, n_pos * num_neg_samples]."""
    edge_index = np.ascontiguousarray(edge_index, dtype=np.int64)
    pos = np.ascontiguousarray(pos_edge_index, dtype=np.int64)
    n_pos = pos.shape[1]
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1 if edge_index.size else 1

    lib = load_library() if use_native else None
    if lib is not None:
        out_src = np.empty(n_pos * num_neg_samples, dtype=np.int64)
        out_dst = np.empty(n_pos * num_neg_samples, dtype=np.int64)

        def p(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

        src = np.ascontiguousarray(edge_index[0])
        dst = np.ascontiguousarray(edge_index[1])
        lib.rmm_negative_sample(p(src), p(dst), edge_index.shape[1],
                                p(np.ascontiguousarray(pos[0])),
                                p(np.ascontiguousarray(pos[1])), n_pos,
                                num_nodes, num_neg_samples,
                                ctypes.c_uint64(seed), p(out_src), p(out_dst))
        return np.stack([out_src, out_dst])

    # NumPy fallback (same semantics)
    rng = np.random.RandomState(seed % (2**32))
    adj: dict[int, set[int]] = {}
    for u, v in edge_index.T:
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    out_src, out_dst = [], []
    for s, d in pos.T:
        s, d = int(s), int(d)
        banned = {s, d} | adj.get(s, set()) | adj.get(d, set())

        def draw():
            for _ in range(64):
                v = int(rng.randint(0, num_nodes))
                if v not in banned:
                    return v
            start = int(rng.randint(0, num_nodes))
            for k in range(num_nodes):
                v = (start + k) % num_nodes
                if v not in banned:
                    return v
            return (s + 1) % num_nodes
        half = num_neg_samples // 2
        for _ in range(half):
            out_src.append(s)
            out_dst.append(draw())
        for _ in range(num_neg_samples - half):
            out_src.append(draw())
            out_dst.append(d)
    return np.stack([np.asarray(out_src, np.int64),
                     np.asarray(out_dst, np.int64)])
