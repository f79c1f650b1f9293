"""Hand-derived analytic PNA goldens (VERDICT r3 next-step #3).

``tests/golden/pyg_golden.npz`` currently records ``source:
"torch-reimpl"`` — a pure-torch reimplementation of PyG's PNAConv
semantics, written by the same author as the JAX code under test. A
shared misreading of the std aggregator or the degree scalers would
agree with itself. This fixture breaks that loop: every number in
``tests/golden/pna_analytic.json`` was derived by hand (pencil +
python's scalar ``math`` module only — no numpy vector ops, no code
shared with either implementation) from PyG's documented contract
(torch_geometric 2.5.x: ``nn/conv/pna_conv.py``,
``nn/aggr/basic.py::StdAggregation``, ``nn/aggr/scaler.py``), which is
the exact configuration the reference uses
(``/root/reference/src/nn/gnn/pna.py:60-77``).

The derivation, in full
----------------------

Graph: 3 nodes, F=2 message channels, 6 real + 2 masked edges.

* node 0 ← m=[1,2], [3,6]:
    mean=[2,4]; min=[1,2]; max=[3,6];
    E[m²]=[(1+9)/2,(4+36)/2]=[5,20]; var=E[m²]−mean²=[1,4];
    std=[√(1+ε), √(4+ε)]  (ε=1e-5, PyG StdAggregation adds ε inside √)
* node 1 ← m=[0,1], [2,3], [4,5]:
    mean=[2,3]; min=[0,1]; max=[4,5];
    E[m²]=[20/3, 35/3]; var=[20/3−4, 35/3−9]=[8/3, 8/3];
    std=[√(8/3+ε), √(8/3+ε)]
* node 2 ← m=[7,−2] (single message):
    mean=min=max=[7,−2]; var=0; std=[√ε, √ε]

Degrees d=[2,3,1] → log(d+1)=[ln3, ln4, ln2].
Degree histogram (index = in-degree): [0,1,1,1] →
    avg_log_deg = (Σ_d hist[d]·ln(d+1)) / Σ_d hist[d] = (ln2+ln3+ln4)/3
    (PyG PNAConv ``avg_deg['log']``; reference builds the histogram at
    ``utils.py:179-182``).
Scalers: amplification = ln(d+1)/avg_log_deg, attenuation = its inverse.
Output layout: [agg | agg·amp | agg·att], agg = [mean|min|max|std]·F.

The two masked lanes carry garbage ([999,−999] to node 0, [123,456] to
node 2) — any backend that leaks padding into the aggregates fails every
column of those rows.
"""
import json
import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rmm_tpu.ops.segment import pna_aggregate, pna_scalers_from_histogram

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "golden", "pna_analytic.json")

BACKENDS = ("cv", "sort", "hybrid", "scatter")


@pytest.fixture(scope="module")
def fix():
    with open(FIX) as f:
        return json.load(f)


def test_avg_log_deg_convention(fix):
    """The histogram→avg_log_deg helper matches the pencil value
    (ln2+ln3+ln4)/3 — PyG's avg_deg['log'] convention."""
    got = pna_scalers_from_histogram(fix["deg_histogram"])
    want = (math.log(2) + math.log(3) + math.log(4)) / 3.0
    assert abs(got - want) < 1e-6
    assert abs(fix["avg_log_deg"] - want) < 1e-12


@pytest.mark.parametrize("impl", BACKENDS)
def test_pna_forward_matches_hand_derivation(fix, impl):
    msgs = jnp.asarray(fix["messages"], jnp.float32)
    dst = jnp.asarray(fix["dst"], jnp.int32)
    mask = jnp.asarray(fix["mask"], bool)
    out = pna_aggregate(msgs, dst, fix["num_nodes"], fix["avg_log_deg"],
                        mask, impl=impl)
    want = np.asarray(fix["expected"], np.float32)
    assert out.shape == want.shape == (3, 24)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-6, atol=2e-6)


def test_spot_values_rederived_inline(fix):
    """Independent spot re-derivation (no fixture, no numpy vector ops):
    pin node 1's std·attenuation block and node 2's mean·amplification."""
    eps = 1e-5
    avg = (math.log(2) + math.log(3) + math.log(4)) / 3.0
    out = np.asarray(pna_aggregate(
        jnp.asarray(fix["messages"], jnp.float32),
        jnp.asarray(fix["dst"], jnp.int32), 3, avg,
        jnp.asarray(fix["mask"], bool)))
    # node 1 (deg 3): std = [sqrt(8/3+eps)]·2, att = avg/ln4
    att1 = avg / math.log(4)
    assert abs(out[1, 22] - math.sqrt(8.0 / 3.0 + eps) * att1) < 2e-6
    assert abs(out[1, 23] - math.sqrt(8.0 / 3.0 + eps) * att1) < 2e-6
    # node 2 (deg 1): mean·amp = 7·ln2/avg, −2·ln2/avg
    amp2 = math.log(2) / avg
    assert abs(out[2, 8] - 7.0 * amp2) < 2e-6
    assert abs(out[2, 9] - (-2.0) * amp2) < 2e-6
