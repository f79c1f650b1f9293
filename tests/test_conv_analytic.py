"""Full conv-LAYER analytic goldens (VERDICT r4 next-step #6).

The aggregation math is pinned by ``test_pna_analytic.py``; the full-model
torch parity oracle shares its reading of PyG's PNAConv internals with the
goldens generator.  This fixture breaks that residual loop for the layer
*wiring*: ``tests/golden/conv_analytic.json`` pins one complete PNAConv
(edge_encoder → pre_nn → aggregate+scale → post_nn → lin) and one complete
GINEConv ((1+eps)·x + Σ relu(x_src + edge_lin(attr)) → Linear → ReLU →
Linear) with identity-ish weights whose outputs were derived BY HAND
(``tools/derive_conv_goldens.py`` — scalar ``math`` module only) from
PyG's documented contract as configured by the reference
(``/root/reference/src/nn/gnn/pna.py:60-77``, ``gine.py:62-67``).

Both masked lanes carry garbage attrs — any backend that leaks padding
fails every row.  All segment backends are pinned.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rmm_tpu.nn.gnn.conv import GINEConv, PNAConv

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "golden", "conv_analytic.json")

PNA_BACKENDS = ("cv", "sort", "hybrid", "scatter")
SUM_BACKENDS = ("sort", "scatter")

I2 = np.eye(2, dtype=np.float32)


@pytest.fixture(scope="module")
def fix():
    with open(FIX) as f:
        return json.load(f)


def _inputs(fix, which):
    x = jnp.asarray(fix["x"], jnp.float32)
    ei = jnp.asarray([fix["src"], fix["dst"]], jnp.int32)
    attr = jnp.asarray(fix[which]["edge_attr"], jnp.float32)
    mask = jnp.asarray(fix["mask"], bool)
    want = np.asarray(fix[which]["expected"], np.float32)
    return x, ei, attr, mask, want


def _pna_params():
    """The identity-ish weights of the derivation (docstring of
    tools/derive_conv_goldens.py)."""
    pre = np.vstack([I2, I2, I2])                  # m = x_dst + x_src + e
    post = np.zeros((26, 2), np.float32)
    post[0, 0] = post[2, 0] = post[9, 0] = 1.0     # x0 + mean0 + std1
    post[7, 1] = post[25, 1] = 1.0                 # max1 + att·std1
    return {"params": {
        "edge_encoder": {"kernel": I2, "bias": np.zeros(2, np.float32)},
        "pre_nn": {"kernel": pre.astype(np.float32),
                   "bias": np.zeros(2, np.float32)},
        "post_nn": {"kernel": post,
                    "bias": np.asarray([0.0, 0.25], np.float32)},
        "lin": {"kernel": np.asarray([[2.0, 1.0], [0.0, -1.0]], np.float32),
                "bias": np.asarray([0.5, -1.0], np.float32)},
    }}


def _gine_params():
    return {"params": {
        "edge_lin": {"kernel": I2, "bias": np.zeros(2, np.float32)},
        "nn_0": {"kernel": np.asarray([[1.0, 0.0], [-1.0, 1.0]], np.float32),
                 "bias": np.asarray([-2.0, 0.0], np.float32)},
        "nn_1": {"kernel": np.asarray([[1.0, 2.0], [1.0, -1.0]], np.float32),
                 "bias": np.asarray([0.5, -0.5], np.float32)},
    }}


@pytest.mark.parametrize("impl", PNA_BACKENDS)
def test_pna_full_layer_matches_hand_derivation(fix, impl, monkeypatch):
    monkeypatch.setenv("RMM_SEGMENT_IMPL", impl)
    x, ei, attr, mask, want = _inputs(fix, "pna")
    conv = PNAConv(channels=2, avg_log_deg=fix["avg_log_deg"])
    out = conv.apply(_pna_params(), x, ei, attr, mask)
    assert out.shape == want.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("impl", SUM_BACKENDS)
def test_gine_full_layer_matches_hand_derivation(fix, impl, monkeypatch):
    monkeypatch.setenv("RMM_SEGMENT_IMPL", impl)
    x, ei, attr, mask, want = _inputs(fix, "gine")
    conv = GINEConv(channels=2)
    out = conv.apply(_gine_params(), x, ei, attr, mask)
    assert out.shape == want.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-6, atol=2e-6)


def test_gine_relu_sits_on_the_message(fix):
    """node2's single pre-relu message is [7,−2] → relu clips ch1 to 0
    BEFORE the sum.  A wiring that applies relu after aggregation (or not
    at all) produces h2 = x2 + [7,−2] = [9,−2] instead of [9,0], which
    flows to y2 = [5.5, 15.5] ≠ [7.5, 13.5] — pin the distinction."""
    x, ei, attr, mask, want = _inputs(fix, "gine")
    out = np.asarray(GINEConv(channels=2).apply(
        _gine_params(), x, ei, attr, mask))
    np.testing.assert_allclose(out[2], [7.5, 13.5], rtol=1e-6)
    assert abs(out[2, 0] - 5.5) > 1.0 and abs(out[2, 1] - 15.5) > 1.0


def test_masked_lanes_do_not_leak(fix):
    """Flip the two garbage lanes real → every output row must move (the
    garbage is huge); with mask intact the outputs match the derivation,
    so the mask is provably consulted by the full layer."""
    x, ei, attr, mask, want = _inputs(fix, "pna")
    conv = PNAConv(channels=2, avg_log_deg=fix["avg_log_deg"])
    leaked = np.asarray(conv.apply(
        _pna_params(), x, ei, attr, jnp.ones_like(mask)))
    assert np.abs(leaked - want).max() > 1.0
