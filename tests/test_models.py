"""Shape/grad tests for every model backbone + golden-value loss/metric
parity against straightforward NumPy re-implementations of the reference
semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmm_tpu.nn.gnn import CPNA, CPNATAB, GINe, PNAS
from rmm_tpu.nn.models import (
    FTTransformer,
    RCTransformer,
    TABGNN,
    TABGNNFused,
    TABGNNInterleaved,
)
from rmm_tpu.nn.decoders import (
    ClassifierHead,
    LinkPredHead,
    MCMHead,
    NodeClassificationHead,
    SupervisedHead,
)
from rmm_tpu.utils.loss import SSLoss, cross_entropy
from rmm_tpu.utils.metric import SSMetric, f1_score

V, E, B, C, H = 20, 60, 8, 16, 16


@pytest.fixture(scope="module")
def graph_batch():
    rng = np.random.RandomState(0)
    return dict(
        x_tok=jnp.array(rng.randn(V, 3, C), jnp.float32),
        e_tok=jnp.array(rng.randn(E, 4, C), jnp.float32),
        nf=jnp.array(rng.randn(V, 5), jnp.float32),
        ei=jnp.array(rng.randint(0, V, (2, E))),
        emask=jnp.array(rng.rand(E) < 0.9),
        nmask=jnp.ones(V, bool),
        key=jax.random.PRNGKey(0),
    )


def _apply_train(m, variables, *args, key, **kw):
    return m.apply(variables, *args, mutable=["batch_stats"],
                   rngs={"dropout": key}, **kw)


def test_fttransformer_shapes(graph_batch):
    g = graph_batch
    m = FTTransformer(C, 2)
    p = m.init(g["key"], g["e_tok"])
    x, x_cls = m.apply(p, g["e_tok"])
    assert x.shape == (E, 4, C) and x_cls.shape == (E, C)


def test_tabgnn_forward_and_grad(graph_batch):
    g = graph_batch
    m = TABGNN(channels=C, num_layers=2, nhidden=H, avg_log_deg=1.1)
    vs = m.init(g["key"], g["x_tok"], g["ei"], g["e_tok"], g["emask"],
                g["nmask"])

    def loss(params):
        (x, ea), _ = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            g["x_tok"], g["ei"], g["e_tok"], g["emask"], g["nmask"], True,
            mutable=["batch_stats"], rngs={"dropout": g["key"]})
        return jnp.sum(x ** 2) + jnp.sum(ea ** 2)

    grads = jax.grad(loss)(vs["params"])
    gnorm = sum(float(jnp.abs(v).sum())
                for v in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_fused_lp_flag_skips_pooling(graph_batch):
    g = graph_batch
    tei = g["ei"][:, :B]
    m = TABGNNFused(channels=C, num_layers=2, node_dim=5, nhidden=H,
                    avg_log_deg=1.1)
    vs = m.init(g["key"], g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B])
    (xg, ea, tea), _ = _apply_train(
        m, vs, g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B], False,
        g["emask"], g["nmask"], True, key=g["key"])
    assert xg.shape == (V, H) and ea.shape == (E, H) and tea.shape == (B, H)
    (xg_lp, _, _), _ = _apply_train(
        m, vs, g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B], True,
        g["emask"], g["nmask"], True, key=g["key"])
    # lp=True skips the fuse/pooling path → different node states
    assert not np.allclose(np.asarray(xg), np.asarray(xg_lp))


def test_interleaved_and_rowcol(graph_batch):
    g = graph_batch
    m = TABGNNInterleaved(channels=C, num_layers=2, node_dim=5, nhidden=C,
                          avg_log_deg=1.1)
    vs = m.init(g["key"], g["nf"], g["ei"], g["e_tok"])
    (xg, xe), _ = _apply_train(m, vs, g["nf"], g["ei"], g["e_tok"],
                               g["emask"], g["nmask"], True, key=g["key"])
    assert xg.shape == (V, C) and xe.shape == (E, C)

    m = RCTransformer(C, 1)
    p = m.init(g["key"], g["e_tok"])
    x, x_cls = m.apply(p, g["e_tok"])
    assert x.shape == (E, 4, C) and x_cls.shape == (E, C)


@pytest.mark.parametrize("cls,kw", [
    (GINe, dict(n_hidden=H, num_gnn_layers=2, edge_updates=True)),
    (GINe, dict(n_hidden=H, num_gnn_layers=1, reverse_mp=True)),
    (PNAS, dict(n_hidden=H, num_gnn_layers=2, avg_log_deg=1.1)),
    (PNAS, dict(n_hidden=H, num_gnn_layers=1, avg_log_deg=1.1,
                reverse_mp=True)),
    (CPNA, dict(n_hidden=C, num_gnn_layers=1, num_cols=4, avg_log_deg=1.1)),
    (CPNATAB, dict(n_hidden=C, num_gnn_layers=1, num_cols=4,
                   avg_log_deg=1.1)),
])
def test_gnn_zoo_shapes(graph_batch, cls, kw):
    g = graph_batch
    m = cls(**kw)
    vs = m.init(g["key"], g["x_tok"], g["ei"], g["e_tok"])
    out, _ = _apply_train(m, vs, g["x_tok"], g["ei"], g["e_tok"], g["emask"],
                          g["nmask"], True, key=g["key"])
    assert out[0].shape == (V, kw["n_hidden"])


def test_heads(graph_batch):
    g = graph_batch
    key = g["key"]
    x = jnp.array(np.random.RandomState(1).randn(V, H), jnp.float32)
    ea = jnp.array(np.random.RandomState(2).randn(B, H), jnp.float32)
    tei = g["ei"][:, :B]

    h = ClassifierHead(n_classes=2, n_hidden=H)
    p = h.init(key, x, tei, ea)
    assert h.apply(p, x, tei, ea).shape == (B, 2)

    h = NodeClassificationHead(n_classes=3, n_hidden=H)
    p = h.init(key, x)
    assert h.apply(p, x).shape == (V, 3)

    h = LinkPredHead(n_hidden=H)
    p = h.init(key, x, tei, ea, tei, ea)
    pos, neg = h.apply(p, x, tei, ea, tei, ea)
    assert pos.shape == (B, 1)
    assert float(pos.min()) >= 0 and float(pos.max()) <= 1  # sigmoid head

    h = SupervisedHead(H, 2)
    p = h.init(key, x)
    assert h.apply(p, x).shape == (V, 2)

    h = MCMHead(H, num_numerical=2, num_categorical=[3, 5], w=1)
    p = h.init(key, x)
    num_out, cat_out = h.apply(p, x)
    assert num_out.shape == (V, 2)
    assert [c.shape for c in cat_out] == [(V, 3), (V, 5)]


def test_mcm_loss_matches_reference_semantics():
    """Golden parity with the reference's row-split mcm_loss
    (``src/utils/loss.py:41-72``) computed longhand in NumPy."""
    rng = np.random.RandomState(3)
    n_num, cards = 2, [3, 5]
    Bn = 16
    y = np.stack([
        np.where(rng.rand(Bn) < 0.5, rng.rand(Bn) * 2,
                 rng.randint(0, 3, Bn)),
        rng.randint(0, n_num + len(cards), Bn),
    ], axis=1).astype(np.float32)
    num_out = rng.randn(Bn, n_num).astype(np.float32)
    cat_out = [rng.randn(Bn, k).astype(np.float32) for k in cards]

    ss = SSLoss(n_num)
    tot, (cl, tc, acc), (nl, tn) = ss.mcm_loss(
        [jnp.array(c) for c in cat_out], jnp.array(num_out), jnp.array(y))

    # numpy longhand
    cl_ref = nl_ref = 0.0
    tc_ref = tn_ref = 0
    for i in range(Bn):
        val, idx = y[i, 0], int(y[i, 1])
        if idx >= n_num:
            logits = cat_out[idx - n_num][i]
            p = np.exp(logits - logits.max())
            p /= p.sum()
            cl_ref += -np.log(p[int(val)])
            tc_ref += 1
        else:
            nl_ref += (num_out[i, idx] - val) ** 2
            tn_ref += 1
    np.testing.assert_allclose(float(cl), cl_ref, rtol=1e-4)
    np.testing.assert_allclose(float(nl), nl_ref, rtol=1e-4)
    assert int(tc) == tc_ref and int(tn) == tn_ref
    expected = (cl_ref / max(tc_ref, 1) if tc_ref else 0.0) + (
        np.sqrt(nl_ref / tn_ref) if tn_ref else 0.0)
    np.testing.assert_allclose(float(tot), expected, rtol=1e-4)


def test_mcm_loss_valid_mask_ignores_padding():
    ss = SSLoss(1)
    y = jnp.array([[1.0, 0], [5.0, 0], [99.0, 0]])
    num_out = jnp.ones((3, 1))
    mask = jnp.array([True, True, False])
    tot, _, (nl, tn) = ss.mcm_loss([], num_out, y, valid_mask=mask)
    np.testing.assert_allclose(float(nl), 16.0, rtol=1e-5)  # only row 1
    assert int(tn) == 2


def test_mrr_matches_argsort_reference():
    rng = np.random.RandomState(4)
    P, K = 10, 6
    pos = rng.rand(P)
    neg = rng.rand(P * K)
    mrr, hits = SSMetric.mrr(pos, neg, [1, 2, 5], K)
    # reference: stable descending argsort with pos appended last
    ranks = []
    for i in range(P):
        combined = np.concatenate([neg[i * K : (i + 1) * K], [pos[i]]])
        order = (-combined).argsort(kind="stable").argsort(kind="stable") + 1
        ranks.append(order[-1])
    ranks = np.array(ranks)
    np.testing.assert_allclose(mrr, np.mean(1.0 / ranks), rtol=1e-6)
    for k in (1, 2, 5):
        np.testing.assert_allclose(hits[f"hits@{k}"], np.mean(ranks <= k))


def test_weighted_cross_entropy_torch_semantics():
    logits = jnp.array([[2.0, 0.0], [0.0, 3.0]])
    labels = jnp.array([0, 1])
    w = jnp.array([1.0, 9.0])
    out = float(cross_entropy(logits, labels, w))
    lp0 = -np.log(np.exp(2) / (np.exp(2) + 1))
    lp1 = -np.log(np.exp(3) / (np.exp(3) + 1))
    np.testing.assert_allclose(out, (1 * lp0 + 9 * lp1) / 10, rtol=1e-5)


def test_f1_binary_and_weighted():
    assert f1_score([1, 0, 1, 1], [1, 0, 0, 1]) == pytest.approx(0.8)
    try:
        from sklearn.metrics import f1_score as sk_f1
        yt = np.random.RandomState(5).randint(0, 3, 50)
        yp = np.random.RandomState(6).randint(0, 3, 50)
        np.testing.assert_allclose(
            f1_score(yt, yp, "weighted"),
            sk_f1(yt, yp, average="weighted"), rtol=1e-9)
    except ImportError:
        pass


def test_fused_scan_layers_matches_unrolled(graph_batch):
    """scan_layers=True (lax.scan over stacked layer params) must be
    numerically identical to the unrolled stack in deterministic mode."""
    from rmm_tpu.nn.models import stack_fused_layers

    g = graph_batch
    tei = g["ei"][:, :B]
    kw = dict(channels=C, num_layers=3, node_dim=5, nhidden=H,
              avg_log_deg=1.1)
    m_unroll = TABGNNFused(**kw)
    m_scan = TABGNNFused(scan_layers=True, **kw)
    vs = m_unroll.init(g["key"], g["nf"], g["ei"], g["e_tok"], tei,
                       g["e_tok"][:B])
    vs_scan = {
        "params": stack_fused_layers(vs["params"], 3),
        "batch_stats": stack_fused_layers(vs["batch_stats"], 3),
    }
    # layouts must agree with a freshly initialized scanned model
    ref = m_scan.init(g["key"], g["nf"], g["ei"], g["e_tok"], tei,
                      g["e_tok"][:B])
    assert (jax.tree_util.tree_structure(ref["params"])
            == jax.tree_util.tree_structure(vs_scan["params"]))
    for lp in (False, True):
        out_u = m_unroll.apply(vs, g["nf"], g["ei"], g["e_tok"], tei,
                               g["e_tok"][:B], lp, g["emask"], g["nmask"])
        out_s = m_scan.apply(vs_scan, g["nf"], g["ei"], g["e_tok"], tei,
                             g["e_tok"][:B], lp, g["emask"], g["nmask"])
        for a, b in zip(out_u, out_s):
            # identical math, but XLA fuses the scan body differently than
            # the unrolled graph → f32 reassociation noise only
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)


def test_fused_scan_layers_train_grads(graph_batch):
    """Training mode under scan: dropout rngs split per step, batch_stats
    update (stacked axis 0), grads finite and nonzero for every layer."""
    g = graph_batch
    tei = g["ei"][:, :B]
    m = TABGNNFused(channels=C, num_layers=2, node_dim=5, nhidden=H,
                    avg_log_deg=1.1, scan_layers=True)
    vs = m.init(g["key"], g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B])
    assert "layers" in vs["params"]

    def loss(params):
        (xg, ea, tea), mut = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B], False,
            g["emask"], g["nmask"], True, mutable=["batch_stats"],
            rngs={"dropout": g["key"]})
        return jnp.sum(xg ** 2) + jnp.sum(tea ** 2), mut

    (val, mut), grads = jax.value_and_grad(loss, has_aux=True)(vs["params"])
    assert np.isfinite(float(val))
    stacked = grads["layers"]["layer"]
    for leaf in jax.tree_util.tree_leaves(stacked):
        assert leaf.shape[0] == 2
        assert np.all(np.isfinite(np.asarray(leaf)))
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(stacked))
    assert gnorm > 0
    # batch_stats carried through the scan keep the stacked leading axis
    for leaf in jax.tree_util.tree_leaves(mut["batch_stats"]["layers"]):
        assert leaf.shape[0] == 2


def test_fused_scan_layers_bf16_carry(graph_batch):
    """Under precision=bf16 the scan carry must keep stable dtypes: the
    layer body promotes via f32 params, the body casts back (bf16
    activations across ALL layers — the unrolled path promotes after
    layer 1)."""
    g = graph_batch
    tei = g["ei"][:, :B]
    m = TABGNNFused(channels=C, num_layers=2, node_dim=5, nhidden=H,
                    avg_log_deg=1.1, scan_layers=True)
    vs = m.init(g["key"], g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B])
    args = [g["nf"].astype(jnp.bfloat16), g["ei"],
            g["e_tok"].astype(jnp.bfloat16), tei,
            g["e_tok"][:B].astype(jnp.bfloat16)]
    xg, ea, tea = m.apply(vs, *args, False, g["emask"], g["nmask"])
    for o in (xg, ea, tea):
        assert np.all(np.isfinite(np.asarray(o, np.float32)))


def test_checkpoint_bridges_scan_layouts(graph_batch, tmp_path):
    """A checkpoint saved from an unrolled TABGNNFused loads into a
    scanned one (and back): --scan_layers may change between pretraining
    and resume/transfer."""
    from rmm_tpu.utils.checkpoint import load_pytree, save_pytree

    g = graph_batch
    tei = g["ei"][:, :B]
    kw = dict(channels=C, num_layers=2, node_dim=5, nhidden=H,
              avg_log_deg=1.1)
    m_u = TABGNNFused(**kw)
    m_s = TABGNNFused(scan_layers=True, **kw)
    vs_u = m_u.init(g["key"], g["nf"], g["ei"], g["e_tok"], tei,
                    g["e_tok"][:B])
    vs_s = m_s.init(jax.random.PRNGKey(9), g["nf"], g["ei"], g["e_tok"],
                    tei, g["e_tok"][:B])

    p = str(tmp_path / "model_u")
    save_pytree(p, vs_u["params"])
    loaded = load_pytree(p, vs_s["params"], strict=False)
    out_u = m_u.apply({"params": vs_u["params"],
                       "batch_stats": vs_u["batch_stats"]},
                      g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B],
                      False, g["emask"], g["nmask"])
    from rmm_tpu.nn.models import stack_fused_layers
    out_s = m_s.apply({"params": loaded,
                       "batch_stats": stack_fused_layers(
                           vs_u["batch_stats"], 2)},
                      g["nf"], g["ei"], g["e_tok"], tei, g["e_tok"][:B],
                      False, g["emask"], g["nmask"])
    for a, b in zip(out_u, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # reverse: scanned checkpoint into an unrolled template
    p2 = str(tmp_path / "model_s")
    save_pytree(p2, vs_s["params"])
    back = load_pytree(p2, vs_u["params"], strict=False)
    first = jax.tree_util.tree_leaves(back["layer_0"])[0]
    want = jax.tree_util.tree_leaves(
        vs_s["params"]["layers"]["layer"])[0][0]
    np.testing.assert_array_equal(np.asarray(first), np.asarray(want))
