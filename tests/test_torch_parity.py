"""Golden-value parity vs torch.nn — validates that the rebuilt layers
reproduce the reference's EXACT layer semantics (the reference builds on
``torch.nn.TransformerEncoderLayer``, ``CrossEntropyLoss(weight=...)`` and
``BatchNorm1d``)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmm_tpu.nn.norms import MaskedBatchNorm  # noqa: E402
from rmm_tpu.nn.transformer import TransformerEncoderLayer  # noqa: E402
from rmm_tpu.utils.loss import cross_entropy, lp_loss  # noqa: E402


def test_transformer_encoder_layer_matches_torch():
    """Copy torch weights into the flax layer; outputs must match — proves
    post-norm ordering, MHA packing and FF semantics are identical to
    ``torch.nn.TransformerEncoderLayer`` (the reference's column-attention
    building block, tabgnn.py:193-215)."""
    C, H, FF, B, S = 32, 4, 64, 5, 6
    tl = torch.nn.TransformerEncoderLayer(
        d_model=C, nhead=H, dim_feedforward=FF, dropout=0.0,
        activation="relu", batch_first=True)
    tl.eval()

    fl = TransformerEncoderLayer(C, H, FF, dropout=0.0, activation="relu")
    x = np.random.RandomState(0).randn(B, S, C).astype(np.float32)
    params = fl.init(jax.random.PRNGKey(0), jnp.array(x))["params"]

    def t2n(t):
        return np.asarray(t.detach().numpy())

    sd = tl.state_dict()
    w_in = t2n(sd["self_attn.in_proj_weight"])      # [3C, C]
    b_in = t2n(sd["self_attn.in_proj_bias"])        # [3C]
    w_out = t2n(sd["self_attn.out_proj.weight"])    # [C, C]
    b_out = t2n(sd["self_attn.out_proj.bias"])

    params = jax.tree_util.tree_map(lambda p: p, params)  # unfreeze copy
    attn = dict(params["self_attn"])
    attn["qkv_kernel"] = jnp.array(w_in.T)
    attn["qkv_bias"] = jnp.array(b_in)
    attn["out_kernel"] = jnp.array(w_out.T)
    attn["out_bias"] = jnp.array(b_out)
    new = dict(params)
    new["self_attn"] = attn
    new["linear1"] = {"kernel": jnp.array(t2n(sd["linear1.weight"]).T),
                      "bias": jnp.array(t2n(sd["linear1.bias"]))}
    new["linear2"] = {"kernel": jnp.array(t2n(sd["linear2.weight"]).T),
                      "bias": jnp.array(t2n(sd["linear2.bias"]))}
    new["norm1"] = {"scale": jnp.array(t2n(sd["norm1.weight"])),
                    "bias": jnp.array(t2n(sd["norm1.bias"]))}
    new["norm2"] = {"scale": jnp.array(t2n(sd["norm2.weight"])),
                    "bias": jnp.array(t2n(sd["norm2.bias"]))}

    with torch.no_grad():
        ref = tl(torch.tensor(x)).numpy()
    out = np.asarray(fl.apply({"params": new}, jnp.array(x),
                              deterministic=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(16, 2).astype(np.float32)
    labels = rng.randint(0, 2, 16)
    w = np.array([1.0, 9.23], np.float32)  # main.py:182 weights
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(labels)).item()
    out = float(cross_entropy(jnp.array(logits), jnp.array(labels),
                              jnp.array(w)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_batchnorm_matches_torch_train_and_eval():
    F, N = 8, 32
    rng = np.random.RandomState(2)
    x1 = rng.randn(N, F).astype(np.float32)
    x2 = rng.randn(N, F).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(F)
    tbn.train()
    ref1 = tbn(torch.tensor(x1)).detach().numpy()
    ref2 = tbn(torch.tensor(x2)).detach().numpy()
    tbn.eval()
    ref_eval = tbn(torch.tensor(x1)).detach().numpy()

    bn = MaskedBatchNorm(F)
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x1), None, True)
    out1, v = bn.apply(variables, jnp.array(x1), None, True,
                       mutable=["batch_stats"])
    variables = {"params": variables["params"], **v}
    out2, v = bn.apply(variables, jnp.array(x2), None, True,
                       mutable=["batch_stats"])
    variables = {"params": variables["params"], **v}
    out_eval = bn.apply(variables, jnp.array(x1), None, False)

    np.testing.assert_allclose(np.asarray(out1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval, rtol=1e-3,
                               atol=1e-4)


def test_lp_loss_matches_reference_formula():
    """−log(pos+ε).mean() − log(1−neg+ε).mean() (loss.py:10-11), computed
    longhand in torch."""
    rng = np.random.RandomState(3)
    pos = rng.rand(10).astype(np.float32)
    neg = rng.rand(40).astype(np.float32)
    ref = (-torch.log(torch.tensor(pos) + 1e-12).mean()
           - torch.log(1 - torch.tensor(neg) + 1e-12).mean()).item()
    out = float(lp_loss(jnp.array(pos), jnp.array(neg)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)
