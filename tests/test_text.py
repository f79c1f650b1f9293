"""Tests for the text stack: embedders, tokenizer, LoRA, finetune encoder,
AmazonFashion dataset, downstream + pure-LLM trainers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmm_tpu.datasets.amazon_fashion import (
    AmazonFashionDataset,
    synthetic_amazon_fashion,
)
from rmm_tpu.frame.stype import Stype
from rmm_tpu.nn.text import (
    HashingTextEmbedder,
    HashingTokenizer,
    LoRADense,
    TextToEmbeddingFinetune,
)
from rmm_tpu.train.downstream_text import TextTabularRegressionTrainer
from rmm_tpu.utils.config import Config
from rmm_tpu.utils.pooling import last_pooling, mean_pooling


@pytest.fixture(scope="module")
def reviews_csv(tmp_path_factory):
    return synthetic_amazon_fashion(
        str(tmp_path_factory.mktemp("amz") / "reviews.csv"), num_rows=400)


def test_hashing_embedder_deterministic_and_local():
    emb = HashingTextEmbedder(dim=64)
    a = emb(["great product", "great product", "terrible thing"])
    np.testing.assert_allclose(a[0], a[1])
    # shared n-grams → more similar than unrelated text
    sim_same = a[0] @ emb(["great products"])[0]
    sim_diff = a[0] @ a[2]
    assert sim_same > sim_diff
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_tokenizer_pads_and_buckets():
    tok = HashingTokenizer(vocab_size=100, max_length=6)
    out = tok(["hello world", ""])
    assert out.shape == (2, 6)
    assert (out[1] == 0).all()
    assert out[0, 0] != 0 and (out[0] < 100).all()


def test_pooling():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    mask = jnp.array([[1, 1, 0], [1, 1, 1]])
    mp = mean_pooling(x, mask)
    assert mp.shape == (2, 1, 4)
    np.testing.assert_allclose(np.asarray(mp[0, 0]),
                               np.asarray(x[0, :2].mean(0)))
    lp = last_pooling(x, mask)
    np.testing.assert_allclose(np.asarray(lp[0]), np.asarray(x[0, 1]))
    np.testing.assert_allclose(np.asarray(lp[1]), np.asarray(x[1, 2]))


def test_lora_dense_freeze_base():
    m = LoRADense(4, rank=2, freeze_base=True)
    x = jnp.ones((3, 5))
    p = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(m.apply(params, x) ** 2)

    g = jax.grad(loss)(p)["params"]
    assert float(jnp.abs(g["kernel"]).sum()) == 0.0  # frozen base
    # standard LoRA init: B=0, so first grads land on lora_b
    assert float(jnp.abs(g["lora_b"]).sum()) > 0.0   # adapters train


def test_finetune_encoder_shapes():
    enc = TextToEmbeddingFinetune(hidden=32, num_layers=1, lora_rank=4,
                                  max_length=8, vocab_size=64)
    ids = TextToEmbeddingFinetune.tokenize(["a b c", "d"], vocab_size=64,
                                           max_length=8)
    p = enc.init(jax.random.PRNGKey(0), jnp.array(ids))
    out = enc.apply(p, jnp.array(ids))
    assert out.shape == (2, 32)


@pytest.mark.parametrize("text_stype", [Stype.text_embedded,
                                        Stype.text_tokenized])
def test_amazon_fashion_materializes(reviews_csv, text_stype):
    ds = AmazonFashionDataset(root=reviews_csv, text_stype=text_stype,
                              khop_neighbors=(4, 4), edge_capacity=256,
                              node_capacity=256)
    tf = ds.edges.tensor_frame
    assert text_stype in tf.feats
    assert tf.feats[text_stype].shape[1] == 2  # reviewText + summary
    assert tf.y is not None


@pytest.mark.slow
def test_downstream_frozen_and_finetune_learn(reviews_csv):
    cfg = Config(model="fttransformer", data=reviews_csv, batch_size=64,
                 epochs=3, n_hidden=32, n_gnn_layers=1, lr=2e-3,
                 dropout=0.1, testing=True)
    for finetune, st in ((False, Stype.text_embedded),
                         (True, Stype.text_tokenized)):
        ds = AmazonFashionDataset(root=reviews_csv, text_stype=st,
                                  khop_neighbors=(4, 4), edge_capacity=256,
                                  node_capacity=256)
        tr = TextTabularRegressionTrainer(cfg, ds, finetune_text=finetune)
        hist, best = tr.fit()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert best < 2.0  # ratings are 1..5; signal is learnable


@pytest.mark.slow
def test_finetune_llm_cli(reviews_csv, tmp_path):
    from rmm_tpu.cli.finetune_llm import finetune_llm

    hist, _ = finetune_llm(reviews_csv, epochs=2, batch_size=64, hidden=32,
                           num_layers=1, max_length=16)
    assert hist[-1]["eval_mse"] < hist[0]["eval_mse"] * 1.5
    assert np.isfinite(hist[-1]["train_mse"])


# ---------------------------------------------------------------------------
# pretrained (cached) HF LM path — tiny locally-constructed checkpoint
# ---------------------------------------------------------------------------

# COMMITTED real-format HF checkpoint (flax msgpack + config + tokenizer,
# written by `python tools/make_tiny_lm.py`): load_cached_lm and the
# frozen-embedder paths run end-to-end in EVERY environment, no
# construction step, exactly like a cache-resident reference model
# (/root/reference/downstream_model_LLM.py:59-83 loads from the HF cache).
import os as _os

TINY_LM = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "fixtures", "tiny_lm")


@pytest.fixture(scope="module")
def tiny_hf_checkpoint():
    pytest.importorskip("transformers")
    assert _os.path.isfile(_os.path.join(TINY_LM, "flax_model.msgpack")), (
        "committed fixture missing — regenerate: python tools/make_tiny_lm.py")
    return TINY_LM


def test_load_cached_lm_committed_checkpoint(tiny_hf_checkpoint):
    """The cache-gated loader consumes the COMMITTED save_pretrained
    artifact: real from_pretrained deserialization (msgpack weights +
    config + tokenizer files), then a forward pass."""
    from rmm_tpu.nn.text import load_cached_lm
    from rmm_tpu.nn.text.pretrained import HFTokenizerWrapper

    lm, tok = load_cached_lm(tiny_hf_checkpoint)
    ids = HFTokenizerWrapper(tok, max_length=12)(
        ["good product", "bad quality", ""])
    assert ids.shape == (3, 12) and ids.dtype == np.int32
    out = lm(input_ids=ids).last_hidden_state
    assert out.shape == (3, 12, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_flax_embedder_mean_and_e5_last_token_pooling(tiny_hf_checkpoint,
                                                      tmp_path):
    """FlaxTextToEmbedding over the committed checkpoint: mean pooling for
    encoder models, and the e5-mistral branch (instruction prefix +
    LAST-token pooling, reference TextToEmbedding.py:27-48,65-70) —
    exercised by pointing the same weights at an e5-named path."""
    import shutil

    from rmm_tpu.nn.text.embedder import FlaxTextToEmbedding

    emb = FlaxTextToEmbedding(tiny_hf_checkpoint, batch_size=4)
    assert not emb.is_e5
    e = emb(["good product", "bad quality", "love", "", "nice"])
    assert e.shape == (5, 16) and np.isfinite(e).all()
    # identical sentences embed identically; different ones differ
    e2 = emb(["good product", "good product"])
    np.testing.assert_allclose(e2[0], e2[1], rtol=1e-6)
    assert np.abs(e[0] - e[1]).max() > 1e-6

    e5_dir = tmp_path / "tiny-e5-mistral"
    shutil.copytree(tiny_hf_checkpoint, e5_dir)
    emb5 = FlaxTextToEmbedding(str(e5_dir), batch_size=4)
    assert emb5.is_e5
    f = emb5(["good product", "bad quality"])
    assert f.shape == (2, 16) and np.isfinite(f).all()
    # last-token pooling + prefix ≠ mean pooling on the same weights
    assert np.abs(f[0] - e[0]).max() > 1e-6


TINY_CAUSAL = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "fixtures",
    "tiny_e5-mistral")


@pytest.fixture(scope="module")
def tiny_causal_checkpoint():
    pytest.importorskip("transformers")
    assert _os.path.isfile(
        _os.path.join(TINY_CAUSAL, "flax_model.msgpack")), (
        "committed fixture missing — regenerate: "
        "python tools/make_tiny_causal_lm.py")
    return TINY_CAUSAL


def test_e5_causal_lm_last_token_pooling_both_backends(
        tiny_causal_checkpoint):
    """The e5-mistral branch against a REAL CAUSAL decoder checkpoint
    (committed GPT2, byte-level tokenizer with no native pad token —
    the architecture class the reference's e5-mistral-7b belongs to,
    TextToEmbedding.py:27-48): instruction prefix + bf16 torch load +
    LAST-token pooling, on BOTH backends, cross-checked against each
    other and a hand-rolled pooling oracle."""
    from rmm_tpu.nn.text.embedder import (
        FlaxTextToEmbedding,
        TextToEmbedding,
    )

    sentences = ["good product", "bad quality!", ""]

    # torch backend: is_e5 → bfloat16 weights, prefix, last-token pooling
    emb_t = TextToEmbedding(tiny_causal_checkpoint, batch_size=2)
    assert emb_t.is_e5
    et = emb_t(sentences)
    assert et.shape == (3, 16) and np.isfinite(et).all()

    # flax backend over the same committed weights
    emb_f = FlaxTextToEmbedding(tiny_causal_checkpoint, batch_size=2)
    assert emb_f.is_e5
    ef = emb_f(sentences)
    assert ef.shape == (3, 16) and np.isfinite(ef).all()

    # same weights, same pooling — torch runs in bf16 (reference
    # semantics), flax in f32, so tolerance is bf16-scale
    np.testing.assert_allclose(et, ef, rtol=0.1, atol=0.05)

    # oracle: last-token pooling == hidden state at the final real token
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tiny_causal_checkpoint)
    lm = AutoModel.from_pretrained(tiny_causal_checkpoint)
    text = TextToEmbedding.E5_PREFIX + sentences[0]
    toks = tok([text, text + " padding padding"], padding=True,
               return_tensors="pt")
    with torch.no_grad():
        hidden = lm(**toks).last_hidden_state
    L = int(toks["attention_mask"][0].sum()) - 1
    np.testing.assert_allclose(
        et[0], hidden[0, L].numpy(), rtol=0.1, atol=0.05)
    # causal tokenizer gotcha is real: pad token came from eos, not native
    assert tok.pad_token == tok.eos_token


def test_pretrained_lm_cache_gated_error():
    from rmm_tpu.nn.text import load_cached_lm

    import os
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    with pytest.raises(RuntimeError, match="local HF cache"):
        load_cached_lm("definitely/not-a-cached-model")


@pytest.mark.slow
def test_pretrained_lm_lora_finetune_path(tiny_hf_checkpoint):
    """TRUE in-LM LoRA: A/B factors injected into the LM's attention
    query/value kernels (peft target modules,
    ``downstream_model_LLM.py:59-83``); grads flow through the LM backward
    into the factors; base weights are constants, not params."""
    from rmm_tpu.nn.text import pretrained_text_model

    module, tokenizer, hidden = pretrained_text_model(
        tiny_hf_checkpoint, lora_rank=4, max_length=16)
    assert hidden == 16
    ids = tokenizer(["a good product", "bad quality", ""])
    assert ids.shape == (3, 16)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    # the trainable tree contains ONLY adapter params (base is frozen
    # constants, not parameters) ...
    names = jax.tree_util.tree_leaves_with_path(params["params"])
    keys = {"/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in names}
    assert all("lora" in k or "proj" in k for k in keys), keys
    # ... and the LoRA factors target LM-INTERNAL q/v kernels
    assert any("query" in k and k.endswith("_a") for k in keys), keys
    assert any("value" in k and k.endswith("_b") for k in keys), keys

    @jax.jit
    def loss(p, ids):
        return (module.apply(p, ids) ** 2).sum()

    g = jax.grad(loss)(params, jnp.asarray(ids))
    leaves = jax.tree_util.tree_leaves_with_path(g["params"])
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in leaves}
    assert all(np.isfinite(v).all() for v in flat.values())
    # LoRA calculus at init (B=0): the B factors of the in-LM kernels get
    # NONZERO grads (dB = Aᵀ·dW ≠ 0) — proof that gradients enter the LM
    for k, v in flat.items():
        if ("query" in k or "value" in k) and k.endswith("_b"):
            assert float(np.abs(v).sum()) > 0, k


@pytest.mark.slow
def test_downstream_trainer_with_pretrained_lm(tiny_hf_checkpoint,
                                               tmp_path):
    """End-to-end: AmazonFashion text_tokenized with the HF tokenizer +
    frozen-LM-LoRA module inside the tabular forward pass."""
    from rmm_tpu.nn.text import pretrained_text_model

    module, tokenizer, hidden = pretrained_text_model(
        tiny_hf_checkpoint, lora_rank=2, max_length=12)
    csv = str(tmp_path / "reviews.csv")
    synthetic_amazon_fashion(csv, num_rows=96, seed=0)
    ds = AmazonFashionDataset(root=csv, text_stype=Stype.text_tokenized,
                              tokenizer=tokenizer, channels=8)
    cfg = Config(model="fttransformer", data=csv, batch_size=32, epochs=1,
                 n_hidden=8, n_gnn_layers=1, lr=1e-3, testing=True)
    tr = TextTabularRegressionTrainer(cfg, ds, finetune_text=True,
                                      text_module=module,
                                      text_model_dim=hidden)
    hist, best = tr.fit()
    assert np.isfinite(hist[-1]["loss"])
    assert np.isfinite(best)
