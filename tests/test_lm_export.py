"""Two-stage text workflow: stage-1 LoRA finetune → merged-LM export →
stage-2 reload. The reference's separate/two_step slurm workflows
(``finetune_LLM.py`` saves the adapted LM; ``downstream_model_LLM.py``
loads it) require exactly this chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("tiny_bert_exp")
    cfg = transformers.BertConfig(
        vocab_size=32, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=24,
        max_position_embeddings=64)
    model = transformers.FlaxBertModel(cfg, seed=0)
    model.save_pretrained(str(d))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "a",
             "good", "bad", "great", "product", "quality", "love", "hate"]
    vpath = d / "vocab.txt"
    vpath.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vpath),
                                         do_lower_case=True)
    tok.save_pretrained(str(d))
    return str(d)


def test_lora_merge_export_reload_equivalence(tiny_hf_checkpoint, tmp_path):
    """Adapted module (base + LoRA factors) and the exported merged LM
    (reloaded with lora_rank=0) produce identical pooled embeddings."""
    from rmm_tpu.nn.text import pretrained_text_model
    from rmm_tpu.nn.text.pretrained import export_finetuned_lm

    module, tokenizer, hidden = pretrained_text_model(
        tiny_hf_checkpoint, lora_rank=4, max_length=12)
    ids = jnp.asarray(tokenizer(["a good product", "bad quality", ""]))
    params = module.init(jax.random.PRNGKey(0), ids)
    # make the adapters non-trivial (B init is zeros → merge would be a
    # no-op); nudge every LoRA factor off its init
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.ones_like(x), params)
    adapted = np.asarray(module.apply(params, ids))

    out_dir = str(tmp_path / "lm_export")
    export_finetuned_lm(module, params, tokenizer, out_dir)

    module2, tokenizer2, hidden2 = pretrained_text_model(
        out_dir, lora_rank=0, max_length=12)
    assert hidden2 == hidden
    ids2 = jnp.asarray(tokenizer2(["a good product", "bad quality", ""]))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))
    params2 = module2.init(jax.random.PRNGKey(0), ids2)
    merged = np.asarray(module2.apply(params2, ids2))
    np.testing.assert_allclose(merged, adapted, atol=1e-5, rtol=1e-5)


def test_frozen_embedder_loads_flax_only_export(tiny_hf_checkpoint,
                                                tmp_path):
    """get_text_embedder must consume a flax-only checkpoint dir (what
    stage-1 exports): torch's from_flax conversion is broken in this
    torch/transformers combination (meta tensors), so the flax twin
    embedder takes over."""
    from rmm_tpu.nn.text import pretrained_text_model
    from rmm_tpu.nn.text.embedder import get_text_embedder
    from rmm_tpu.nn.text.pretrained import export_finetuned_lm

    module, tokenizer, _ = pretrained_text_model(
        tiny_hf_checkpoint, lora_rank=2, max_length=12)
    ids = jnp.asarray(tokenizer(["a good product"]))
    params = module.init(jax.random.PRNGKey(0), ids)
    out_dir = str(tmp_path / "flax_only")
    export_finetuned_lm(module, params, tokenizer, out_dir)

    emb = get_text_embedder(out_dir, batch_size=4)
    vecs = emb(["a good product", "bad quality", ""])
    assert vecs.shape == (3, 16)
    assert np.isfinite(vecs).all()
    # deterministic across calls
    np.testing.assert_allclose(emb(["a good product"])[0], vecs[0],
                               atol=1e-6)


def test_finetune_llm_cli_save_model(tiny_hf_checkpoint, tmp_path):
    """CLI chain: --save_model exports a dir that reloads as a text model
    (stage 2's --text_model input)."""
    import pandas as pd

    from rmm_tpu.cli.finetune_llm import finetune_llm
    from rmm_tpu.nn.text import pretrained_text_model

    csv = tmp_path / "reviews.csv"
    rng = np.random.RandomState(0)
    pd.DataFrame({
        "reviewText": rng.choice(
            ["a good product", "bad quality", "great", "poor"], size=40),
        "overall": rng.randint(1, 6, size=40).astype(float),
    }).to_csv(csv, index=False)

    out_dir = str(tmp_path / "export")
    history, _ = finetune_llm(
        str(csv), epochs=1, batch_size=8, max_length=12, lora_rank=2,
        text_model=tiny_hf_checkpoint, save_model=out_dir)
    assert np.isfinite(history[-1]["eval_mse"])
    module, tokenizer, hidden = pretrained_text_model(
        out_dir, lora_rank=0, max_length=12)
    ids = jnp.asarray(tokenizer(["a good product"]))
    out = module.apply(module.init(jax.random.PRNGKey(0), ids), ids)
    assert np.isfinite(np.asarray(out)).all()
