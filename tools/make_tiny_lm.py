"""Generate the committed tiny HF-format LM fixture.

The cached-LM text stack (``rmm_tpu/nn/text/pretrained.py`` — the
finetunable backend the reference builds via peft/HF in
``downstream_model_LLM.py:59-83``) is cache-gated: it loads weights from
the local HF cache or a filesystem path. This environment has zero
network egress, so a REAL ``save_pretrained`` artifact is committed at
``tests/fixtures/tiny_lm/`` (~40 KB) and the tests drive
``load_cached_lm`` / the frozen-embedder paths through it
unconditionally, in every environment.

Deterministic: seed 0, fixed config. Regenerate with
``python tools/make_tiny_lm.py`` (output is byte-stable for a fixed
transformers version).
"""
import os
import sys

# the ambient .pth hook may have imported jax on the axon platform before
# this script runs; force CPU the way tests/conftest.py does
sys.path = [p for p in sys.path if "axon_site" not in p]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "tiny_lm")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "a",
         "good", "bad", "great", "product", "quality", "love", "hate",
         "nice", "poor", "fast", "slow", "cheap", "fine", "##s", "##ly",
         "account", "bank", "wire", "card", "pay", "send", "cash", "usd",
         "eur", "fee"]


def main():
    import transformers

    os.makedirs(FIXTURE, exist_ok=True)
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=24,
        max_position_embeddings=64)
    model = transformers.FlaxBertModel(cfg, seed=0)
    model.save_pretrained(FIXTURE)
    vpath = os.path.join(FIXTURE, "vocab.txt")
    with open(vpath, "w") as f:
        f.write("\n".join(VOCAB))
    tok = transformers.BertTokenizerFast(vocab_file=vpath,
                                         do_lower_case=True,
                                         model_max_length=64)
    tok.save_pretrained(FIXTURE)
    total = sum(
        os.path.getsize(os.path.join(FIXTURE, f))
        for f in os.listdir(FIXTURE))
    print(f"wrote {FIXTURE} ({total / 1024:.1f} KB)")


if __name__ == "__main__":
    main()
