"""Generate the committed tiny CAUSAL (GPT-style) LM fixture.

The e5-mistral frozen-embedder path (``rmm_tpu/nn/text/embedder.py`` —
instruction prefix + bf16 + LAST-token pooling, rebuilding
``/root/reference/src/nn/encoder/TextToEmbedding.py:27-48,65-70``) targets
a causal decoder, not a BERT-style encoder.  The existing ``tiny_lm``
fixture is a BertModel, so the causal branch (GPT-like tokenizer with no
native pad token, decoder ``last_hidden_state`` semantics, torch bf16
load) needs its own artifact.  Zero egress ⇒ a REAL ``save_pretrained``
checkpoint is committed at ``tests/fixtures/tiny_e5-mistral/`` (the
directory name contains "e5-mistral" so ``is_e5`` dispatch triggers on
the committed path itself).

Both weight formats are written (flax msgpack from seed 0, torch
safetensors converted from it) so ``TextToEmbedding`` (torch backend) and
``FlaxTextToEmbedding`` load the SAME weights and can be cross-checked.

Deterministic: seed 0, fixed config.  Regenerate with
``python tools/make_tiny_causal_lm.py``.
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
    os.path.abspath(__file__))), "tests", "fixtures", "tiny_e5-mistral")


def main():
    import json

    import transformers
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    os.makedirs(FIXTURE, exist_ok=True)

    # --- byte-level tokenizer: all 256 byte symbols + eos, empty merges
    # (tokenizes character-by-character; no unk possible on any input) ---
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    vocab["<|endoftext|>"] = len(vocab)
    vpath = os.path.join(FIXTURE, "vocab.json")
    mpath = os.path.join(FIXTURE, "merges.txt")
    with open(vpath, "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(mpath, "w") as f:
        f.write("#version: 0.2\n")
    tok = transformers.GPT2Tokenizer(vpath, mpath, model_max_length=512)
    tok.pad_token = tok.eos_token  # GPT has no pad token (the real-model
    # gotcha the BERT fixture can never exercise)
    tok.save_pretrained(FIXTURE)

    cfg = transformers.GPT2Config(
        vocab_size=len(vocab), n_positions=512, n_embd=16, n_layer=1,
        n_head=2, n_inner=24, bos_token_id=vocab["<|endoftext|>"],
        eos_token_id=vocab["<|endoftext|>"])
    flax_model = transformers.FlaxGPT2Model(cfg, seed=0)
    flax_model.save_pretrained(FIXTURE)
    # torch twin converted FROM the flax weights (identical parameters).
    # from_pretrained(from_flax=True) leaves meta tensors in this
    # transformers/torch combination (see embedder.py flax-fallback note),
    # so convert onto an explicitly-materialized torch model instead.
    from transformers.modeling_flax_pytorch_utils import (
        load_flax_weights_in_pytorch_model,
    )

    torch_model = transformers.GPT2Model(cfg)
    load_flax_weights_in_pytorch_model(torch_model, flax_model.params)
    torch_model.save_pretrained(FIXTURE, safe_serialization=True)

    total = sum(
        os.path.getsize(os.path.join(FIXTURE, f))
        for f in os.listdir(FIXTURE))
    print(f"wrote {FIXTURE} ({total / 1024:.1f} KB)")


if __name__ == "__main__":
    main()
