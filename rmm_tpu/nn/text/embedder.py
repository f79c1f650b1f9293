"""Frozen text embedders.

Rebuilds ``src/nn/encoder/TextToEmbedding.py``: tokenizer + frozen language
model → pooled sentence embeddings (mean pooling for encoder models,
last-token pooling with an instruction prefix for e5-mistral-7b,
``TextToEmbedding.py:27-48,65-70``). Embeddings are precomputed at dataset
materialization (the ``text_embedded`` path) so training never runs the LM.

Two backends:
  * :class:`TextToEmbedding` — HuggingFace transformers (torch CPU),
    available when the model weights are locally cached (this build
    environment has zero egress, so downloads are gated with a clear error);
  * :class:`HashingTextEmbedder` — deterministic character-n-gram feature
    hashing (pure NumPy), always available; the default for tests and
    fixtures.
"""
from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np


class HashingTextEmbedder:
    """Deterministic n-gram feature-hashing embedder (no model weights).

    Produces L2-normalized ``dim``-d embeddings with locality: shared
    character n-grams → nearby embeddings.
    """

    def __init__(self, dim: int = 256, ngrams: Sequence[int] = (3, 4),
                 seed: int = 0):
        self.dim = dim
        self.ngrams = tuple(ngrams)
        self.seed = seed

    def _bucket(self, token: str) -> tuple[int, float]:
        h = hashlib.blake2b(f"{self.seed}:{token}".encode(),
                            digest_size=8).digest()
        v = int.from_bytes(h, "little")
        return v % self.dim, 1.0 if (v >> 62) & 1 else -1.0

    def __call__(self, sentences: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(sentences), self.dim), dtype=np.float32)
        for i, s in enumerate(sentences):
            s = (s or "").lower()
            for n in self.ngrams:
                for j in range(max(len(s) - n + 1, 0)):
                    b, sign = self._bucket(s[j : j + n])
                    out[i, b] += sign
        norm = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norm, 1e-9)


class TextToEmbedding:
    """HF transformers frozen embedder (reference semantics: mean pooling;
    e5-mistral path uses bf16, an instruction prefix and last-token
    pooling)."""

    E5_PREFIX = ("Instruct: Retrieve relevant knowledge and embeddings.\n"
                 "Query: ")

    def __init__(self, model: str, device: str = "cpu", batch_size: int = 32):
        try:
            import torch
            from transformers import AutoModel, AutoTokenizer
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("transformers/torch unavailable") from e
        self.model_name = model
        self.batch_size = batch_size
        self.is_e5 = "e5-mistral" in model
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(model)
            kwargs = {"torch_dtype": torch.bfloat16} if self.is_e5 else {}
            try:
                self.model = AutoModel.from_pretrained(model, **kwargs)
            except OSError:
                # flax-only checkpoint (e.g. a stage-1 LoRA-merged export
                # from cli.finetune_llm --save_model): convert via
                # from_flax (low_cpu_mem_usage=False — the meta-device
                # fast path breaks the flax→torch conversion)
                self.model = AutoModel.from_pretrained(
                    model, from_flax=True, low_cpu_mem_usage=False,
                    **kwargs)
                if any(p.device.type == "meta"
                       for p in self.model.parameters()):
                    # this transformers/torch combination leaves converted
                    # weights on the meta device — unusable at inference;
                    # signal get_text_embedder to take the flax path
                    raise RuntimeError(
                        "flax→torch conversion produced meta tensors")
        except OSError as e:
            raise RuntimeError(
                f"model '{model}' is not in the local HF cache and this "
                "environment has no network egress; use "
                "HashingTextEmbedder or pre-populate the cache") from e
        self.model.eval()

    def __call__(self, sentences: Sequence[str]) -> np.ndarray:
        import torch

        outs = []
        for i in range(0, len(sentences), self.batch_size):
            chunk = list(sentences[i : i + self.batch_size])
            if self.is_e5:
                chunk = [self.E5_PREFIX + s for s in chunk]
            toks = self.tokenizer(chunk, padding=True, truncation=True,
                                  max_length=512, return_tensors="pt")
            with torch.no_grad():
                hidden = self.model(**toks).last_hidden_state
            mask = toks["attention_mask"]
            if self.is_e5:
                lengths = mask.sum(dim=1) - 1
                emb = hidden[torch.arange(hidden.shape[0]), lengths]
            else:
                m = mask.unsqueeze(-1).float()
                emb = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
            outs.append(emb.float().cpu().numpy())
        return np.concatenate(outs, axis=0)


class FlaxTextToEmbedding:
    """Flax/XLA frozen embedder — the TPU-native twin of
    :class:`TextToEmbedding` (same pooling semantics, jitted forward).
    Primary consumer: stage-1 LoRA-merged LM exports
    (``cli.finetune_llm --save_model``), which are flax checkpoints."""

    def __init__(self, model: str, device: str = "cpu",
                 batch_size: int = 32, max_length: int = 512):
        try:
            from transformers import AutoTokenizer, FlaxAutoModel
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("transformers unavailable") from e
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(model)
            self.model = FlaxAutoModel.from_pretrained(model)
        except (OSError, EnvironmentError, ValueError) as e:
            raise RuntimeError(
                f"model '{model}' is not in the local HF cache and this "
                "environment has no network egress; use "
                "HashingTextEmbedder or pre-populate the cache") from e
        self.model_name = model
        self.batch_size = batch_size
        self.is_e5 = "e5-mistral" in model
        self.max_length = min(
            max_length,
            int(getattr(self.model.config, "max_position_embeddings",
                        max_length)))

        import jax
        import jax.numpy as jnp

        lm, is_e5 = self.model, self.is_e5

        def fwd(ids, mask):
            hidden = lm(input_ids=ids, attention_mask=mask).last_hidden_state
            if is_e5:
                lengths = mask.sum(axis=1).astype(jnp.int32) - 1
                return hidden[jnp.arange(hidden.shape[0]), lengths]
            m = mask[..., None].astype(hidden.dtype)
            return (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)

        self._fwd = jax.jit(fwd)

    def __call__(self, sentences: Sequence[str]) -> np.ndarray:
        outs = []
        for i in range(0, len(sentences), self.batch_size):
            chunk = [s or "" for s in sentences[i : i + self.batch_size]]
            if self.is_e5:
                chunk = [TextToEmbedding.E5_PREFIX + s for s in chunk]
            n = len(chunk)
            if n < self.batch_size:  # static shapes: pad the tail batch
                chunk = chunk + [""] * (self.batch_size - n)
            toks = self.tokenizer(chunk, padding="max_length",
                                  truncation=True,
                                  max_length=self.max_length,
                                  return_tensors="np")
            emb = self._fwd(toks["input_ids"], toks["attention_mask"])
            outs.append(np.asarray(emb, dtype=np.float32)[:n])
        return np.concatenate(outs, axis=0)


def get_text_embedder(model: str = "hashing", dim: int = 256, **kw):
    if model == "hashing":
        return HashingTextEmbedder(dim=dim, **kw)
    try:
        return TextToEmbedding(model, **kw)
    except RuntimeError:
        return FlaxTextToEmbedding(model, **kw)
