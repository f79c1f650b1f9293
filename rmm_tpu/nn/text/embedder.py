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
            self.model = AutoModel.from_pretrained(model, **kwargs)
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


def get_text_embedder(model: str = "hashing", dim: int = 256, **kw):
    if model == "hashing":
        return HashingTextEmbedder(dim=dim, **kw)
    return TextToEmbedding(model, **kw)
