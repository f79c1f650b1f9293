"""Finetunable text encoder.

Rebuilds ``src/nn/encoder/TextToEmbeddingFinetune.py``: an LM consumed as a
trainable module inside the tabular forward pass (tokenized columns →
pooled states), with optional LoRA adapters. With no downloadable HF
weights in this environment, the encoder is a compact flax transformer LM
trained from scratch or LoRA-adapted; its surface (``__call__`` on token
ids → pooled [B, H]; ``tokenize``) matches the reference's.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...utils.pooling import mean_pooling
from ..transformer import TransformerEncoderLayer
from .lora import LoRADense

PAD_ID = 0


class HashingTokenizer:
    """Deterministic hashing tokenizer (whitespace split → bucket ids);
    stands in for the HF tokenizer (no downloads needed)."""

    def __init__(self, vocab_size: int = 8192, max_length: int = 64):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def __call__(self, sentences: Sequence[str]) -> np.ndarray:
        import hashlib

        out = np.full((len(sentences), self.max_length), PAD_ID,
                      dtype=np.int32)
        for i, s in enumerate(sentences):
            words = (s or "").lower().split()[: self.max_length]
            for j, w in enumerate(words):
                h = hashlib.blake2b(w.encode(), digest_size=4).digest()
                # ids 1..vocab_size-1; 0 reserved for padding
                out[i, j] = 1 + int.from_bytes(h, "little") % (
                    self.vocab_size - 1)
        return out


class TextToEmbeddingFinetune(nn.Module):
    """Trainable text encoder: token embeddings + positional embeddings →
    N transformer layers (LoRA on the output projection when
    ``lora_rank > 0``) → attention-masked mean pooling
    (``TextToEmbeddingFinetune.py:37-50``)."""

    hidden: int = 128
    num_layers: int = 2
    nhead: int = 4
    vocab_size: int = 8192
    max_length: int = 64
    dropout: float = 0.1
    lora_rank: int = 0
    freeze_base: bool = False

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        mask = (token_ids != PAD_ID).astype(jnp.float32)
        tok = nn.Embed(self.vocab_size, self.hidden, name="tok_emb")(
            jnp.clip(token_ids, 0, self.vocab_size - 1))
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_length, self.hidden))
        x = tok + pos[None, : token_ids.shape[1]]
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.hidden, self.nhead, dropout=self.dropout,
                name=f"layer_{i}")(x, deterministic)
        if self.lora_rank > 0:
            x = LoRADense(self.hidden, rank=self.lora_rank,
                          freeze_base=self.freeze_base, name="lora_out")(x)
        return mean_pooling(x, mask)[:, 0]  # [B, H]

    @staticmethod
    def tokenize(sentences: Sequence[str], vocab_size: int = 8192,
                 max_length: int = 64) -> np.ndarray:
        return HashingTokenizer(vocab_size, max_length)(sentences)
