"""Pretrained (locally cached) HF language model as the finetunable text
backend.

The reference finetunes an actual HF LM inside the tabular forward pass:
LoRA via peft wrapped in ``LinearModelEncoder``
(``downstream_model_LLM.py:59-83``, ``ModelConfig(text_encoder, 768)`` at
``:302-331``). This environment has zero network egress, so the path is
CACHE-GATED: :func:`load_cached_lm` loads a flax LM from the local HF cache
(or a filesystem path) and raises a clear error otherwise — the moment
weights are present, the capability exists; tests exercise it with a tiny
locally-constructed checkpoint.

TPU-first design: the base LM runs under the same jit as the tabular model
(flax weights, bf16-able), FROZEN via ``stop_gradient`` on its hidden
states; the trainable part is a LoRA-style low-rank adapter over those
hidden states + the mean-pooling projection (the "frozen base + trainable
adapter" compromise — grads never backprop through the LM, so the backward
pass costs nothing extra).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.pooling import mean_pooling


class _Static:
    """Identity-hashed wrapper so arbitrary objects (HF model, param trees)
    can ride as static flax-module fields without breaking jit caching."""

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def load_cached_lm(model_name_or_path: str):
    """(flax_lm, tokenizer) from the LOCAL HF cache or a filesystem path.

    Raises RuntimeError with a clear message when the weights are not
    cached (this environment cannot download them)."""
    try:
        from transformers import AutoTokenizer, FlaxAutoModel
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers unavailable") from e
    try:
        tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        lm = FlaxAutoModel.from_pretrained(model_name_or_path)
    except (OSError, EnvironmentError, ValueError) as e:
        raise RuntimeError(
            f"model '{model_name_or_path}' is not in the local HF cache and "
            "this environment has no network egress; pre-populate the cache "
            "or fall back to the from-scratch flax TextToEmbeddingFinetune"
        ) from e
    return lm, tokenizer


class HFTokenizerWrapper:
    """sentences → fixed-length [B, L] token ids (the dataset
    materialization contract shared with HashingTokenizer)."""

    def __init__(self, tokenizer, max_length: int = 64):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.pad_id = int(tokenizer.pad_token_id or 0)

    def __call__(self, sentences: Sequence[str]) -> np.ndarray:
        toks = self.tokenizer(
            [s or "" for s in sentences], padding="max_length",
            truncation=True, max_length=self.max_length, return_tensors="np")
        return toks["input_ids"].astype(np.int32)


class PretrainedTextEncoder(nn.Module):
    """Frozen cached HF flax LM + trainable LoRA adapter over hidden states.

    ``__call__(token_ids [B, L]) → pooled [B, out_dim or lm_hidden]`` — the
    ``text_model`` contract of ``LinearModelEncoder``
    (:mod:`rmm_tpu.nn.encoders`)."""

    lm: Any              # _Static(FlaxAutoModel)
    frozen_params: Any   # _Static(param tree)
    pad_id: int = 0
    lora_rank: int = 8
    lora_alpha: float = 16.0
    out_dim: int = 0     # 0 → the LM's hidden size

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        ids = token_ids.astype(jnp.int32)
        mask = (ids != self.pad_id).astype(jnp.float32)
        out = self.lm.value(
            input_ids=ids, attention_mask=mask,
            params=self.frozen_params.value, train=False)
        hidden = jax.lax.stop_gradient(out.last_hidden_state)  # [B, L, H]
        h = hidden.shape[-1]
        if self.lora_rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02),
                           (h, self.lora_rank))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.lora_rank, h))
            hidden = hidden + (self.lora_alpha / self.lora_rank) * (
                (hidden @ a) @ b)
        pooled = mean_pooling(hidden, mask)[:, 0]  # [B, H]
        if self.out_dim and self.out_dim != h:
            pooled = nn.Dense(self.out_dim, name="proj")(pooled)
        return pooled


def pretrained_text_model(model_name_or_path: str, lora_rank: int = 8,
                          out_dim: int = 0, max_length: int = 64):
    """One-call factory: (PretrainedTextEncoder module, tokenizer wrapper,
    lm hidden size). Cache-gated — raises RuntimeError when not cached."""
    lm, tokenizer = load_cached_lm(model_name_or_path)
    wrapper = HFTokenizerWrapper(tokenizer, max_length=max_length)
    hidden = int(lm.config.hidden_size)
    module = PretrainedTextEncoder(
        lm=_Static(lm), frozen_params=_Static(lm.params),
        pad_id=wrapper.pad_id, lora_rank=lora_rank, out_dim=out_dim)
    return module, wrapper, hidden
