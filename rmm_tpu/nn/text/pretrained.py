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
(flax weights, bf16-able) with TRUE in-LM LoRA: low-rank A·B factors are
injected into the attention query/value projection kernels by pytree
surgery (W_eff = W + (α/r)·A·B) before the LM forward, exactly the
reference's peft target modules (``downstream_model_LLM.py:59-83``
LoraConfig on q/v; whole-LM SEQ_CLS ``finetune_LLM.py:29-90``). The base
weights ride as captured constants — they are not flax params, so only
the A/B factors (plus the output projection) train, and gradients flow
through the full LM backward into them. No ``stop_gradient``, no
optimizer masking needed.
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


# attention projection names LoRA targets, across HF flax architectures
# (bert/roberta: query/value; llama/mistral-style: q_proj/v_proj) — the
# reference's LoraConfig target modules (downstream_model_LLM.py:59-83)
LORA_TARGET_KEYS = ("query", "value", "q_proj", "v_proj")


def find_lora_targets(params, target_keys=LORA_TARGET_KEYS):
    """Paths (key tuples) of every 2-D ``kernel`` whose parent module name
    is a LoRA target (attention q/v projections)."""
    out = []

    def walk(tree, path):
        if not isinstance(tree, dict):
            return
        for k, v in tree.items():
            if (k == "kernel" and path and path[-1] in target_keys
                    and getattr(v, "ndim", 0) == 2):
                out.append(path + (k,))
            else:
                walk(v, path + (k,))

    walk(params, ())
    return out


def _tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _tree_set(tree, path, value):
    """Immutable nested-dict update (copy-on-write along the path)."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _tree_set(tree[path[0]], path[1:], value)
    return new


class PretrainedTextEncoder(nn.Module):
    """Cached HF flax LM with in-LM LoRA on the attention q/v kernels.

    The base weights are captured constants (never flax params); the
    trainable params are the per-kernel LoRA A/B factors + the optional
    output projection. Gradients flow through the full LM backward into
    the A/B factors — peft-equivalent semantics.

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
        base = self.frozen_params.value
        lm_params = base
        if self.lora_rank > 0:
            scale = self.lora_alpha / self.lora_rank
            for path in find_lora_targets(base):
                w = jnp.asarray(_tree_get(base, path))
                name = "lora_" + "_".join(path[:-1])
                a = self.param(f"{name}_a", nn.initializers.normal(0.02),
                               (w.shape[0], self.lora_rank))
                b = self.param(f"{name}_b", nn.initializers.zeros,
                               (self.lora_rank, w.shape[1]))
                lm_params = _tree_set(
                    lm_params, path,
                    w + scale * (a.astype(w.dtype) @ b.astype(w.dtype)))
        out = self.lm.value(
            input_ids=ids, attention_mask=mask,
            params=lm_params, train=False)
        hidden = out.last_hidden_state  # [B, L, H] — grads flow to A/B
        if self.lora_rank == 0:
            hidden = jax.lax.stop_gradient(hidden)  # pure frozen inference
        h = hidden.shape[-1]
        pooled = mean_pooling(hidden, mask)[:, 0]  # [B, H]
        if self.out_dim and self.out_dim != h:
            pooled = nn.Dense(self.out_dim, name="proj")(pooled)
        return pooled


def merge_lora_into_base(module: "PretrainedTextEncoder", variables) -> Any:
    """Fold the trained LoRA factors back into the base LM's kernels:
    W_eff = W + (α/r)·A·B for every targeted q/v projection. Returns a
    full LM param tree (numpy leaves) ready for ``save_pretrained``.

    This is the export half of the reference's two-stage workflow
    (``finetune_LLM.py`` trains + saves the adapted LM; stage-2
    ``downstream_model_LLM.py`` loads it) — the merged tree loads through
    ``load_cached_lm(<export dir>)`` with no LoRA machinery required."""
    base = module.frozen_params.value
    p = variables.get("params", variables)
    merged = base
    if module.lora_rank > 0:
        scale = module.lora_alpha / module.lora_rank
        for path in find_lora_targets(base):
            name = "lora_" + "_".join(path[:-1])
            if f"{name}_a" not in p or f"{name}_b" not in p:
                continue
            w = jnp.asarray(_tree_get(base, path))
            a = jnp.asarray(p[f"{name}_a"])
            b = jnp.asarray(p[f"{name}_b"])
            w_eff = w + scale * (a.astype(w.dtype) @ b.astype(w.dtype))
            merged = _tree_set(merged, path, np.asarray(w_eff))
    return jax.tree_util.tree_map(np.asarray, merged)


def export_finetuned_lm(module: "PretrainedTextEncoder", variables,
                        tokenizer_wrapper: "HFTokenizerWrapper",
                        out_dir: str) -> str:
    """Save the LoRA-merged LM + tokenizer as a standard HF checkpoint dir
    consumable by stage-2 CLIs via ``--text_model <out_dir>``."""
    merged = merge_lora_into_base(module, variables)
    module.lm.value.save_pretrained(out_dir, params=merged)
    tokenizer_wrapper.tokenizer.save_pretrained(out_dir)
    return out_dir


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
