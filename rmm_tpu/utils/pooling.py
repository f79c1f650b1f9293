"""Sequence pooling utils (``src/utils/pooling.py``) in JAX."""
from __future__ import annotations

import jax.numpy as jnp


def mean_pooling(last_hidden_state: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Attention-mask-weighted mean over tokens → [B, 1, H]
    (``pooling.py:5-11``)."""
    m = attention_mask[..., None].astype(last_hidden_state.dtype)
    summed = jnp.sum(last_hidden_state * m, axis=1)
    denom = jnp.clip(m.sum(axis=1), 1e-9, None)
    return (summed / denom)[:, None, :]


def last_pooling(last_hidden_state: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
    """State of the last attended token → [B, H] (``pooling.py:13-21``)."""
    lengths = attention_mask.sum(axis=1).astype(jnp.int32) - 1
    b = jnp.arange(last_hidden_state.shape[0])
    return last_hidden_state[b, lengths]
