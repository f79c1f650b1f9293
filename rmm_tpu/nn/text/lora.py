"""LoRA adapters (the reference's peft usage,
``TextToEmbeddingFinetune.py:20-35``, ``finetune_LLM.py:29-90``)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LoRADense(nn.Module):
    """Dense layer with a trainable low-rank update: y = xW + (α/r)·x A B.

    With ``freeze_base=True`` the base kernel gets zero gradient via
    ``stop_gradient`` (the peft pattern: base weights frozen, adapters
    trainable).
    """

    features: int
    rank: int = 8
    alpha: float = 16.0
    freeze_base: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_f, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.freeze_base:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b)
        y = x @ w + b
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02),
                           (in_f, self.rank))
            bb = self.param("lora_b", nn.initializers.zeros,
                            (self.rank, self.features))
            y = y + (self.alpha / self.rank) * ((x @ a) @ bb)
        return y
