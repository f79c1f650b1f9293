"""Normalization layers: masked BatchNorm for padded node/edge sets.

The reference uses ``torch_geometric.nn.BatchNorm`` over the sampled
subgraph's node set (``src/nn/gnn/pna.py:144``, ``tabgnn.py:171``). Under
static-shape padding the batch statistics must ignore pad rows — this module
computes masked batch stats and keeps running averages in the linen
``batch_stats`` collection (train/eval parity with torch BatchNorm:
``momentum=0.1``, ``eps=1e-5``; SURVEY §7 hard part 4).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.9       # running = momentum*running + (1-m)*batch
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # batch statistics always in f32: mean/var of bf16 activations in
        # bf16 is too lossy under --precision bf16, and the running stats
        # live in f32 (output is cast back to x.dtype at the end)
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        if train:
            if mask is not None:
                m = mask.astype(x.dtype)[:, None]
                n = jnp.maximum(m.sum(), 1.0)
                mean = (x * m).sum(0) / n
                var = ((x - mean) ** 2 * m).sum(0) / n
            else:
                n = jnp.asarray(x.shape[0], x.dtype)
                mean = x.mean(0)
                var = x.var(0)
            if not self.is_initializing():
                # torch BatchNorm tracks the UNBIASED variance in its
                # running stats (normalization itself uses the biased one)
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(in_dtype)
