"""FTTransformer: column-attention backbone over encoded column tokens.

Rebuilds ``src/nn/models/ft_transformer.py`` (a thin wrapper over torch-frame
``FTTransformerConvs`` returning ``(x, x_cls)``), with the *intended*
contract the reference never finished wiring (SURVEY §3.3 note): encoder →
backbone → head composed explicitly by the task wrappers.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..transformer import FTTransformerConvs


class FTTransformer(nn.Module):
    channels: int
    num_layers: int
    nhead: int = 8
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """x: [B, num_cols, C] encoded tokens → (x [B, num_cols, C],
        x_cls [B, C])."""
        return FTTransformerConvs(
            self.channels, self.num_layers, self.nhead, self.dropout,
            name="backbone")(x, deterministic)
