"""RCTransformer: alternating row- and column-attention over a token grid.

The reference's ``src/nn/models/rowcol_transformer.py`` is vestigial and
broken (iterates an int at ``:61``, ``self.backbone`` never assigned —
SURVEY §2 item 10). This is the working realization of its intent: each
layer attends across the column axis (within a row) then across the row
axis (same column across the batch), with half-residual merges.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..transformer import CLSToken, TransformerEncoderLayer


class RCTransformer(nn.Module):
    channels: int
    num_layers: int
    nhead: int = 8
    dropout: float = 0.2
    feedforward_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """x: [B, num_cols, C] → (x [B, num_cols, C], x_cls [B, C])."""
        x = CLSToken(self.channels, name="cls_token")(x)
        for i in range(self.num_layers):
            col = TransformerEncoderLayer(
                self.channels, self.nhead, self.feedforward_channels,
                self.dropout, name=f"col_att_{i}")(x, deterministic)
            x = (x + nn.LayerNorm(name=f"col_norm_{i}")(col)) / 2.0
            # row attention: transpose so "sequence" = batch rows per column
            xt = x.transpose(1, 0, 2)
            row = TransformerEncoderLayer(
                self.channels, self.nhead, self.feedforward_channels,
                self.dropout, name=f"row_att_{i}")(xt, deterministic)
            x = (x + nn.LayerNorm(name=f"row_norm_{i}")(
                row.transpose(1, 0, 2))) / 2.0
        return x[:, 1:], x[:, 0]
