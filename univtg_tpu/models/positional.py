"""Positional encodings.

* `sine_position_from_mask`: 1-D sinusoidal encoding over the cumulative sum
  of the validity mask, normalized to 2*pi -- the video position signal
  (reference: model/position_encoding.py:44-83, normalize=True path).
* `TrainableTextPos`: learned position table + LN + dropout for text
  (reference: model/position_encoding.py:19-41; only active with
  use_txt_pos, off in all released configs).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from univtg_tpu.models.layers import LN_EPS


def sine_position_from_mask(mask, num_feats: int, temperature: float = 10000.0,
                            scale: float = 2 * math.pi, dtype=jnp.float32):
    """(B, L) validity mask -> (B, L, num_feats) sinusoidal embedding.

    Position of a clip = cumsum of mask (1-indexed over valid positions),
    normalized by the total valid length. Padded positions still receive an
    embedding (of the saturated position); attention masking makes them
    irrelevant, matching the reference exactly.
    """
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    eps = 1e-6
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    # temperature ** (2 * (i // 2) / num_feats); the reference casts the
    # floor-div through int (position_encoding.py:78)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_feats)
    pos = x_embed[:, :, None] / dim_t  # (B, L, num_feats)
    # interleave sin on even dims, cos on odd dims
    pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
    pos = pos.reshape(pos.shape[0], pos.shape[1], -1)
    return pos.astype(dtype)


class TrainableTextPos(nn.Module):
    max_positions: int
    hidden_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.max_positions, self.hidden_dim),
        )
        L = x.shape[1]
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(
            x + table[None, :L]
        )
        return nn.Dropout(self.dropout, deterministic=not train)(out)
