"""Unified cross-modal transformer encoder.

Post-norm encoder layers with:
  * positional embeddings added to Q and K only,
  * stochastic depth (DropPath) on both residual branches instead of
    residual dropout,
  * gelu FFN without inner dropout.

Behavioral reference: model/transformer_encoder_droppath.py:88-135 (layer),
:154-183 (drop_path). This implementation is batch-first throughout (the
reference permutes to (L, B, D) for torch MHA; unnecessary under XLA).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from univtg_tpu.models.layers import LN_EPS
from univtg_tpu.ops.attention import multihead_attention


def drop_path(x, rate: float, rng):
    """Per-sample stochastic depth: zero the whole residual branch for a
    random subset of examples, rescale the rest by 1/keep_prob."""
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep_prob * mask


class EncoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float
    droppath: float
    pre_norm: bool = False
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask, pos, *, train: bool):
        in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (self.dim, 3 * self.dim)
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.dim,))
        out_kernel = self.param(
            "out_kernel", nn.initializers.xavier_uniform(), (self.dim, self.dim)
        )
        out_bias = self.param("out_bias", nn.initializers.zeros, (self.dim,))

        def attn_block(h):
            qk = h if pos is None else h + pos
            rng = None
            if train and self.dropout > 0:
                rng = self.make_rng("dropout")
            return multihead_attention(
                qk,
                qk,
                h,
                in_proj_kernel=in_proj_kernel.astype(self.dtype),
                in_proj_bias=in_proj_bias.astype(self.dtype),
                out_kernel=out_kernel.astype(self.dtype),
                out_bias=out_bias.astype(self.dtype),
                num_heads=self.num_heads,
                key_padding_mask=key_padding_mask,
                impl=self.attention_impl,
                dropout_rate=self.dropout if train else 0.0,
                dropout_rng=rng,
            )

        def ffn_block(h):
            h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)

        def residual(h, branch_out):
            if train and self.droppath > 0:
                branch_out = drop_path(branch_out, self.droppath, self.make_rng("droppath"))
            return h + branch_out

        norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")

        if self.pre_norm:
            x = residual(x, attn_block(norm1(x)))
            x = residual(x, ffn_block(norm2(x)))
        else:
            x = norm1(residual(x, attn_block(x)))
            x = norm2(residual(x, ffn_block(x)))
        return x


class Encoder(nn.Module):
    """N-layer encoder over the concatenated [video; text] token sequence."""

    dim: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout: float
    droppath: float
    pre_norm: bool = False
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    seq_shard: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, key_padding_mask, pos, *, train: bool):
        if self.seq_shard:
            from univtg_tpu.parallel.mesh import seq_constraint

        for i in range(self.num_layers):
            layer = EncoderLayer(
                self.dim,
                self.num_heads,
                self.ffn_dim,
                self.dropout,
                self.droppath,
                self.pre_norm,
                self.attention_impl,
                self.dtype,
                name=f"layers_{i}",
            )
            if self.remat:
                # jax.checkpoint per layer: activations recomputed in the
                # backward pass (train captured statically in the closure)
                x = nn.remat(
                    lambda mdl, h, kpm, p: mdl(h, kpm, p, train=train)
                )(layer, x, key_padding_mask, pos)
            else:
                x = layer(x, key_padding_mask, pos, train=train)
            if self.seq_shard:
                x = seq_constraint(x)
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="final_norm")(x)
        return x
