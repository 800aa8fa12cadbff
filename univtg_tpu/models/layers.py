"""Shared building blocks: projection stacks, conv heads, pooling.

Weight layouts are chosen for drop-in interop with released PyTorch
checkpoints (see univtg_tpu/interop/torch_ckpt.py): dense kernels are
(in, out) -- the transpose of torch Linear -- and conv kernels are
(k, in, out) -- the (2,1,0) transpose of torch Conv1d.

Behavioral contracts cite model/univtg.py in the reference.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

LN_EPS = 1e-5  # torch nn.LayerNorm default; flax defaults to 1e-6


def mask_log(mask, eps=1e-45):
    """Additive log-mask used throughout the saliency paths
    (model/univtg.py:147, :271): log(mask + eps), valid->~0, invalid->-103.28.

    XLA flushes the subnormal eps to zero (log(0+eps) -> -inf), so the
    masked-out branch is materialized as the exact torch constant
    log(float32(1e-45)) instead.
    """
    import numpy as _np

    neg = float(_np.log(_np.float32(eps)))
    return jnp.where(mask > 0, jnp.log(jnp.maximum(mask, eps)), neg)


class ProjLayer(nn.Module):
    """LayerNorm -> dropout -> dense [-> relu] (model/univtg.py:384-406)."""

    out_dim: int
    use_relu: bool
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="dense")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class InputProj(nn.Module):
    """n-layer input projector; relu on all but the last layer
    (model/univtg.py:89-100: relu_args[n_input_proj-1]=False)."""

    hidden_dim: int
    n_layers: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i in range(self.n_layers):
            x = ProjLayer(
                self.hidden_dim,
                use_relu=(i != self.n_layers - 1),
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, train=train)
        return x


class ConvHead(nn.Module):
    """Stack of 1-D convs (k=3, SAME) with relu between, linear last
    (model/univtg.py:367-382). Input/output are (B, L, C).

    When `mask` is given, activations at padded positions are zeroed after
    every conv so each layer sees exact-length zero-padding semantics
    regardless of the static pad length (conv biases would otherwise turn
    padded positions nonzero and leak through the stacked receptive field).
    """

    hidden_dim: int
    out_dim: int
    num_layers: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        m = None if mask is None else mask[..., None].astype(x.dtype)
        if m is not None:
            x = x * m
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Conv(
                out,
                kernel_size=(self.kernel_size,),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if i != self.num_layers - 1:
                x = nn.relu(x)
            if m is not None:
                x = x * m
        return x


class MLP(nn.Module):
    """Plain relu MLP head (model/univtg.py:353-365; used by moment_detr)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"dense_{i}")(x)
            if i != self.num_layers - 1:
                x = nn.relu(x)
        return x


class WeightedPool(nn.Module):
    """Attention-pool a token sequence to one vector with a learned scoring
    direction (model/univtg.py:36-49)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # (B, L, D) @ (D, 1) -> (B, L, 1) scores, masked softmax over L
        w = self.param("w", nn.initializers.xavier_uniform(), (self.dim, 1))
        alpha = jnp.einsum("bld,do->blo", x.astype(self.dtype), w.astype(self.dtype))
        alpha = alpha + (1.0 - mask[..., None]) * -1e30
        alpha = nn.softmax(alpha, axis=1)
        return jnp.einsum("bld,blo->bod", x, alpha)[:, 0, :]  # (B, D)


def cosine_similarity(a, b, axis=-1, eps=1e-8):
    """torch.nn.functional.cosine_similarity semantics: each norm clamped to
    at least eps before the division (model/univtg.py:147)."""
    an = jnp.maximum(jnp.linalg.norm(a, axis=axis, keepdims=True), eps)
    bn = jnp.maximum(jnp.linalg.norm(b, axis=axis, keepdims=True), eps)
    return jnp.sum((a / an) * (b / bn), axis=axis)


def sim_matrix(a, b, eps=1e-8):
    """Row-normalized similarity matrix (model/univtg.py:26-34)."""
    an = jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), eps)
    bn = jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), eps)
    return (a / an) @ (b / bn).T
