"""Pallas fused int8-weight dequant-matmul for serving.

x_bf16 (M, K) @ W_int8 (K, N) * scale (1, N) -> (M, N): the weight stays
int8 in HBM and is dequantized tile-by-tile in VMEM, halving (vs bf16) or
quartering (vs f32) weight bandwidth -- the dominant traffic for
bandwidth-bound serving of wide projection layers (e.g. the 2818->1024
input projection).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32) * scale_ref[...].astype(jnp.float32)
    o_ref[...] = jax.lax.dot(
        x, w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int8_matmul(x, w_q, scale, *, block_m: int = 256, block_n: int = 256):
    """x (M, K) @ dequant(w_q (K, N), scale (1, N)) -> (M, N) in x.dtype.

    K is kept whole per tile (projection layers have K <= ~4k); M and N are
    gridded. Shapes are padded to block multiples internally.
    """
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and scale.shape[-1] == N

    pad_m = (-M) % block_m
    pad_n = (-N) % block_n
    pad_k = (-K) % 128
    xp = jnp.pad(x, ((0, pad_m), (0, pad_k)))
    wp = jnp.pad(w_q, ((0, pad_k), (0, pad_n)))
    sp = jnp.pad(scale.reshape(1, N), ((0, 0), (0, pad_n)))
    Mp, Kp, Np = M + pad_m, K + pad_k, N + pad_n

    out = pl.pallas_call(
        _kernel,
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=xp.size * xp.dtype.itemsize + wp.size + Mp * Np * 2,
            transcendentals=0,
        ),
    )(xp, wp, sp)
    return out[:M, :N]
