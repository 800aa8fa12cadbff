"""Fused flash-attention Pallas kernel for TPU.

Online-softmax attention over (B, L, D) inputs with key-padding masking:
one kernel instance per (batch, head, q-block) streams k/v blocks through
VMEM, keeping running max/denominator so the full (Lq, Lk) score matrix is
never materialized in HBM. This lifts the grounding stack's attention from
HBM-bound to compute-bound for long-video pretraining (thousands of clips),
and is the building block for the CLIP towers' 197-token sequences.

Off-TPU callers fall back to the XLA einsum path automatically
(univtg_tpu/ops/attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    """Grid: (B*H, num_q_blocks). Blocks: q (1, block_q, dh) in VMEM,
    k/v (1, Lk, dh) in VMEM, mask (1, Lk)."""
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, dh)
    Lk = k_ref.shape[1]
    block_q = q.shape[0]

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)

    num_kb = Lk // block_k

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        kmask = mask_ref[0, 0, pl.ds(kb * block_k, block_k)]  # (block_k,)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        s = s + (1.0 - kmask.astype(jnp.float32))[None, :] * NEG_INF

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "block_k"))
def flash_attention(q, k, v, key_padding_mask, *, num_heads: int,
                    block_q: int = 128, block_k: int = 128):
    """Fused SDPA. q/k/v: (B, L, D) post-projection; mask: (B, Lk) 1=valid.

    Returns (B, Lq, D). Sequences are padded to block multiples internally;
    padded keys are masked, padded queries are sliced off.
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    H = num_heads
    dh = D // H
    sm_scale = dh**-0.5

    if key_padding_mask is None:
        key_padding_mask = jnp.ones((B, Lk), q.dtype)

    pad_q = (-Lq) % block_q
    pad_k = (-Lk) % block_k
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    maskp = jnp.pad(key_padding_mask, ((0, 0), (0, pad_k)))
    Lqp, Lkp = Lq + pad_q, Lk + pad_k

    # (B, L, H, dh) -> (B*H, L, dh)
    def split_heads(x, L):
        return (
            x.reshape(B, L, H, dh).transpose(0, 2, 1, 3).reshape(B * H, L, dh)
        )

    qh = split_heads(qp, Lqp)
    kh = split_heads(kp, Lkp)
    vh = split_heads(vp, Lkp)
    maskh = jnp.repeat(maskp, H, axis=0)[:, None, :]  # (B*H, 1, Lkp)

    grid = (B * H, Lqp // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lkp), lambda bh, qb: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_q, dh), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, Lkp, dh), lambda bh, qb: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, dh), lambda bh, qb: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Lqp, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lqp * Lkp * dh,
            bytes_accessed=(qh.size + kh.size + vh.size) * qh.dtype.itemsize,
            transcendentals=B * H * Lqp * Lkp,
        ),
    )(maskh, qh, kh, vh)

    out = out.reshape(B, H, Lqp, dh).transpose(0, 2, 1, 3).reshape(B, Lqp, D)
    return out[:, :Lq]
