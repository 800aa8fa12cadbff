"""Fused flash-attention Pallas kernels for TPU — forward AND backward.

Online-softmax attention over (B, L, D) inputs with key-padding masking.
K/V blocks stream through VMEM via the grid's innermost dimension (Mosaic
double-buffers the HBM->VMEM block DMAs against compute) while running
max / denominator / output accumulators live in VMEM scratch, so neither
the (Lq, Lk) score matrix nor the full K/V rows are ever resident: VMEM
use is O(block^2), independent of sequence length. An earlier design held
full K/V rows per (batch, head) and hit the 16 MB VMEM ceiling at L~8k.

Training support: `flash_attention` carries a `jax.custom_vjp` whose
backward is the standard recompute-based flash backward — the forward saves
only the output and the per-row logsumexp, and two Pallas kernels recompute
score blocks on the fly to produce dQ and dK/dV. Residual memory is O(L)
per row instead of O(L^2), so long-video training (8x2048 and beyond) runs
the fused path end to end instead of falling back to O(L^2) XLA attention.
Semantics replaced: the reference encoder's torch MHA
(model/transformer_encoder_droppath.py:103-125).

Off-TPU callers fall back to the XLA einsum path automatically
(univtg_tpu/ops/attention.py); set UNIVTG_PALLAS_INTERPRET=1 to force the
Pallas path in interpreter mode on CPU (used by the grad-parity tests).

Numerics: the kernels' dots run in the input dtype with f32 accumulation
(preferred_element_type) — on bf16 inputs that is the MXU's native
single-pass mode, the SAME accuracy class as XLA's default attention on
TPU. Measured against a float64 host reference at (B1 H2 L256 dh128):
flash max err 4.5e-3 / mean 2.6e-4 vs XLA-default 3.7e-3 / 2.7e-4; only
Precision.HIGHEST XLA (several-fold slower passes) reaches 1e-6.
Algorithmic exactness is proven on CPU interpret where f32 dots are exact
(tests/test_pallas_attention.py, atol 5e-5).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128  # scratch accumulators keep a full lane dim for legal tiling


def interpret_enabled() -> bool:
    """True when UNIVTG_PALLAS_INTERPRET=1: kernels run in interpreter mode
    (CPU), letting tests exercise the real Pallas code path off-TPU."""
    return os.environ.get("UNIVTG_PALLAS_INTERPRET", "") == "1"


def _dropout_keep(seed_ref, rate: float, qb, kb, shape):
    """Deterministic per-(bh, q-tile, k-tile) dropout keep mask, scaled by
    1/(1-rate). The SAME (qb, kb) tile must regenerate the SAME bits in the
    forward and in both backward kernels, so the bits come from a
    counter-based hash of (seed, bh, qb, kb, row, col) -- pure jnp (VPU
    ops), so it runs identically under Mosaic and CPU interpret, unlike
    pltpu.prng_* which has no CPU lowering. Murmur3-style finalizer for
    avalanche; plenty for dropout. Equal tiling across the three kernels is
    still required (no stream collapse under dropout) so (qb, kb) mean the
    same tile everywhere."""
    bh = pl.program_id(0)
    # mix the tile coordinates with independent odd multipliers + XOR
    # (bijective mod 2^32 per coordinate): naive base-8192 packing wraps at
    # bh=64 and reuses byte-identical masks across batch-head slices
    seed = (
        seed_ref[0, 0].astype(jnp.uint32)
        ^ (bh.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
        ^ (qb.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        ^ (kb.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    )
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = rows * jnp.uint32(65599) + cols + seed * jnp.uint32(2654435761)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return (x >= thresh).astype(jnp.float32) / (1.0 - rate)


def _compiler_params():
    # bh and q/k-block dims are independent; only the streamed innermost
    # dim carries the scratch accumulator dependency
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, sm_scale: float, dropout_rate: float):
    """Grid (BH, nq, nk), nk innermost. Blocks: q/o (1, bq, dh),
    k/v (1, bk, dh), mask (1, 1, bk), lse (1, bq, 1). The (m, l, acc)
    online-softmax state lives in VMEM scratch across the nk sweep."""
    kb, nk = pl.program_id(2), pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, dh), native dtype
    k = k_ref[0]  # (bk, dh)
    v = v_ref[0]
    kmask = mask_ref[0, 0, :]  # (bk,)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (bq, bk) f32
    s = s + (1.0 - kmask.astype(jnp.float32))[None, :] * NEG_INF

    m_prev = m_scr[:, :1]  # (bq, 1)
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    # the denominator uses the UNdropped p: dropout(softmax(s)) ==
    # (p * keep/(1-r)) / sum(p), since torch drops AFTER normalization
    l_scr[:] = jnp.broadcast_to(
        l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
    )
    p_acc = p
    if dropout_rate > 0.0:
        p_acc = p * _dropout_keep(
            seed_ref, dropout_rate, pl.program_id(1), kb, p.shape
        )
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _():
        l_safe = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:, :1] + jnp.log(l_safe)


def _fwd_impl(seed, maskh, qh, kh, vh, *, block_q: int, block_k: int,
              sm_scale: float, dropout_rate: float = 0.0):
    """Head-split padded tensors -> (out, lse). qh/kh/vh: (BH, L, dh);
    maskh: (BH, 1, Lk). block_k is the STREAM size of the innermost grid
    dim -- _stream_block picks the whole row when it fits VMEM (one big MXU
    dot per (bh, q-block), measured fastest at 2k lengths) and 512-chunks
    beyond that (no VMEM ceiling)."""
    BH, Lq, dh = qh.shape
    Lk = kh.shape[1]
    grid = (BH, Lq // block_q, Lk // block_k)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bh, qb, kb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, qb, kb: (bh, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), lambda bh, qb, kb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda bh, qb, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda bh, qb, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda bh, qb, kb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            # lse is (BH, Lq, 1): TPU block shapes need the sublane dim
            # divisible by 8 (block_q is) and the lane dim equal to the
            # array dim (1); a 2-D (1, block_q) block fails lowering
            pl.BlockSpec((1, block_q, 1), lambda bh, qb, kb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq, dh), qh.dtype),
            jax.ShapeDtypeStruct((BH, Lq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running denom
            pltpu.VMEM((block_q, dh), jnp.float32),      # output acc
        ],
        compiler_params=_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq * Lk * dh,
            bytes_accessed=(qh.size + kh.size + vh.size) * qh.dtype.itemsize,
            transcendentals=BH * Lq * Lk,
        ),
        interpret=interpret_enabled(),
    )(seed, maskh, qh, kh, vh)
    return out, lse


# ---------------------------------------------------------------------------
# backward (recompute-based flash backward, FlashAttention-2 style)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_scr, *, sm_scale: float,
                   dropout_rate: float):
    """Grid (BH, nq, nk), nk innermost: dQ accumulates in scratch over the
    streamed K/V blocks. ds = p * (dO V^T - delta); dQ = sm_scale * ds K."""
    kb, nk = pl.program_id(2), pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kmask = mask_ref[0, 0, :]

    s = sm_scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + (1.0 - kmask.astype(jnp.float32))[None, :] * NEG_INF
    p = jnp.exp(s - lse)  # exact softmax probs (lse saved from fwd)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        # regenerate the forward's exact keep mask for this (qb, kb) tile;
        # the delta identity survives dropout (delta = rowsum(dO * out))
        dp = dp * _dropout_keep(
            seed_ref, dropout_rate, pl.program_id(1), kb, p.shape
        )
    ds = p * (dp - delta)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _():
        dq_ref[0] = (dq_scr[:] * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                    sm_scale: float, dropout_rate: float):
    """Grid (BH, nk, nq), nq innermost: dK/dV accumulate in scratch over the
    streamed Q/dO blocks. dV = P^T dO; dK = sm_scale * ds^T Q."""
    qb, nq = pl.program_id(2), pl.num_programs(2)

    @pl.when(qb == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k = k_ref[0]  # (bk, dh)
    v = v_ref[0]
    kmask = mask_ref[0, 0, :]  # (bk,)
    q = q_ref[0]  # (bq, dh)
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]

    s = sm_scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    s = s + (1.0 - kmask.astype(jnp.float32))[None, :] * NEG_INF
    p = jnp.exp(s - lse)
    p_drop = p
    if dropout_rate > 0.0:
        # NOTE the transposed grid: here qb is program_id(2), kb is
        # program_id(1); the (qb, kb) tile coordinates passed to the PRNG
        # must match the forward's orientation
        d = _dropout_keep(seed_ref, dropout_rate, qb, pl.program_id(1), p.shape)
        p_drop = p * d
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = dp * d
    ds = p * (dp - delta)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qb == nq - 1)
    def _():
        dk_ref[0] = (dk_scr[:] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_impl(seed, maskh, qh, kh, vh, out, lse, g, *, block_q, block_k,
              sm_scale, dropout_rate: float = 0.0):
    BH, Lq, dh = qh.shape
    Lk = kh.shape[1]
    # per-row rowsum(dO * O) -- tiny elementwise reduce, XLA fuses it
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, Lq, 1)

    qblk = lambda bh, qb, kb: (bh, qb, 0)
    kblk = lambda bh, qb, kb: (bh, kb, 0)
    cost = pl.CostEstimate(
        flops=6 * BH * Lq * Lk * dh,
        bytes_accessed=(qh.size * 2 + kh.size + vh.size) * qh.dtype.itemsize,
        transcendentals=BH * Lq * Lk,
    )

    seed_spec_q = pl.BlockSpec((1, 1), lambda bh, qb, kb: (0, 0),
                               memory_space=pltpu.SMEM)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate
        ),
        grid=(BH, Lq // block_q, Lk // block_k),
        in_specs=[
            seed_spec_q,
            pl.BlockSpec((1, 1, block_k), lambda bh, qb, kb: (bh, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qblk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), qblk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, dh), qh.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        compiler_params=_compiler_params(),
        cost_estimate=cost,
        interpret=interpret_enabled(),
    )(seed, maskh, qh, kh, vh, g, lse, delta)

    # dkv grid streams Q blocks innermost; index maps swap roles
    q_in = lambda bh, kb, qb: (bh, qb, 0)
    k_in = lambda bh, kb, qb: (bh, kb, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate
        ),
        grid=(BH, Lk // block_k, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bh, kb, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb, qb: (bh, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), q_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), k_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), k_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), q_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), q_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), q_in, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dh), k_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), k_in, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lk, dh), kh.dtype),
            jax.ShapeDtypeStruct((BH, Lk, dh), vh.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        cost_estimate=cost,
        interpret=interpret_enabled(),
    )(seed, maskh, qh, kh, vh, g, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-vjp core on head-split padded tensors
# ---------------------------------------------------------------------------


# Forward and backward take SEPARATE stream sizes: the forward has few
# operands and can take a whole ~2.5k row in one grid step (single big MXU
# dot), while the backward's 7 inputs + outputs + scratch at f32 cotangent
# width exceed the 16 MB VMEM at that stream size (measured 17.8M) -- it
# stays on regular block streaming.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_core(block_q, stream_fwd, stream_bwd, sm_scale, dropout_rate,
                seed, maskh, qh, kh, vh):
    out, _ = _fwd_impl(
        seed, maskh, qh, kh, vh, block_q=block_q, block_k=stream_fwd,
        sm_scale=sm_scale, dropout_rate=dropout_rate,
    )
    return out


def _flash_core_fwd(block_q, stream_fwd, stream_bwd, sm_scale, dropout_rate,
                    seed, maskh, qh, kh, vh):
    out, lse = _fwd_impl(
        seed, maskh, qh, kh, vh, block_q=block_q, block_k=stream_fwd,
        sm_scale=sm_scale, dropout_rate=dropout_rate,
    )
    return out, (seed, maskh, qh, kh, vh, out, lse)


def _flash_core_bwd(block_q, stream_fwd, stream_bwd, sm_scale, dropout_rate,
                    residuals, g):
    seed, maskh, qh, kh, vh, out, lse = residuals
    dq, dk, dv = _bwd_impl(
        seed, maskh, qh, kh, vh, out, lse, g,
        block_q=block_q, block_k=stream_bwd, sm_scale=sm_scale,
        dropout_rate=dropout_rate,
    )
    return jnp.zeros_like(seed), jnp.zeros_like(maskh), dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _auto_block(L: int) -> int:
    """Default block edge for a given sequence length: big blocks amortize
    grid-step overhead and feed the MXU large dots (measured at 8x2176
    fwd+bwd: 23.1 ms with 128-blocks, 13.3 with 256, 9.4 with 512 -- vs
    15.1 ms for XLA attention), while short sequences stay at one tight
    block instead of padding to 512."""
    return int(min(512, max(128, -(-L // 128) * 128)))


# Streamed rows up to this length are taken in ONE grid step (k/v block +
# the (block, stream) f32 probability tile stay well under the 16 MB VMEM):
# 512x2560 f32 p-tile = 5 MB, k/v 2560x128 bf16 = 0.65 MB each.
_MAX_STREAM = 2560


def _stream_block(Lp: int, block: int) -> int:
    """Innermost-dim block: the whole (padded) row when it fits, else the
    regular block size for unbounded-length streaming."""
    return Lp if Lp <= _MAX_STREAM else block


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "block_k", "dropout_rate"),
)
def flash_attention(q, k, v, key_padding_mask, *, num_heads: int,
                    block_q: int = None, block_k: int = None,
                    dropout_rate: float = 0.0, dropout_seed=None):
    """Fused SDPA. q/k/v: (B, L, D) post-projection; mask: (B, Lk) 1=valid.

    Returns (B, Lq, D). Sequences are padded to block multiples internally;
    padded keys are masked, padded queries are sliced off. Differentiable
    (custom-vjp flash backward). Block sizes default to _auto_block(L).

    dropout_rate > 0 applies attention-probability dropout INSIDE the
    kernels (torch MHA semantics: drop after normalization, scale by
    1/(1-rate)); `dropout_seed` (int32 scalar, e.g. derived from a PRNG
    key) makes the mask deterministic — the backward regenerates the
    forward's exact keep pattern from the same per-tile seeds, which is
    also why dropout disables the forward stream collapse (fwd and bwd
    must tile identically).
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    if block_q is None:
        block_q = _auto_block(Lq)
    auto_k = block_k is None
    if auto_k:
        block_k = _auto_block(Lk)
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

    # auto mode collapses the FORWARD k stream to ONE grid step when the
    # padded row fits VMEM (single big MXU dot -- fastest at ~2k lengths);
    # the backward always block-streams (its operand set would bust VMEM at
    # full-row streams), and explicit block_k (tests) keeps multi-block
    # streaming exercised in both. Dropout pins fwd tiling to the bwd's.
    stream_fwd = (
        _stream_block(Lkp, block_k)
        if auto_k and dropout_rate == 0.0
        else block_k
    )
    if dropout_seed is None:
        if dropout_rate > 0.0:
            raise ValueError(
                "flash_attention(dropout_rate>0) requires dropout_seed -- "
                "a fixed implicit seed would apply the SAME mask every "
                "step (structured sparsification, not dropout)."
            )
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
    out = _flash_core(
        block_q, stream_fwd, block_k, sm_scale, float(dropout_rate),
        seed, maskh, qh, kh, vh,
    )

    out = out.reshape(B, H, Lqp, dh).transpose(0, 2, 1, 3).reshape(B, Lqp, D)
    return out[:, :Lq]
