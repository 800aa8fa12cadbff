"""Ring attention: context-parallel SDPA over a mesh axis.

The sequence (keys/values) is sharded across devices on a mesh axis; each
device holds one K/V block and rotates it around the ring with ppermute
while accumulating online-softmax partials for its local queries. Peak
per-device memory is O(L_local) instead of O(L), so contexts can exceed a
single chip's VMEM/HBM -- the scaling story for hour-long videos at dense
clip rates (beyond the reference's 75-clip ceiling; SURVEY.md §5
long-context note).

Built on shard_map + XLA collectives (runs on any backend, including the
virtual CPU mesh used in tests); the Pallas RDMA variant
(make_async_remote_copy) is backlog for real multi-chip pods.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def dropout_keep_mask(seed, rate: float, shape, q_off, k_off):
    """Deterministic attention-dropout keep mask over GLOBAL coordinates
    (seed, batch, head, global q index, global k index), scaled by
    1/(1-rate). Coordinate-independent of the sharding: every device
    regenerates the same bits for the same global (q, k) cell, so the ring
    rotation (and the single-device reference in tests) agree exactly.
    Pure jnp -- autodiff differentiates THROUGH the (constant) mask, so the
    ring needs no custom vjp for dropout. Same mixing recipe as the flash
    kernels' per-tile hash (ops/pallas_attention._dropout_keep)."""
    b = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    h = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    qg = jax.lax.broadcasted_iota(jnp.uint32, shape, 2) + jnp.uint32(q_off)
    kg = jax.lax.broadcasted_iota(jnp.uint32, shape, 3) + jnp.uint32(k_off)
    x = (
        jnp.asarray(seed).astype(jnp.uint32)
        ^ (b * jnp.uint32(0x9E3779B1))
        ^ (h * jnp.uint32(0x85EBCA6B))
        ^ (qg * jnp.uint32(0xC2B2AE35))
        ^ (kg * jnp.uint32(0x27D4EB2F))
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return (x >= thresh).astype(jnp.float32) / (1.0 - rate)


def _ring_block(carry, kv_mask, q, dh_scale, axis_name, num_heads,
                dropout_rate=0.0, dropout_seed=None, q_off=0, k_off=0):
    """One ring step: accumulate attention of local q against a K/V block."""
    m, l, acc = carry
    k, v, mask = kv_mask
    B, Lq, D = q.shape
    H = num_heads
    dh = D // H

    def split(x, L):
        return x.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

    qh = split(q, Lq).astype(jnp.float32) * dh_scale
    kh = split(k, k.shape[1]).astype(jnp.float32)
    vh = split(v, v.shape[1]).astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    s = s + (1.0 - mask.astype(jnp.float32))[:, None, None, :] * NEG_INF

    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    # denominator uses the UNdropped p (torch drops AFTER normalization)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    p_acc = p
    if dropout_rate > 0.0:
        p_acc = p * dropout_keep_mask(
            dropout_seed, dropout_rate, p.shape, q_off, k_off
        )
    acc_new = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p_acc, vh)
    return m_new, l_new, acc_new


def _ring_attention_local(q, k, v, mask, seed, *, num_heads, axis_name,
                          dropout_rate=0.0):
    """Per-device body under shard_map. q: (B, Lq_loc, D) local queries;
    k/v: (B, Lk_loc, D) local key/value block; mask: (B, Lk_loc)."""
    B, Lq, D = q.shape
    H = num_heads
    dh = D // H
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def varying(x):
        # mark device-local accumulators as varying over the ring axis
        # (jax >= 0.8 typed manual axes)
        try:
            return jax.lax.pcast(x, (axis_name,), to="varying")
        except (AttributeError, TypeError):
            return x

    m = varying(jnp.full((B, H, Lq, 1), -jnp.inf, jnp.float32))
    l = varying(jnp.zeros((B, H, Lq, 1), jnp.float32))
    acc = varying(jnp.zeros((B, H, Lq, dh), jnp.float32))
    scale = dh**-0.5

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    Lk_loc = k.shape[1]

    # lax.scan (NOT fori_loop): reverse-mode differentiable, so the ring is
    # a trainable path -- the backward pass re-rotates K/V cotangents with
    # the transposed ppermute XLA derives automatically. The step index t
    # identifies WHICH global K/V block is resident (src = idx - t mod n),
    # pinning the dropout mask to global coordinates.
    def body(state, t):
        (m, l, acc), k, v, mask = state
        src = jnp.mod(idx - t, n_dev)
        carry = _ring_block(
            (m, l, acc), (k, v, mask), q, scale, axis_name, num_heads,
            dropout_rate=dropout_rate, dropout_seed=seed,
            q_off=idx * Lq, k_off=src * Lk_loc,
        )
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        mask = jax.lax.ppermute(mask, axis_name, perm)
        return (carry, k, v, mask), None

    ((m, l, acc), _, _, _), _ = jax.lax.scan(
        body, ((m, l, acc), k, v, mask), jnp.arange(n_dev)
    )
    out = acc / jnp.maximum(l, 1e-30)  # (B, H, Lq, dh)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D).astype(q.dtype)


def ring_attention(q, k, v, key_padding_mask, *, num_heads: int, mesh: Mesh,
                   axis: str = "tp", dropout_rate: float = 0.0,
                   dropout_seed=None):
    """Context-parallel SDPA: seq axis of q/k/v sharded over `axis`.

    Args:
      q, k, v: (B, L, D) post-projection; L must tile over the axis size.
      key_padding_mask: (B, L) float 1=valid (or None).
      dropout_rate / dropout_seed: attention-probability dropout keyed on
        GLOBAL (q, k) coordinates (dropout_keep_mask), so the sharded
        result equals a single-device run with the same hash mask.
    Returns:
      (B, L, D) attention output, sharded like q.
    """
    from jax.experimental.shard_map import shard_map

    if key_padding_mask is None:
        key_padding_mask = jnp.ones(q.shape[:2], q.dtype)
    assert q.shape[1] % mesh.shape[axis] == 0, "seq must tile over the axis"
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError(
            "ring_attention(dropout_rate>0) requires dropout_seed"
        )
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(dropout_seed, jnp.int32)

    spec = P(None, axis, None)
    mspec = P(None, axis)
    fn = functools.partial(
        _ring_attention_local, num_heads=num_heads, axis_name=axis,
        dropout_rate=float(dropout_rate),
    )
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec, P()),
        out_specs=spec,
    )(q, k, v, key_padding_mask, seed)
