"""Mixture-of-Experts FFN with capacity-based top-k dispatch.

Beyond-parity scaling machinery: the reference ships a dense gelu FFN only
(model/transformer_encoder_droppath.py:95-101 — linear1 -> gelu -> linear2).
This module swaps that FFN for a sparsely-activated expert bank so encoder
capacity scales with expert count at constant per-token FLOPs, and the
expert axis shards over an "ep" mesh axis (expert parallelism — the fifth
parallelism axis next to dp/tp/sp/pp).

TPU-first design (GShard/Switch dispatch, not a torch-style gather loop):

  * routing, position assignment, and dispatch are pure einsums over
    static shapes — one one-hot dispatch tensor (N, E, C), no dynamic
    shapes, no sorting, no host callbacks — so XLA tiles everything onto
    the MXU and the program is identical across steps;
  * the expert compute is ONE batched matmul pair over the stacked
    (E, D, F)/(E, F, D) kernels; with the expert axis sharded over "ep"
    each device computes only its local experts and XLA inserts the
    dispatch/combine all-to-alls from the sharding constraints;
  * capacity C is rounded up to the 8-sublane tile so the per-expert
    buffer maps cleanly onto VMEM tiles.

Routing follows Switch/GShard semantics: top-1 keeps the raw router
probability as the combine weight (Switch — keeps routing differentiable
through the task loss); top-k>=2 renormalizes the gates over the chosen
set (GShard). Tokens beyond an expert's capacity are dropped (the residual
connection carries them through unchanged), and the load-balance auxiliary
loss aux = E * sum_e f_e * p_e (f_e = fraction of tokens whose top-1 choice
is e, p_e = mean router probability of e), which is 1.0 at perfect balance.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def sown_moe_aux_sum(ivars) -> "jax.Array":
    """Sum every 'moe_aux' leaf sown into an intermediates pytree (one
    scalar per MoE layer applied under the collecting apply). Shared by the
    pipeline engines' chunk bodies (parallel/pipeline.py,
    parallel/pipeline_1f1b.py)."""
    leaves = [
        jnp.sum(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(ivars)[0]
        if any(getattr(p, "key", None) == "moe_aux" for p in path)
    ]
    return sum(leaves, jnp.zeros((), jnp.float32))


def ep_constraint(x, axis: str = "ep"):
    """Shard the leading expert axis of an (E, ...) buffer over the mesh's
    "ep" axis. No-op without an active mesh context (jax.set_mesh) or when
    the mesh has no ep axis — same contract as parallel.mesh.seq_constraint
    so MoE configs stay portable to unsharded hosts."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape or axis not in mesh.shape:
        return x
    if x.shape[0] % mesh.shape[axis] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, P(axis, *([None] * (x.ndim - 1)))
    )


def moe_capacity(n_tokens: int, n_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-expert token capacity: ceil(top_k * N * factor / E), rounded up
    to a multiple of 8 (TPU sublane tile), capped at N."""
    c = math.ceil(top_k * n_tokens * capacity_factor / n_experts)
    c = ((c + 7) // 8) * 8
    return min(n_tokens, c)


def moe_routing(probs, n_experts: int, top_k: int, capacity: int,
                token_mask=None, dtype=jnp.float32):
    """Capacity-based top-k assignment.

    Args:
      probs: (N, E) float32 router probabilities (softmax output).
      token_mask: optional (N,) float, 1 = route this token, 0 = skip
        (padding). Skipped tokens get zero dispatch/combine weight and do
        not consume capacity or contribute to the aux loss.
    Returns:
      dispatch: (N, E, C) 0/1 dispatch tensor (at most top_k ones per row).
      combine:  (N, E, C) dispatch scaled by the renormalized gates.
      aux:      scalar load-balance loss (Switch eq. 4), 1.0 at balance.
    """
    if top_k > n_experts:
        raise ValueError(
            f"moe_routing: top_k={top_k} > n_experts={n_experts} — extra "
            "iterations would silently re-select expert 0 with zero gate"
        )
    n = probs.shape[0]
    if token_mask is None:
        token_mask = jnp.ones((n,), jnp.float32)
    token_mask = token_mask.astype(jnp.float32)
    probs = probs * token_mask[:, None]

    # pick the k experts + raw gates first, renormalize over the chosen set
    remaining = probs
    choices, gates = [], []
    for _ in range(top_k):
        e_k = jnp.argmax(remaining, axis=-1)                       # (N,)
        onehot = jax.nn.one_hot(e_k, n_experts, dtype=jnp.float32)
        gates.append(jnp.sum(remaining * onehot, axis=-1))          # (N,)
        choices.append(onehot * token_mask[:, None])
        remaining = remaining * (1.0 - onehot)
    if top_k > 1:
        gate_sum = sum(gates)
        denom = jnp.where(gate_sum > 0, gate_sum, 1.0)
        gates = [g / denom for g in gates]
    # top_k == 1 keeps the RAW router probability as the combine weight
    # (Switch Transformer): renormalizing would make the gate identically
    # g/g == 1, cutting the router off from the task-loss gradient — the
    # router would then train only through the load-balance aux loss.

    # sequential capacity assignment: slot-k tokens queue behind slot-(k-1)
    counts = jnp.zeros((n_experts,), jnp.float32)
    dispatch = jnp.zeros((n, n_experts, capacity), jnp.float32)
    combine = jnp.zeros((n, n_experts, capacity), jnp.float32)
    for onehot, gate in zip(choices, gates):
        pos_in_e = counts[None, :] + jnp.cumsum(onehot, axis=0) - onehot
        pos = jnp.sum(pos_in_e * onehot, axis=-1)                  # (N,)
        keep = (pos < capacity).astype(jnp.float32) * token_mask
        sel = onehot * keep[:, None]                               # (N, E)
        slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                              dtype=jnp.float32)                   # (N, C)
        dispatch = dispatch + sel[:, :, None] * slot[:, None, :]
        combine = combine + (sel * gate[:, None])[:, :, None] * slot[:, None, :]
        counts = counts + jnp.sum(sel, axis=0)

    # load balance over ROUTED tokens only (Switch eq. 4, top-1 choice)
    n_routed = jnp.maximum(jnp.sum(token_mask), 1.0)
    f = jnp.sum(choices[0], axis=0) / n_routed
    p = jnp.sum(probs, axis=0) / n_routed
    aux = n_experts * jnp.sum(f * p)
    return dispatch.astype(dtype), combine.astype(dtype), aux


def moe_ffn(x, router_kernel, w1, b1, w2, b2, *, top_k: int = 1,
            capacity_factor: float = 1.25, token_mask=None):
    """Sparsely-activated gelu FFN: (B, L, D) -> ((B, L, D), aux_loss).

    Args:
      router_kernel: (D, E) routing projection.
      w1, b1: (E, D, F), (E, F) stacked expert up-projections.
      w2, b2: (E, F, D), (E, D) stacked expert down-projections.
      token_mask: optional (B, L) float, 1 = valid token.

    The expert axis of the stacked kernels and of the intermediate
    (E, C, *) buffers shards over the mesh "ep" axis (ep_constraint /
    parallel.mesh param rules); the feature axes keep the Megatron tp
    sharding of the dense FFN they replace.
    """
    b, l, d = x.shape
    e = w1.shape[0]
    n = b * l
    xt = x.reshape(n, d)
    mask = None if token_mask is None else token_mask.reshape(n)

    logits = xt.astype(jnp.float32) @ router_kernel.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    cap = moe_capacity(n, e, top_k, capacity_factor)
    dispatch, combine, aux = moe_routing(
        probs, e, top_k, cap, token_mask=mask, dtype=x.dtype
    )

    expert_in = jnp.einsum("nec,nd->ecd", dispatch, xt)
    expert_in = ep_constraint(expert_in)
    h = jnp.einsum("ecd,edf->ecf", expert_in, w1) + b1[:, None, :]
    h = jax.nn.gelu(h, approximate=False)
    expert_out = jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None, :]
    expert_out = ep_constraint(expert_out)
    y = jnp.einsum("nec,ecd->nd", combine, expert_out)
    return y.reshape(b, l, d), aux
