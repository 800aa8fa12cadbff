"""Multi-head attention ops.

Two interchangeable implementations behind one functional interface:

  * "xla":    einsum attention; XLA fuses the softmax chain and maps the
              matmuls onto the MXU. Best for the short sequences (<=512)
              of the grounding model.
  * "pallas": fused flash-attention kernel (univtg_tpu/ops/pallas_attention)
              for long-context extraction / pretraining on TPU; falls back
              to "xla" off-TPU.

Semantics match torch.nn.MultiheadAttention as used by the reference encoder
(model/transformer_encoder_droppath.py:117-118): positional embeddings are
added to Q and K only (not V), and `key_padding_mask` marks *invalid* keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def resolve_impl(impl: str) -> str:
    """'pallas' requires a TPU backend; everything else falls back to the
    XLA einsum path so configs stay portable across hosts/tests.
    UNIVTG_PALLAS_INTERPRET=1 keeps the Pallas path alive on CPU in
    interpreter mode (grad-parity tests exercise the real kernels)."""
    if impl == "pallas":
        import jax

        from univtg_tpu.ops.pallas_attention import interpret_enabled

        if jax.devices()[0].platform == "cpu" and not interpret_enabled():
            return "xla"
    return impl


def attention_scores_bias(key_padding_mask):
    """(B, Lk) float mask (1=valid) -> (B, 1, 1, Lk) additive bias."""
    return (1.0 - key_padding_mask)[:, None, None, :] * NEG_INF


def sdpa_xla(q, k, v, bias, num_heads: int, dropout_rate=0.0, dropout_rng=None):
    """Scaled dot-product attention over (B, L, D) inputs.

    Args:
      q, k, v: (B, L, D) already-projected tensors.
      bias: (B, 1, 1, Lk) additive logits bias (or None).
      num_heads: head count; D % num_heads == 0.
    Returns:
      (B, Lq, D) attention output (pre out-projection).
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    H = num_heads
    dh = D // H
    q = q.reshape(B, Lq, H, dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (dh**-0.5), k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D).astype(q.dtype)


def multihead_attention(
    q_in,
    k_in,
    v_in,
    *,
    in_proj_kernel,
    in_proj_bias,
    out_kernel,
    out_bias,
    num_heads: int,
    key_padding_mask=None,
    impl: str = "xla",
    dropout_rate: float = 0.0,
    dropout_rng=None,
):
    """Full MHA with packed qkv projection (torch in_proj layout, transposed).

    Args:
      q_in, k_in, v_in: (B, L, D) inputs (q/k typically carry +pos).
      in_proj_kernel: (D, 3D) packed [q|k|v] projection (x @ kernel).
      in_proj_bias: (3D,).
      out_kernel: (D, D) output projection; out_bias: (D,).
      key_padding_mask: (B, Lk) float, 1=valid.
      impl: "xla" | "pallas".
    """
    impl = resolve_impl(impl)
    D = q_in.shape[-1]
    # NOTE(roofline): fusing the q/k projections into one (D, 2D) matmul when
    # q_in is k_in was measured SLOWER on v5e (train B=256: 66.9 vs 61.4
    # ms/step) -- the post-matmul slice materializes copies that defeat XLA's
    # existing projection+reshape fusion. Keep the three separate matmuls.
    q = q_in @ in_proj_kernel[:, :D] + in_proj_bias[:D]
    k = k_in @ in_proj_kernel[:, D : 2 * D] + in_proj_bias[D : 2 * D]
    v = v_in @ in_proj_kernel[:, 2 * D :] + in_proj_bias[2 * D :]

    if impl == "ring_pallas":
        # hand-scheduled RDMA ring (ops/ring_attention_pallas.py): the
        # kernel overlaps the inter-chip K/V hop under the block matmuls;
        # differentiable via its custom vjp (backward recomputes through
        # the XLA-collective ring). Falls back to "ring" when attention
        # dropout is active (the kernel has no in-kernel dropout) or the
        # unrolled kernel would be too large (B*H > MAX_BH), and from
        # there to xla when no suitable mesh is live.
        from univtg_tpu.ops.ring_attention_pallas import MAX_BH

        mesh = jax.sharding.get_abstract_mesh()
        if (
            dropout_rate > 0.0
            or q.shape[0] * num_heads > MAX_BH
            or mesh is None
            or not mesh.shape
            or "tp" not in mesh.shape
            or q.shape[1] % mesh.shape["tp"] != 0
        ):
            impl = "ring"
        else:
            from univtg_tpu.ops.ring_attention_pallas import (
                ring_attention_pallas,
            )

            out = ring_attention_pallas(
                q, k, v, key_padding_mask, num_heads=num_heads, mesh=mesh,
                axis="tp", interpret=jax.default_backend() != "tpu",
            )
    if impl == "ring":
        # context-parallel: needs an active jax.set_mesh with a "tp" axis
        # whose size tiles the token length; falls back to xla otherwise
        # (e.g. model.init or off-mesh eval of a ring-configured checkpoint)
        mesh = jax.sharding.get_abstract_mesh()
        if (
            mesh is None
            or not mesh.shape
            or "tp" not in mesh.shape
            or q.shape[1] % mesh.shape["tp"] != 0
        ):
            impl = "xla"
        else:
            from univtg_tpu.ops.ring_attention import ring_attention

            kw = {}
            if dropout_rate > 0.0 and dropout_rng is not None:
                kw = dict(
                    dropout_rate=float(dropout_rate),
                    dropout_seed=jax.random.randint(
                        dropout_rng, (), 0, jnp.iinfo(jnp.int32).max,
                        dtype=jnp.int32,
                    ),
                )
            out = ring_attention(
                q, k, v, key_padding_mask, num_heads=num_heads, mesh=mesh,
                axis="tp", **kw
            )
    if impl == "pallas":
        from univtg_tpu.ops.pallas_attention import flash_attention

        kw = {}
        if dropout_rate > 0.0 and dropout_rng is not None:
            kw = dict(
                dropout_rate=float(dropout_rate),
                dropout_seed=jax.random.randint(
                    dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                ),
            )
        out = flash_attention(q, k, v, key_padding_mask, num_heads=num_heads, **kw)
    elif impl not in ("ring", "ring_pallas"):
        bias = None
        if key_padding_mask is not None:
            bias = attention_scores_bias(key_padding_mask)
        out = sdpa_xla(q, k, v, bias, num_heads, dropout_rate, dropout_rng)
    return out @ out_kernel + out_bias
