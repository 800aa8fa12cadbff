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
    # Mixture-of-Experts FFN (ops/moe.py): moe_experts > 1 replaces the
    # dense gelu FFN with a top-k routed expert bank whose stacked kernels
    # shard over the mesh "ep" axis. The load-balance aux loss is sown into
    # the "intermediates" collection (train/steps.forward collects it).
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

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
            if self.moe_experts > 1:
                from univtg_tpu.ops.moe import moe_ffn

                e, d, f = self.moe_experts, self.dim, self.ffn_dim
                router = self.param(
                    "moe_router", nn.initializers.xavier_uniform(), (d, e)
                )
                w1 = self.param(
                    "moe_w1", nn.initializers.xavier_uniform(), (e, d, f)
                )
                b1 = self.param("moe_b1", nn.initializers.zeros, (e, f))
                w2 = self.param(
                    "moe_w2", nn.initializers.xavier_uniform(), (e, f, d)
                )
                b2 = self.param("moe_b2", nn.initializers.zeros, (e, d))
                out, aux = moe_ffn(
                    h,
                    router,
                    w1.astype(self.dtype),
                    b1.astype(self.dtype),
                    w2.astype(self.dtype),
                    b2.astype(self.dtype),
                    top_k=self.moe_top_k,
                    capacity_factor=self.moe_capacity_factor,
                    token_mask=key_padding_mask,
                )
                self.sow("intermediates", "moe_aux", aux)
                return out
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


class _ScanUnit(nn.Module):
    """One encoder layer shaped for nn.scan: (carry, broadcast...) ->
    (carry, None). `train` is a static attribute (nn.scan cannot broadcast
    Python-bool call kwargs)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float
    droppath: float
    pre_norm: bool
    attention_impl: str
    dtype: jnp.dtype
    seq_shard: bool
    train: bool
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x, key_padding_mask, pos):
        x = EncoderLayer(
            self.dim,
            self.num_heads,
            self.ffn_dim,
            self.dropout,
            self.droppath,
            self.pre_norm,
            self.attention_impl,
            self.dtype,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            name="layer",
        )(x, key_padding_mask, pos, train=self.train)
        if self.seq_shard:
            from univtg_tpu.parallel.mesh import seq_constraint

            x = seq_constraint(x)
        return x, None


class Encoder(nn.Module):
    """N-layer encoder over the concatenated [video; text] token sequence.

    scan_layers=True runs the layer stack as ONE lax.scan over stacked
    parameters (encoder/layers/layer/* with a leading layer axis) instead of
    N unrolled layers: the XLA program contains one layer body, so trace +
    compile time are O(1) in depth -- minutes saved per program on deep or
    compile-bound configs. Numerics match the unrolled stack exactly in
    eval mode (tests/test_scan_layers.py); in train mode the per-layer
    dropout/droppath RNG split differs from the unrolled fold (same
    distribution). Use models.encoder.stack_layer_params to convert
    unrolled checkpoints."""

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
    scan_layers: bool = False
    # GPipe pipeline parallelism over the layer stack (needs scan_layers and
    # an active mesh with a matching "pp" axis; parallel/pipeline.py). The
    # param layout is IDENTICAL to scan_layers, so checkpoints interchange.
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0  # 0 -> defaults to pipeline_stages
    pipeline_interleave: int = 1  # virtual stages per device (v>1: interleaved)
    # params are stored in device-major chunk order (permute_pipeline_params)
    # so the v>1 path skips the per-step layer gather; the sequential
    # fallback refuses to run (it would silently apply layers out of order)
    pipeline_pre_permuted: bool = False
    # Mixture-of-Experts FFN (ops/moe.py; expert axis shards over "ep")
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    def _refuse_device_major(self):
        """Raise when pre-permuted (device-major) params would be run
        through the sequential path (any non-pipeline execution would apply
        layers out of order). Init is exempt: it CREATES canonical params
        the driver permutes afterwards."""
        if (
            self.pipeline_pre_permuted
            and self.pipeline_interleave > 1
            and not self.is_initializing()
        ):
            raise ValueError(
                "pipeline_pre_permuted params are stored in device-major "
                "chunk order; the sequential path would apply layers out of "
                "order. Activate the pp mesh (pipeline_stages > 1 + "
                "jax.set_mesh), or convert the params back with "
                "parallel.pipeline.permute_pipeline_params(..., "
                "inverse=True) before running off-mesh."
            )

    @nn.compact
    def __call__(self, x, key_padding_mask, pos, *, train: bool):
        if self.seq_shard:
            from univtg_tpu.parallel.mesh import seq_constraint

        if self.pipeline_stages > 1 and not self.scan_layers:
            raise ValueError(
                "pipeline_stages needs scan_layers=True (the pipeline "
                "shards the stacked scan parameter layout over pp)"
            )
        if self.moe_experts > 1 and self.moe_top_k > self.moe_experts:
            raise ValueError(
                f"moe_top_k={self.moe_top_k} must be <= "
                f"moe_experts={self.moe_experts}"
            )
        if (
            self.pipeline_stages > 1
            and self.scan_layers
            and not self.is_initializing()
        ):
            from univtg_tpu.parallel.pipeline import (
                pipeline_available,
                pipeline_layers,
                warn_pipeline_fallback,
            )

            if pipeline_available(
                self.pipeline_stages, self.num_layers, self.pipeline_interleave
            ):
                stacked = self.get_variable("params", "layers")["layer"]
                layer = EncoderLayer(
                    self.dim,
                    self.num_heads,
                    self.ffn_dim,
                    self.dropout,
                    self.droppath,
                    self.pre_norm,
                    self.attention_impl,
                    self.dtype,
                    moe_experts=self.moe_experts,
                    moe_top_k=self.moe_top_k,
                    moe_capacity_factor=self.moe_capacity_factor,
                )
                rng_d = rng_p = None
                if train:
                    if self.has_rng("dropout"):
                        rng_d = self.make_rng("dropout")
                    if self.has_rng("droppath"):
                        rng_p = self.make_rng("droppath")
                x = pipeline_layers(
                    stacked,
                    x,
                    key_padding_mask,
                    jnp.zeros_like(x) if pos is None else pos,
                    layer=layer,
                    n_micro=self.pipeline_microbatches or self.pipeline_stages,
                    train=train,
                    rng_dropout=rng_d,
                    rng_droppath=rng_p,
                    interleave=self.pipeline_interleave,
                    pre_permuted=self.pipeline_pre_permuted,
                    remat=self.remat,
                    # eval discards the aux (the sow below is a no-op
                    # without a mutable collection) -- skip the per-layer
                    # mutable applies and the aux carry entirely
                    collect_aux=self.moe_experts > 1 and train,
                )
                if self.moe_experts > 1 and train:
                    # MoE x pipeline: the engine returns the load-balance
                    # aux as the mean over (layers x microbatches x
                    # dp-shards) -- routing under a pipeline is per
                    # microbatch, the same locality the microbatched loss
                    # terms have. Sown so train/steps.forward surfaces it
                    # as outputs["aux_moe"] exactly like the scan path.
                    x, moe_aux = x
                    self.sow("intermediates", "moe_aux", moe_aux)
                if self.pre_norm:
                    x = nn.LayerNorm(
                        epsilon=LN_EPS, dtype=self.dtype, name="final_norm"
                    )(x)
                return x
            # refuse BEFORE the fallback warning: warning "running the
            # sequential scan instead" and then raising would contradict it
            self._refuse_device_major()
            warn_pipeline_fallback(
                self.pipeline_stages, self.num_layers, self.pipeline_interleave
            )

        # Device-major (pre-permuted) params are only meaningful to the
        # interleaved pipeline path above; EVERY other execution (off-mesh
        # fallback, but also a pipeline_stages<=1 config fed device-major
        # params) would silently apply layers out of order. Init is exempt:
        # it creates canonical params the driver permutes afterwards.
        self._refuse_device_major()

        if self.scan_layers:
            unit = nn.remat(_ScanUnit) if self.remat else _ScanUnit
            scan = nn.scan(
                unit,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                length=self.num_layers,
                in_axes=(nn.broadcast, nn.broadcast),
            )
            x, _ = scan(
                self.dim,
                self.num_heads,
                self.ffn_dim,
                self.dropout,
                self.droppath,
                self.pre_norm,
                self.attention_impl,
                self.dtype,
                self.seq_shard,
                train,
                moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                name="layers",
            )(x, key_padding_mask, pos)
            if self.pre_norm:
                x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="final_norm")(x)
            return x

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
                moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
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


def stack_layer_params(encoder_params: dict, num_layers: int) -> dict:
    """Unrolled encoder params {'layers_0': ..., 'layers_N-1': ...} ->
    scan layout {'layers': {'layer': <stacked leading axis>}} (other keys,
    e.g. final_norm, pass through). Inverse: unstack_layer_params."""
    per_layer = [encoder_params[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    rest = {
        k: v for k, v in encoder_params.items() if not k.startswith("layers_")
    }
    return {**rest, "layers": {"layer": stacked}}


def unstack_layer_params(encoder_params: dict) -> dict:
    """Scan-layout encoder params -> unrolled {'layers_i': ...} layout."""
    stacked = encoder_params["layers"]["layer"]
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {
        k: v for k, v in encoder_params.items() if k != "layers"
    }
    for i in range(num_layers):
        out[f"layers_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out
