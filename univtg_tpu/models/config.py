"""Typed model configuration.

Replaces the model-relevant slice of the reference's ~90 argparse flags
(main/config.py:28-204) with a frozen dataclass that can be serialized next
to checkpoints and is hashable for jit static args.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # input feature dims (after TEF concat if used; see DataConfig)
    vid_dim: int = 2818  # slowfast 2304 + clip 512 + tef 2 (scripts/qvhl_pretrain.sh)
    txt_dim: int = 512
    hidden_dim: int = 1024
    # encoder
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 1024
    dropout: float = 0.0
    droppath: float = 0.1
    input_dropout: float = 0.5
    pre_norm: bool = False
    # input projectors (LN -> dropout -> dense [-> relu]) stacks
    n_input_proj: int = 2
    # heads
    span_loss_type: str = "l1"  # "l1" (offset regression) | "ce" (start/end cls)
    max_v_l: int = 75
    use_txt_pos: bool = False
    max_q_l: int = 32
    # numerics: params are always f32; activations run in compute_dtype
    compute_dtype: str = "float32"
    # attention implementation:
    #   "xla"    einsum attention (default; best for short sequences)
    #   "pallas" fused flash kernel, fwd + custom-vjp bwd (TPU; falls back
    #            to xla off-TPU or when attention dropout is active)
    #   "ring"   context-parallel ring attention over the mesh "tp" axis
    #            (needs an active jax.set_mesh whose tp axis tiles the
    #            token length; trainable -- ops/ring_attention.py)
    attention_impl: str = "xla"
    # sequence-parallel activation sharding between encoder layers (needs an
    # active jax.set_mesh context with a "tp" axis; no-op otherwise)
    seq_shard: bool = False
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for activation memory on long-video batches
    remat: bool = False
    # run the encoder stack as ONE lax.scan over stacked layer params:
    # trace/compile time becomes O(1) in depth (see models/encoder.py);
    # checkpoints convert via encoder.stack_layer_params
    scan_layers: bool = False
    # GPipe pipeline parallelism over the encoder layers: shard the stacked
    # scan-layout layer axis over a "pp" mesh axis and stream microbatches
    # stage-to-stage with ppermute (parallel/pipeline.py). Requires
    # scan_layers=True and an active jax.set_mesh(make_mesh(..., pp=N));
    # falls back to the sequential scan off-mesh (model.init, eval hosts).
    pipeline_stages: int = 0
    # microbatch count M (0 -> pipeline_stages); bubble = (pp-1)/(M+pp-1)
    pipeline_microbatches: int = 0
    # virtual stages per device (v). v>1 runs the Megatron-style interleaved
    # schedule: the layer stack is cut into pp*v chunks, chunk c on device
    # c % pp, shrinking pipeline-fill bubble TIME by v at the cost of v*x
    # more ppermute hops (parallel/pipeline.py module docstring). Requires
    # num_layers % (pipeline_stages * v) == 0; ignored when pipeline is off.
    pipeline_interleave: int = 1
    # the training state stores the encoder's stacked layers in device-major
    # chunk order (parallel.pipeline.permute_pipeline_params), making the
    # v>1 pipeline path permutation-free per step. Checkpoints stay in
    # canonical layer order -- the train driver converts at restore/save.
    # Off-mesh execution with this flag set raises (models/encoder.py).
    pipeline_pre_permuted: bool = False
    # Mixture-of-Experts FFN (ops/moe.py): moe_experts > 1 replaces each
    # encoder layer's dense gelu FFN with a top-k routed bank of
    # moe_experts experts (capacity-based GShard dispatch). The stacked
    # expert kernels shard over the mesh "ep" axis
    # (make_mesh(..., ep=N) + parallel/mesh.py param rules) and the
    # load-balance aux loss reaches the objective via
    # train/steps.forward -> LossWeights.moe_aux. Incompatible with
    # pipeline_stages > 1 (models/encoder.py rejects the combination).
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def head_dim(self) -> int:
        assert self.hidden_dim % self.num_heads == 0
        return self.hidden_dim // self.num_heads

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        return cls(**json.loads(s))


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
