"""UniVTG flagship model: unified video-language temporal grounding.

One encoder, three heads over the video half of the memory:

  * foreground head  -- per-clip grounding probability (sigmoid),
  * boundary head    -- per-clip (left, right) offsets in (-1, 0) x (0, 1),
    added to the clip's own normalized timestamp at decode/loss time,
  * saliency head    -- cosine similarity between the projected video tokens
    and the weighted-pooled sentence vector.

Behavioral reference: model/univtg.py:51-155. Inputs are statically shaped
(B, Lt, Dt)/(B, Lv, Dv) with float masks; everything jits to a single XLA
program.

The forward is decomposed into ``pre`` (input projections, token types,
positional embeddings) -> ``encoder`` -> ``heads`` (conv heads + saliency),
composed by ``__call__``. The split exists for the 1F1B pipelined training
engine (parallel/pipeline_1f1b.py), which runs the three phases per
microbatch with a manual backward schedule; every other caller uses
``__call__`` and sees identical behavior to the previous single-method
implementation (the param tree is unchanged). Note the saliency head is a
*skip connection*: it reads the pre-encoder projections (``vid``/``txt``),
not the encoder memory -- matching model/univtg.py:139-147 where
``vid_mem_proj`` is projected from the encoder *input* ``src_vid``.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from univtg_tpu.models.config import ModelConfig
from univtg_tpu.models.encoder import Encoder
from univtg_tpu.models.layers import (
    ConvHead,
    InputProj,
    WeightedPool,
    cosine_similarity,
    mask_log,
)
from univtg_tpu.models.positional import TrainableTextPos, sine_position_from_mask

# top-level param-tree keys touched by each phase; used by the 1F1B train
# step to take vjps against exactly the right sub-trees.
# `token_type_embedding` appears in both because setup() declares it eagerly
# (every partial apply must carry it); its `heads` cotangent is zero.
PRE_PARAM_KEYS = (
    "input_vid_proj",
    "input_txt_proj",
    "token_type_embedding",
    "txt_pos",
)
HEAD_PARAM_KEYS = (
    "class_head",
    "span_head",
    "weighted_pool",
    "token_type_embedding",
)


class UniVTG(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        self.input_vid_proj = InputProj(
            cfg.hidden_dim, cfg.n_input_proj, cfg.input_dropout, dtype
        )
        self.input_txt_proj = InputProj(
            cfg.hidden_dim, cfg.n_input_proj, cfg.input_dropout, dtype
        )
        self.token_type = self.param(
            "token_type_embedding",
            nn.initializers.normal(stddev=0.02),
            (2, cfg.hidden_dim),
        )
        if cfg.use_txt_pos:
            self.txt_pos = TrainableTextPos(
                cfg.max_q_l, cfg.hidden_dim, cfg.input_dropout, dtype
            )
        self.encoder = Encoder(
            cfg.hidden_dim,
            cfg.num_layers,
            cfg.num_heads,
            cfg.ffn_dim,
            cfg.dropout,
            cfg.droppath,
            cfg.pre_norm,
            cfg.attention_impl,
            dtype,
            cfg.seq_shard,
            cfg.remat,
            cfg.scan_layers,
            pipeline_stages=cfg.pipeline_stages,
            pipeline_microbatches=cfg.pipeline_microbatches,
            pipeline_interleave=cfg.pipeline_interleave,
            pipeline_pre_permuted=cfg.pipeline_pre_permuted,
            moe_experts=cfg.moe_experts,
            moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
        )
        span_pred_dim = 2 if cfg.span_loss_type == "l1" else cfg.max_v_l * 2
        self.class_head = ConvHead(cfg.hidden_dim, 1, 3, dtype=dtype)
        self.span_head = ConvHead(cfg.hidden_dim, span_pred_dim, 3, dtype=dtype)
        self.weighted_pool = WeightedPool(cfg.hidden_dim, dtype)

    def pre(
        self,
        src_txt,
        src_txt_mask,
        src_vid,
        src_vid_mask,
        src_cls=None,
        src_cls_mask=None,
        *,
        train: bool = False,
    ):
        """Phase 1: project both modalities, add token types, build the
        concatenated encoder input + mask + positional embedding.

        Returns (src, mask, pos, vid, txt, cls_tok); ``vid``/``txt`` are the
        projected per-modality tokens the saliency head consumes directly.
        """
        cfg = self.cfg
        dtype = cfg.dtype
        vid = self.input_vid_proj(src_vid.astype(dtype), train=train) + self.token_type[1]
        txt = self.input_txt_proj(src_txt.astype(dtype), train=train) + self.token_type[0]
        cls_tok = None
        if src_cls is not None:
            cls_tok = (
                self.input_txt_proj(src_cls.astype(dtype), train=train)
                + self.token_type[0]
            )

        src = jnp.concatenate([vid, txt], axis=1)
        mask = jnp.concatenate([src_vid_mask, src_txt_mask], axis=1).astype(dtype)

        pos_vid = sine_position_from_mask(src_vid_mask, cfg.hidden_dim, dtype=dtype)
        if cfg.use_txt_pos:
            pos_txt = self.txt_pos(txt, train=train)
        else:
            pos_txt = jnp.zeros_like(txt)
        pos = jnp.concatenate([pos_vid, pos_txt], axis=1)
        return src, mask, pos, vid, txt, cls_tok

    def heads(
        self,
        memory,
        vid,
        txt,
        src_vid_mask,
        src_txt_mask,
        cls_tok=None,
        src_cls_mask=None,
        *,
        train: bool = False,
    ):
        """Phase 3: decode the encoder memory's video half through the conv
        heads and compute the saliency skip connection from the pre-encoder
        projections. ``train`` is accepted for signature symmetry (the heads
        carry no dropout)."""
        cfg = self.cfg
        dtype = cfg.dtype
        # Mask the conv heads at every layer: stacked k=3 convs have a +-3
        # receptive field, so boundary clips would otherwise read padded
        # tokens' embeddings. With exact-length inputs the reference sees
        # conv zero-padding; per-layer masking reproduces that contract for
        # any static pad length (the reference's *batched* eval leaks batch
        # composition into boundary scores -- a bug not carried over).
        vid_mem = memory[:, : vid.shape[1], :]
        vmask = src_vid_mask.astype(dtype)

        fg_logits = self.class_head(vid_mem, vmask)
        pred_logits = nn.sigmoid(fg_logits)
        raw_spans = self.span_head(vid_mem, vmask)
        if cfg.span_loss_type == "l1":
            # (-sigmoid, +sigmoid): left offsets negative, right positive
            pred_spans = nn.sigmoid(raw_spans) * jnp.asarray([-1.0, 1.0], dtype=dtype)
        else:
            pred_spans = raw_spans  # (B, Lv, 2*max_v_l) start/end logits

        txt_pooled = self.weighted_pool(txt, src_txt_mask.astype(dtype))
        txt_mem_proj = txt_pooled[:, None, :]  # (B, 1, D)
        saliency = cosine_similarity(vid, txt_mem_proj) + mask_log(
            src_vid_mask.astype(jnp.float32)
        )

        out = {
            "pred_logits": pred_logits,
            "pred_spans": pred_spans,
            "src_vid_mask": src_vid_mask,
            "vid_mem_proj": vid,
            "txt_mem_proj": txt_mem_proj,
            "saliency_scores": saliency,
        }
        if cls_tok is not None:
            out["cls_mem_proj"] = self.weighted_pool(
                cls_tok, src_cls_mask.astype(dtype)
            )
        return out

    def __call__(
        self,
        src_txt,
        src_txt_mask,
        src_vid,
        src_vid_mask,
        src_cls=None,
        src_cls_mask=None,
        *,
        train: bool = False,
    ):
        src, mask, pos, vid, txt, cls_tok = self.pre(
            src_txt, src_txt_mask, src_vid, src_vid_mask,
            src_cls, src_cls_mask, train=train,
        )
        memory = self.encoder(src, mask, pos, train=train)
        return self.heads(
            memory, vid, txt, src_vid_mask, src_txt_mask,
            cls_tok, src_cls_mask, train=train,
        )
