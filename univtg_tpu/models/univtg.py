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


class UniVTG(nn.Module):
    cfg: ModelConfig

    @nn.compact
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
        cfg = self.cfg
        dtype = cfg.dtype

        vid_proj = InputProj(
            cfg.hidden_dim, cfg.n_input_proj, cfg.input_dropout, dtype, name="input_vid_proj"
        )
        txt_proj = InputProj(
            cfg.hidden_dim, cfg.n_input_proj, cfg.input_dropout, dtype, name="input_txt_proj"
        )
        token_type = self.param(
            "token_type_embedding",
            nn.initializers.normal(stddev=0.02),
            (2, cfg.hidden_dim),
        )

        vid = vid_proj(src_vid.astype(dtype), train=train) + token_type[1]
        txt = txt_proj(src_txt.astype(dtype), train=train) + token_type[0]
        cls_tok = None
        if src_cls is not None:
            cls_tok = txt_proj(src_cls.astype(dtype), train=train) + token_type[0]

        src = jnp.concatenate([vid, txt], axis=1)
        mask = jnp.concatenate([src_vid_mask, src_txt_mask], axis=1).astype(dtype)

        pos_vid = sine_position_from_mask(src_vid_mask, cfg.hidden_dim, dtype=dtype)
        if cfg.use_txt_pos:
            pos_txt = TrainableTextPos(
                cfg.max_q_l, cfg.hidden_dim, cfg.input_dropout, dtype, name="txt_pos"
            )(txt, train=train)
        else:
            pos_txt = jnp.zeros_like(txt)
        pos = jnp.concatenate([pos_vid, pos_txt], axis=1)

        memory = Encoder(
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
            name="encoder",
        )(src, mask, pos, train=train)
        # Mask the conv heads at every layer: stacked k=3 convs have a +-3
        # receptive field, so boundary clips would otherwise read padded
        # tokens' embeddings. With exact-length inputs the reference sees
        # conv zero-padding; per-layer masking reproduces that contract for
        # any static pad length (the reference's *batched* eval leaks batch
        # composition into boundary scores -- a bug not carried over).
        vid_mem = memory[:, : vid.shape[1], :]
        vmask = src_vid_mask.astype(dtype)

        span_pred_dim = 2 if cfg.span_loss_type == "l1" else cfg.max_v_l * 2
        fg_logits = ConvHead(cfg.hidden_dim, 1, 3, dtype=dtype, name="class_head")(
            vid_mem, vmask
        )
        pred_logits = nn.sigmoid(fg_logits)
        raw_spans = ConvHead(cfg.hidden_dim, span_pred_dim, 3, dtype=dtype, name="span_head")(
            vid_mem, vmask
        )
        if cfg.span_loss_type == "l1":
            # (-sigmoid, +sigmoid): left offsets negative, right positive
            pred_spans = nn.sigmoid(raw_spans) * jnp.asarray([-1.0, 1.0], dtype=dtype)
        else:
            pred_spans = raw_spans  # (B, Lv, 2*max_v_l) start/end logits

        wpool = WeightedPool(cfg.hidden_dim, dtype, name="weighted_pool")
        txt_pooled = wpool(txt, src_txt_mask.astype(dtype))
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
            out["cls_mem_proj"] = wpool(cls_tok, src_cls_mask.astype(dtype))
        return out
