"""1F1B-pipelined train step for the UniVTG flagship model.

Composes the three model phases (models/univtg.py: ``pre`` -> encoder stack
-> ``heads``) around the manual-vjp 1F1B engine
(parallel/pipeline_1f1b.py):

  * ``pre`` (input projections + positional embeddings) runs OUTSIDE the
    engine under plain autodiff -- it is a few small matmuls over the full
    batch, and its params are replicated anyway;
  * the encoder layer stack runs INSIDE the engine, sharded P('pp') over
    the layer axis, with the true one-forward-one-backward schedule whose
    activation footprint is O(pp) microbatches regardless of the
    microbatch count M (the GPipe path's autodiff stores O(M + pp));
  * the model ``heads`` + loss run fused into the LAST stage's tick, per
    microbatch, so the loss is the mean of per-(microbatch x dp-shard)
    losses -- the same locality the reference's DDP training has for its
    normalized terms (main/train_vlp_ddp.py:272-275, each worker computes
    its criterion over local rows).

Loss semantics therefore differ from the single-program step
(train/steps.make_train_step computes normalized/contrastive terms over
the FULL batch) exactly the way DDP differs from single-GPU in the
reference; tests/test_pipeline_1f1b.py pins gradients against the
microbatched-loss definition.

The reference has no model parallelism at all (DDP only); this is
beyond-parity scaling machinery for deep encoder variants where GPipe's
activation memory would not fit.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from univtg_tpu.models.encoder import EncoderLayer
from univtg_tpu.models.losses import LossWeights, compute_losses
from univtg_tpu.models.univtg import HEAD_PARAM_KEYS, PRE_PARAM_KEYS, UniVTG
from univtg_tpu.parallel.pipeline_1f1b import pipeline_1f1b
from univtg_tpu.train.steps import TrainState, dequantize_inputs


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def make_1f1b_train_step(
    model: UniVTG,
    optimizer,
    weights: LossWeights,
    losses: Sequence[str] = ("spans", "labels", "saliency"),
    use_gates: bool = False,
    n_micro: int = 0,
    donate: bool = True,
    static_inputs=None,
):
    """Returns jitted (state, model_inputs, targets, rng) -> (state, metrics)
    running the encoder under the 1F1B schedule.

    Requirements (validated eagerly): ``cfg.scan_layers`` (the stacked
    ``encoder/layers/layer`` checkpoint layout the engine shards),
    ``cfg.pre_norm=False`` (a trailing final_norm is not part of the staged
    stack), and an active mesh with a pp axis at call time. tp > 1
    composes: the engine runs tp as an AUTO shard_map axis, so the
    pp x tp-sharded stacked matrices (parallel/mesh.py) keep their
    Megatron feature sharding through the per-chunk vjps.
    ``cfg.pipeline_interleave > 1`` runs the interleaved
    1F1B schedule (bubble time / v); the training state should then be in
    device-major chunk order (``cfg.pipeline_pre_permuted``, managed by
    the driver) or the engine gathers the permutation per step.

    TAL class-bank inputs (``src_cls``/``src_cls_mask``, via
    ``static_inputs`` or the per-batch model_inputs) ride the same path as
    in make_train_step: ``cls_tok`` is produced by the ``pre`` vjp and
    enters the engine bundled WITH the head params -- the engine's
    replicated-pytree vjp + last-chunk accumulation + psum is exactly the
    semantics a microbatch-constant side input needs, so no engine change
    is involved. The returned cotangent flows back through ``pre``.

    n_micro: microbatch count M (0 -> cfg.pipeline_microbatches or
    cfg.pipeline_stages). Larger M shrinks the pipeline bubble at constant
    activation memory -- that is the point of 1F1B.
    """
    cfg = model.cfg
    if not cfg.scan_layers:
        raise ValueError(
            "make_1f1b_train_step needs cfg.scan_layers=True (the engine "
            "shards the stacked encoder/layers/layer parameter layout)"
        )
    if cfg.pre_norm:
        raise ValueError(
            "make_1f1b_train_step supports post-norm encoders only (a "
            "pre-norm final LayerNorm is not part of the staged layer stack)"
        )
    if cfg.pipeline_pre_permuted and cfg.pipeline_interleave <= 1:
        raise ValueError(
            "pipeline_pre_permuted without pipeline_interleave > 1 is "
            "meaningless (device-major == canonical order at v=1)"
        )
    M = n_micro or cfg.pipeline_microbatches or cfg.pipeline_stages
    if M < 1:
        raise ValueError(
            "set n_micro (or cfg.pipeline_microbatches/pipeline_stages) to "
            "the microbatch count"
        )

    layer = EncoderLayer(
        cfg.hidden_dim,
        cfg.num_heads,
        cfg.ffn_dim,
        cfg.dropout,
        cfg.droppath,
        cfg.pre_norm,
        cfg.attention_impl,
        cfg.dtype,
        moe_experts=cfg.moe_experts,
        moe_top_k=cfg.moe_top_k,
        moe_capacity_factor=cfg.moe_capacity_factor,
    )
    # MoE: each chunk's backward recomputes the sown load-balance aux and
    # seeds its gradient with the constant cotangent inside the engine
    # (pipeline_1f1b collect_aux); the reported loss adds
    # weights.moe_aux * aux_mean exactly like make_train_step
    collect_aux = cfg.moe_experts > 1

    def heads_apply(bundle, memory, vid, txt, vid_mask, txt_mask):
        # `bundle` rides the engine's replicated head-params slot; it may
        # carry the projected TAL class bank next to the actual params
        cls_tok = bundle.get("cls_tok")
        cls_mask = (
            None if cls_tok is None
            else jax.lax.stop_gradient(bundle["cls_mask"])
        )
        return model.apply(
            {"params": bundle["params"]},
            memory,
            vid,
            txt,
            vid_mask,
            txt_mask,
            cls_tok,
            cls_mask,
            method=UniVTG.heads,
            train=False,  # heads carry no dropout
        )

    def loss_fn(outputs, tg):
        gates = tg.get("gates") if use_gates else None
        ld = compute_losses(outputs, tg, weights, losses, gates)
        return ld["loss_overall"], ld

    def step(state: TrainState, model_inputs, targets, rng):
        if static_inputs:
            model_inputs = {**model_inputs, **static_inputs}
        model_inputs = dequantize_inputs(model_inputs)
        src_cls = model_inputs.get("src_cls")
        src_cls_mask = model_inputs.get("src_cls_mask")
        from univtg_tpu.train.steps import step_dropout_rngs

        pre_rng, drop_rng, path_rng = step_dropout_rngs(rng, state.step, 3)
        params = state.params
        pre_params = {k: params[k] for k in PRE_PARAM_KEYS if k in params}
        head_params = {k: params[k] for k in HEAD_PARAM_KEYS if k in params}
        stacked = params["encoder"]["layers"]["layer"]

        vid_mask = model_inputs["src_vid_mask"]
        txt_mask = model_inputs["src_txt_mask"]

        def pre_fn(p):
            return model.apply(
                {"params": p},
                model_inputs["src_txt"],
                txt_mask,
                model_inputs["src_vid"],
                vid_mask,
                src_cls,
                src_cls_mask,
                method=UniVTG.pre,
                train=True,
                rngs={"dropout": pre_rng},
            )

        (src, mask, pos, vid, txt, cls_tok), pre_vjp = jax.vjp(pre_fn, pre_params)
        heads_bundle = {"params": head_params}
        if cls_tok is not None:
            heads_bundle["cls_tok"] = cls_tok
            heads_bundle["cls_mask"] = src_cls_mask

        (
            loss,
            metrics,
            d_stacked,
            d_heads,
            d_src,
            d_pos,
            d_vid,
            d_txt,
        ) = pipeline_1f1b(
            stacked,
            heads_bundle,
            src,
            mask,
            pos,
            vid,
            txt,
            vid_mask,
            txt_mask,
            targets,
            layer=layer,
            heads_apply=heads_apply,
            loss_fn=loss_fn,
            n_micro=M,
            train=True,
            rng_dropout=drop_rng,
            rng_droppath=path_rng,
            need_pos_grad=cfg.use_txt_pos,
            interleave=cfg.pipeline_interleave,
            pre_permuted=cfg.pipeline_pre_permuted,
            collect_aux=collect_aux,
            aux_weight=weights.moe_aux,
        )
        if d_pos is None:
            d_pos = jnp.zeros_like(pos)
        d_cls = d_heads.get("cls_tok")  # None when no class bank rode along
        d_heads = d_heads["params"]
        (d_pre,) = pre_vjp(
            (d_src, jnp.zeros_like(mask), d_pos, d_vid, d_txt, d_cls)
        )

        # reassemble the full gradient tree: encoder stack from the engine,
        # pre/head subtrees from their vjps (token_type_embedding appears in
        # both phases -> cotangents add), anything else (none today) zero.
        grads = {}
        for k, p in params.items():
            if k == "encoder":
                grads[k] = {"layers": {"layer": d_stacked}}
            elif k in d_pre and k in d_heads:
                grads[k] = _tree_add(d_pre[k], d_heads[k])
            elif k in d_pre:
                grads[k] = d_pre[k]
            elif k in d_heads:
                grads[k] = d_heads[k]
            else:  # pragma: no cover - no such params in the current model
                grads[k] = jax.tree_util.tree_map(jnp.zeros_like, p)

        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_state = state.replace(
            params=new_params, opt_state=opt_state, step=state.step + 1
        )
        out = dict(metrics)
        out["loss_overall"] = loss
        out["grad_norm"] = optax.global_norm(grads)
        return new_state, out

    return jax.jit(step, donate_argnums=(0,) if donate else ())
