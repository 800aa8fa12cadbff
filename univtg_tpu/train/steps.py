"""Jitted train/eval step factories.

One compiled program per (model config, batch shape): the host loop stays
dumb, everything hot -- forward, losses, backward, AdamW update, grad clip --
lives in a single XLA computation that SPMD-partitions over the mesh.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from univtg_tpu.models.losses import LossWeights, compute_losses


class TrainState(struct.PyTreeNode):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(schedule, weight_decay=1e-4, grad_clip=0.1):
    """AdamW + global-norm clip (main/config.py:350, train_mr.py:61-66:
    torch clips before step with max_norm=grad_clip)."""
    tx = [optax.clip_by_global_norm(grad_clip)] if grad_clip > 0 else []
    tx.append(
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    )
    return optax.chain(*tx)


def init_state(model, cfg, optimizer, rng, batch_shapes=None):
    """Initialize params with dummy shapes and wrap in TrainState."""
    Lt = batch_shapes["Lt"] if batch_shapes else cfg.max_q_l
    Lv = batch_shapes["Lv"] if batch_shapes else cfg.max_v_l
    txt = jnp.zeros((2, Lt, cfg.txt_dim), jnp.float32)
    vid = jnp.zeros((2, Lv, cfg.vid_dim), jnp.float32)
    variables = model.init(
        rng, txt, jnp.ones((2, Lt)), vid, jnp.ones((2, Lv)), train=False
    )
    params = variables["params"]
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def step_dropout_rngs(rng, step, n: int = 2):
    """Per-step dropout/droppath keys with hardware-RBG bit generation.

    Key DERIVATION (fold_in on the step counter + split) stays on the
    default threefry stream, but the returned keys are re-wrapped as
    'rbg'-impl keys, so every jax.random draw inside the jitted step (the
    nn.Dropout masks, attention dropout, droppath coin flips) uses the
    TPU's hardware RngBitGenerator instead of in-MXU threefry: measured
    7.8% faster full train steps at the flagship shape (56.93 vs 61.35
    ms/step at B=256, docs/PERF.md "PRNG"). Mask DISTRIBUTION is
    identical; the exact bits differ from the threefry stream (and may
    differ across backends/compiler versions) -- the standard dropout
    contract. Parameter initialization and all host-side sampling are
    untouched (this function is the ONLY place the impl changes)."""
    keys = jax.random.split(jax.random.fold_in(rng, step), n)

    def as_rbg(k):
        data = (
            jax.random.key_data(k)
            if jnp.issubdtype(k.dtype, jax.dtypes.prng_key)
            else k
        )
        return jax.random.wrap_key_data(
            jnp.tile(data, 2), impl="rbg"  # rbg keys are 4x uint32
        )

    return tuple(as_rbg(k) for k in keys)


def dequantize_inputs(model_inputs):
    """Reconstruct float features from (int8 q, per-token scale) pairs
    produced by data/collate.quantize_for_transfer (transfer_dtype='int8').
    Runs inside the jitted step, so the dequant fuses into the first input
    projection; no-op for float batches."""
    mi = dict(model_inputs)
    for key in ("src_txt", "src_vid"):
        q = mi.pop(key + "_q", None)
        if q is not None:
            scale = mi.pop(key + "_scale")
            mi[key] = q.astype(scale.dtype) * scale[..., None]
    return mi


def forward(model, params, model_inputs, *, train=False, rngs=None):
    model_inputs = dequantize_inputs(model_inputs)
    args = [
        model_inputs["src_txt"],
        model_inputs["src_txt_mask"],
        model_inputs["src_vid"],
        model_inputs["src_vid_mask"],
    ]
    if model_inputs.get("src_cls") is not None:
        args += [model_inputs["src_cls"], model_inputs["src_cls_mask"]]
    if train and getattr(getattr(model, "cfg", None), "moe_experts", 0) > 1:
        # MoE layers sow their load-balance aux loss into "intermediates"
        # (models/encoder.py); surface the layer-mean as outputs["aux_moe"]
        # so compute_losses can weight it (LossWeights.moe_aux)
        outputs, ivars = model.apply(
            {"params": params}, *args, train=train, rngs=rngs,
            mutable=["intermediates"],
        )
        aux = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(ivars)[0]
            if any(getattr(p, "key", None) == "moe_aux" for p in path)
        ]
        if aux:
            outputs["aux_moe"] = sum(jnp.mean(a) for a in aux) / len(aux)
        return outputs
    return model.apply({"params": params}, *args, train=train, rngs=rngs)


def make_train_step(
    model,
    optimizer,
    weights: LossWeights,
    losses: Sequence[str] = ("spans", "labels", "saliency"),
    use_gates: bool = False,
    donate: bool = True,
    static_inputs=None,
):
    """Returns jitted (state, model_inputs, targets, rng) -> (state, metrics).

    static_inputs: extra model inputs constant across steps -- e.g. the
    dataset-level class-feature bank {src_cls, src_cls_mask} for TAL-style
    pretraining (the reference plumbs it per-epoch, main/train_vlp.py:116-119).
    """

    def step(state: TrainState, model_inputs, targets, rng):
        drop_rng, path_rng = step_dropout_rngs(rng, state.step)
        if static_inputs:
            model_inputs = {**model_inputs, **static_inputs}

        def loss_fn(params):
            outputs = forward(
                model,
                params,
                model_inputs,
                train=True,
                rngs={"dropout": drop_rng, "droppath": path_rng},
            )
            gates = targets.get("gates") if use_gates else None
            ld = compute_losses(outputs, targets, weights, losses, gates)
            return ld["loss_overall"], ld

        (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_scan_train_step(
    model,
    optimizer,
    weights: LossWeights,
    losses: Sequence[str] = ("spans", "labels", "saliency"),
    use_gates: bool = False,
):
    """Multi-step training in ONE device dispatch: lax.scan over K stacked
    batches. Amortizes host->device dispatch latency (dominant on tunneled
    or small-model setups) K-fold; the K axis is staged to device once.

    Returns jitted (state, stacked_model_inputs, stacked_targets, rng) ->
    (state, stacked_metrics) where every array leaf has a leading K axis.
    """

    def one_step(state, model_inputs, targets, rng):
        drop_rng, path_rng = step_dropout_rngs(rng, state.step)

        def loss_fn(params):
            outputs = forward(
                model,
                params,
                model_inputs,
                train=True,
                rngs={"dropout": drop_rng, "droppath": path_rng},
            )
            gates = targets.get("gates") if use_gates else None
            ld = compute_losses(outputs, targets, weights, losses, gates)
            return ld["loss_overall"], ld

        (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state, step=state.step + 1), loss_dict

    def scan_step(state: TrainState, stacked_inputs, stacked_targets, rng):
        def body(state, per_step):
            mi, tg = per_step
            state, metrics = one_step(state, mi, tg, rng)
            return state, metrics

        return jax.lax.scan(body, state, (stacked_inputs, stacked_targets))

    return jax.jit(scan_step, donate_argnums=(0,))


def stack_batches(batches, transfer_dtype: str = "float32"):
    """List of K collated batches -> stacked (model_inputs, targets) pytrees
    with a leading K axis (meta is dropped). transfer_dtype applies the same
    host->device compression as the single-step path (driver_mr._strip_meta):
    'bfloat16' casts features, 'int8' quantizes per token (the scan body's
    forward() dequantizes on device)."""
    import numpy as np

    mis = [b["model_inputs"] for b in batches]
    if transfer_dtype == "int8":
        from univtg_tpu.data.collate import quantize_for_transfer

        mis = [quantize_for_transfer(mi) for mi in mis]
    elif transfer_dtype != "float32":
        import ml_dtypes

        dt = np.dtype(getattr(ml_dtypes, transfer_dtype, transfer_dtype))
        mis = [
            {k: (v.astype(dt) if k in ("src_txt", "src_vid") else v) for k, v in mi.items()}
            for mi in mis
        ]
    tgs = [b["targets"] for b in batches]
    stack = lambda *xs: np.stack(xs)
    return (
        jax.tree_util.tree_map(stack, *mis),
        jax.tree_util.tree_map(stack, *tgs),
    )


def make_md_train_step(model, optimizer, weights, eos_coef=0.1, saliency_margin=0.2,
                       donate: bool = True, span_loss_type: str = "l1"):
    """Moment-DETR train step: Hungarian matching + matched losses, aux
    decoder-layer terms weighted like their base losses
    (model/moment_detr.py weight_dict handling)."""
    import re

    from univtg_tpu.models.moment_detr import moment_detr_losses

    wd = weights.as_dict()

    def step(state: TrainState, model_inputs, targets, rng):
        drop_rng, path_rng = step_dropout_rngs(rng, state.step)

        def loss_fn(params):
            outputs = forward(
                model,
                params,
                model_inputs,
                train=True,
                rngs={"dropout": drop_rng, "droppath": path_rng},
            )
            ld = moment_detr_losses(
                outputs,
                targets,
                eos_coef=eos_coef,
                saliency_margin=saliency_margin,
                span_loss_type=span_loss_type,
            )
            total = sum(
                wd.get(re.sub(r"_\d+$", "", k), 0.0) * v for k, v in ld.items()
            )
            ld["loss_overall"] = total
            return total, ld

        (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_md_eval_step(model, span_loss_type: str = "l1", clip_length: float = 2.0):
    """Moment-DETR decode (main/inference_mr.py:109-115, 137-150):
    'l1' -> per-query softmax fg prob + cxw->xx normalized spans;
    'ce' -> argmax start/end clip indices -> absolute seconds, scores =
    product of the st/ed probabilities."""
    from univtg_tpu.core.spans import cxw_to_xx

    def step(params, model_inputs, targets):
        outputs = forward(model, params, model_inputs, train=False)
        saliency = outputs["saliency_scores"].astype(jnp.float16).astype(jnp.float32)
        mask = model_inputs["src_vid_mask"]
        if span_loss_type == "ce":
            B, Q, twoL = outputs["pred_spans"].shape
            L = twoL // 2
            sp = jax.nn.softmax(outputs["pred_spans"].reshape(B, Q, 2, L), axis=-1)
            scores = jnp.prod(jnp.max(sp, axis=-1), axis=-1)  # (B, Q)
            idx = jnp.argmax(sp, axis=-1).astype(jnp.float32)  # (B, Q, 2)
            # end index is inclusive -> +1 clip; absolute seconds
            spans = (idx + jnp.asarray([0.0, 1.0])) * clip_length
        else:
            scores = jax.nn.softmax(outputs["pred_logits"], axis=-1)[..., 0]
            spans = cxw_to_xx(outputs["pred_spans"])  # normalized
        return {
            "scores": scores,
            "spans": spans,
            "saliency": saliency,
            "valid_len": mask.sum(axis=1).astype(jnp.int32),
            "absolute_spans": jnp.asarray(span_loss_type == "ce"),
        }

    return jax.jit(step)


def decode_dense_outputs(outputs, vid_mask, timestamp, eval_mode: Optional[str]):
    """THE dense-regression decode (main/inference_mr.py:109-131), shared by
    batch evaluation (make_eval_step) and serving (serve/pipeline.py) so the
    two surfaces cannot drift:
      spans    = timestamp + predicted offsets       (normalized units)
      scores   = foreground probability, zeroed outside the valid length
      saliency = fp16-quantized saliency (parity with the reference's
                 .half() cast, inference_mr.py:134) (+ fg prob when
                 eval_mode == 'add')
    """
    prob = outputs["pred_logits"][..., 0]  # (B, Lv) sigmoid probs
    scores = prob * vid_mask
    spans = timestamp + outputs["pred_spans"]
    saliency = outputs["saliency_scores"].astype(jnp.float16).astype(jnp.float32)
    if eval_mode == "add":
        saliency = saliency + prob
    return {
        "scores": scores,
        "spans": spans,
        "saliency": saliency,
        "valid_len": vid_mask.sum(axis=1).astype(jnp.int32),
    }


def make_eval_step(model, eval_mode: Optional[str] = "add"):
    """Returns jitted (params, model_inputs, targets) -> decoded tensors
    via decode_dense_outputs. Host side only sorts/format-rounds per query.
    """

    def step(params, model_inputs, targets):
        outputs = forward(model, params, model_inputs, train=False)
        return decode_dense_outputs(
            outputs, model_inputs["src_vid_mask"], targets["timestamp"], eval_mode
        )

    return jax.jit(step)
