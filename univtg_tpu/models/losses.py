"""Grounding losses as pure jittable functions.

Mirrors the reference SetCriterion (model/univtg.py:157-351) with dense
per-clip supervision and no Hungarian matching (the reference builds a
matcher but never uses its assignment for UniVTG -- univtg.py:345).

All losses are mask-disciplined for static shapes: boolean-indexing in the
reference becomes multiply-by-mask + masked reductions here.

Extensions beyond the reference:
  * `gates` -- optional (B, 5) per-sample loss gate [b, g, f, s_intra,
    s_inter] for multi-corpus VLP batches mixing point/interval/curve
    supervision (the reference plumbs `weight_ablation` into targets at
    main/dataset.py:232-238 but never consumes it; here it actually gates).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from univtg_tpu.core.spans import giou_paired
from univtg_tpu.models.layers import mask_log, sim_matrix

TEMPERATURE = 0.07  # hard-coded in the reference (model/univtg.py:185)


def smooth_l1(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _safe_div(num, den):
    return num / jnp.maximum(den, 1.0)


# smallest normal f32: subnormals flush to zero on TPU, and log at an exact
# zero makes the clipped-BCE *backward* emit 0 * inf = NaN once sigmoid
# saturates (forward stays finite -- torch's fused BCE clamps its backward
# too, at -100; log(1e-37) ~= -85 differs only for p < 1e-37)
_BCE_FLOOR = 1e-37


def _bce_logs(probs):
    """NaN-safe (log p, log(1-p)) for probability-space BCE."""
    logp = jnp.log(jnp.clip(probs, _BCE_FLOOR, 1.0))
    log1mp = jnp.log(jnp.clip(1.0 - probs, _BCE_FLOOR, 1.0))
    return logp, log1mp


def loss_spans(outputs, targets, gates=None):
    """Boundary regression: smooth-L1 + GIoU on in-window clips
    (model/univtg.py:195-214)."""
    src_spans = targets["timestamp"] + outputs["pred_spans"]
    gt_spans = targets["span_labels_nn"]
    valid = targets["timestamp_window"].astype(src_spans.dtype)  # (B, Lv)
    if gates is not None:
        valid_b = valid * gates[:, None, 0]
        valid_g = valid * gates[:, None, 1]
    else:
        valid_b = valid_g = valid

    l1 = smooth_l1(src_spans, gt_spans) * valid_b[..., None]
    loss_b = _safe_div(l1.sum(), valid_b.sum())

    giou = giou_paired(src_spans, gt_spans)  # (B, Lv)
    loss_g = _safe_div(((1.0 - giou) * valid_g).sum(), valid_g.sum())
    return {"loss_b": loss_b, "loss_g": loss_g}


def loss_labels(outputs, targets, eos_coef: float = 0.1, gates=None):
    """Per-clip foreground BCE with background down-weighting
    (model/univtg.py:216-232)."""
    probs = outputs["pred_logits"][..., 0]  # sigmoid probabilities (B, Lv)
    mask = targets["timestamp_mask"].astype(probs.dtype)
    valid = targets["timestamp_window"].astype(probs.dtype)

    weights = mask * eos_coef + valid * (1.0 - eos_coef)
    logp, log1mp = _bce_logs(probs)
    ce = -(valid * logp + (1.0 - valid) * log1mp) * weights
    if gates is not None:
        ce = ce * gates[:, None, 2]
    return {"loss_f": _safe_div((ce * mask).sum(), mask.sum())}


def loss_saliency(outputs, targets, gates=None):
    """Inter-video InfoNCE + intra-video below-positive contrastive
    (model/univtg.py:235-282)."""
    sal = targets["saliency_scores"]  # (B, Lv) dense scores
    pos_idx = targets["saliency_pos_labels"]  # (B,) int
    if pos_idx.ndim == 2:
        pos_idx = pos_idx[:, 0]
    bsz = sal.shape[0]
    batch_idx = jnp.arange(bsz)

    vid_mem = outputs["vid_mem_proj"]  # (B, Lv, D)
    txt_feats = outputs["txt_mem_proj"][:, 0, :]  # (B, D)
    vid_feats = vid_mem[batch_idx, pos_idx]  # (B, D)

    # inter-video: positive clip vs the batch of sentences, both directions
    sim = sim_matrix(vid_feats, txt_feats)
    i_diag = jnp.diagonal(jax.nn.log_softmax(sim / TEMPERATURE, axis=1))
    j_diag = jnp.diagonal(jax.nn.log_softmax(sim.T / TEMPERATURE, axis=1))
    if gates is not None:
        g = gates[:, 4]
        inter = -_safe_div((i_diag * g).sum(), g.sum()) - _safe_div(
            (j_diag * g).sum(), g.sum()
        )
    else:
        inter = -i_diag.mean() - j_diag.mean()

    # intra-video: clips scoring below the sampled positive are in-softmax
    mask = targets["timestamp_mask"]
    selected = sal[batch_idx, pos_idx][:, None]  # (B, 1)
    below = (sal < selected).astype(mask.dtype)
    below = below.at[batch_idx, pos_idx].set(1.0)
    in_mask = below * mask

    sim_in = _cosine_rows(vid_mem, txt_feats[:, None, :])  # (B, Lv)
    sim_in = sim_in + mask_log(in_mask)
    logsm_i = jax.nn.log_softmax(sim_in / TEMPERATURE, axis=1)
    logsm_j = jax.nn.log_softmax(sim_in / TEMPERATURE, axis=0)
    pos_i = logsm_i[batch_idx, pos_idx]
    pos_j = logsm_j[batch_idx, pos_idx]
    if gates is not None:
        g = gates[:, 3]
        intra = -_safe_div((pos_i * g).sum(), g.sum()) - _safe_div(
            (pos_j * g).sum(), g.sum()
        )
    else:
        intra = -pos_i.mean() - pos_j.mean()

    # whole-batch zero saliency disables both terms (univtg.py:240-241)
    has_signal = (sal.sum() != 0).astype(inter.dtype)
    return {
        "loss_s_inter": inter * has_signal,
        "loss_s_intra": intra * has_signal,
    }


def loss_saliency_cls(outputs, targets, gates=None):
    """TAL-style saliency: inter-video InfoNCE + class-feature contrastive
    (model/univtg.py:284-326). Requires outputs['cls_mem_proj'] and
    targets['cls_idx'] (B, C) one/multi-hot."""
    sal = targets["saliency_scores"]
    pos_idx = targets["saliency_pos_labels"]
    if pos_idx.ndim == 2:
        pos_idx = pos_idx[:, 0]
    bsz = sal.shape[0]
    batch_idx = jnp.arange(bsz)

    vid_feats = outputs["vid_mem_proj"][batch_idx, pos_idx]
    txt_feats = outputs["txt_mem_proj"][:, 0, :]
    sim = sim_matrix(vid_feats, txt_feats)
    i_diag = jnp.diagonal(jax.nn.log_softmax(sim / TEMPERATURE, axis=1))
    j_diag = jnp.diagonal(jax.nn.log_softmax(sim.T / TEMPERATURE, axis=1))
    inter = -i_diag.mean() - j_diag.mean()

    out = {"loss_s_inter": inter}
    if "cls_idx" in targets:
        cls_idx = targets["cls_idx"].astype(sal.dtype)  # (B, C)
        cls_feats = outputs["cls_mem_proj"]  # (C, D) or (B, D)
        if cls_feats.ndim == 3:
            cls_feats = cls_feats[:, 0, :]
        sim_cls = sim_matrix(vid_feats, cls_feats)
        logsm = jax.nn.log_softmax(sim_cls / TEMPERATURE, axis=1)
        count = jnp.maximum(cls_idx.sum(), 1.0)
        out["loss_s_intra"] = -(logsm * cls_idx).sum() / count
    has_signal = (sal.sum() != 0).astype(inter.dtype)
    return {k: v * has_signal for k, v in out.items()}


def qfvs_losses(outputs, gt_grid, mask_flat):
    """QFVS criterion over the segment-flattened grid.

    Reference: model/univtg_qfvs.py:215-261, 358-377 -- the torch version
    masked_selects valid frames into a compact vector; here GT is scattered
    to grid positions host-side and everything stays static-shape.

    Args:
      outputs: model outputs with (S, F, 1) pred_logits / (S, F) saliency.
      gt_grid: (S*F,) binary concept/oracle labels at grid positions.
      mask_flat: (S*F,) validity of grid positions.
    Returns:
      {'loss_f', 'loss_s_intra', 'loss_s_inter'}.
    """
    probs = outputs["pred_logits"].reshape(-1)  # (S*F,)
    sal = outputs["saliency_scores"].reshape(-1)
    gt = gt_grid.astype(probs.dtype)
    mask = mask_flat.astype(probs.dtype)
    n_pos = gt.sum()

    # foreground BCE normalized by the positive count (univtg_qfvs.py:226-227)
    logp, log1mp = _bce_logs(probs)
    ce = -(gt * logp + (1.0 - gt) * log1mp) * mask
    loss_f = jnp.where(n_pos > 0, ce.sum() / jnp.maximum(n_pos, 1.0), 0.0)

    # MIL-NCE: softmax over all valid frames, positives in the numerator
    # (univtg_qfvs.py:246-261)
    logits = sal / TEMPERATURE + mask_log(mask)
    logsm = jax.nn.log_softmax(logits, axis=0)
    intra = -jnp.where(n_pos > 0, (logsm * gt).sum() / jnp.maximum(n_pos, 1.0), 0.0)

    return {"loss_f": loss_f, "loss_s_intra": intra, "loss_s_inter": jnp.zeros(())}


def compact_to_grid(vec_compact, seg_len, max_segments: int, max_frames: int):
    """Scatter a compact per-shot vector (shot i = i-th valid frame) onto the
    padded (S*F,) grid layout used by the flattened model inputs."""
    import numpy as np

    grid = np.zeros(max_segments * max_frames, np.float32)
    pos = 0
    for j, n in enumerate(np.asarray(seg_len, int)):
        grid[j * max_frames : j * max_frames + n] = vec_compact[pos : pos + n]
        pos += n
    return grid


def _cosine_rows(a, b, eps=1e-8):
    an = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    bn = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (an * bn)


import dataclasses


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss coefficient container (argparse *_loss_coef flags)."""

    b: float = 10.0
    g: float = 1.0
    f: float = 10.0
    s_intra: float = 0.1
    s_inter: float = 0.1
    eos_coef: float = 0.1
    # MoE load-balance aux coefficient (Switch Transformer default 1e-2);
    # only active when the model sows an aux loss (ModelConfig.moe_experts)
    moe_aux: float = 0.01

    def as_dict(self):
        return {
            "loss_b": self.b,
            "loss_g": self.g,
            "loss_f": self.f,
            "loss_s_intra": self.s_intra,
            "loss_s_inter": self.s_inter,
            "loss_moe_aux": self.moe_aux,
        }


def compute_losses(
    outputs,
    targets,
    weights: LossWeights,
    losses=("spans", "labels", "saliency"),
    gates: Optional[jnp.ndarray] = None,
):
    """Dispatch + weighted total. `losses` selection follows build_model
    (model/univtg.py:434-440): mr/vlp -> spans+labels+saliency (saliency_cls
    for TAL corpora), hl/vs -> labels+saliency."""
    out = {}
    if "spans" in losses:
        out.update(loss_spans(outputs, targets, gates))
    if "labels" in losses:
        out.update(loss_labels(outputs, targets, weights.eos_coef, gates))
    if "saliency" in losses:
        out.update(loss_saliency(outputs, targets, gates))
    if "saliency_cls" in losses:
        out.update(loss_saliency_cls(outputs, targets, gates))
    if "aux_moe" in outputs:
        out["loss_moe_aux"] = outputs["aux_moe"]
    wd = weights.as_dict()
    out["loss_overall"] = sum(v * wd[k] for k, v in out.items() if k in wd)
    return out
