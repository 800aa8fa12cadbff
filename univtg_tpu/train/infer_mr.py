"""Moment-retrieval inference: batched jitted decode -> submission jsonl ->
metrics.

Pipeline parity with main/inference_mr.py:87-193:
  * device: forward + dense decode (spans = timestamp + offsets, fg scores,
    eval_mode 'add' saliency fusion, fp16 saliency quantization),
  * host: per-query duration scaling/clamping, stable score sort, 4-decimal
    rounding, optional round-to-clip-multiple post-processing and NMS,
  * metrics via the exact-parity evaluator (univtg_tpu/evals).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Optional

import numpy as np

from univtg_tpu.core.nms import temporal_nms
from univtg_tpu.evals import eval_submission
from univtg_tpu.evals.postprocessing import WindowPostProcessor
from univtg_tpu.train.steps import make_eval_step


def decode_batch(dev_out, meta, no_sort_results=False):
    """Device eval-step outputs + metadata -> submission rows."""
    scores = np.asarray(dev_out["scores"])
    spans = np.asarray(dev_out["spans"])
    saliency = np.asarray(dev_out["saliency"])
    valid_len = np.asarray(dev_out["valid_len"])
    # guard: a diverged model must score ~0, not exploit the evaluator's
    # NaN-comparison quirk (NaN IoU silently counts as a true positive in
    # the VOC loop -- the reference inherits the same quirk)
    if not np.isfinite(spans).all() or not np.isfinite(scores).all():
        import logging

        logging.getLogger(__name__).warning(
            "non-finite predictions in decode; sanitizing to zeros"
        )
        spans = np.nan_to_num(spans, nan=0.0, posinf=0.0, neginf=0.0)
        scores = np.nan_to_num(scores, nan=0.0, posinf=0.0, neginf=0.0)
        saliency = np.nan_to_num(saliency, nan=0.0, posinf=0.0, neginf=0.0)
    # 'ce' decode emits absolute seconds; 'l1' emits duration-normalized
    absolute = bool(np.asarray(dev_out.get("absolute_spans", False)))

    rows = []
    for i, m in enumerate(meta):
        dur = float(m["duration"])
        sp = np.clip(spans[i] if absolute else spans[i] * dur, 0, dur)
        sc = scores[i]
        ranked = np.concatenate([sp, sc[:, None]], axis=1)
        if not no_sort_results:
            order = np.argsort(-ranked[:, 2], kind="stable")
            ranked = ranked[order]
        windows = [[float(f"{v:.4f}") for v in row] for row in ranked]
        rows.append(
            {
                "qid": m["qid"],
                "query": m["query"],
                "vid": m["vid"],
                "pred_relevant_windows": windows,
                "pred_saliency_scores": saliency[i, : int(valid_len[i])].tolist(),
            }
        )
    return rows


def run_inference(
    model,
    params,
    loader,
    *,
    eval_mode: Optional[str] = "add",
    clip_length: float = 2.0,
    round_multiple: int = 1,
    no_sort_results: bool = False,
    eval_step=None,
    transfer_dtype: str = "float32",
):
    """Run the jitted eval step over a loader; returns submission rows.

    transfer_dtype='int8' quantizes input features host-side to cut the
    host->device transfer 4x (data/collate.quantize_for_transfer); the
    jitted step dequantizes on device.
    """
    if eval_step is None:
        eval_step = make_eval_step(model, eval_mode)
    submission = []
    for batch in loader:
        model_inputs = batch["model_inputs"]
        if transfer_dtype == "int8":
            from univtg_tpu.data.collate import quantize_for_transfer

            model_inputs = quantize_for_transfer(model_inputs)
        elif transfer_dtype != "float32":
            import ml_dtypes

            dt = np.dtype(getattr(ml_dtypes, transfer_dtype, transfer_dtype))
            model_inputs = {
                k: (v.astype(dt) if k in ("src_txt", "src_vid") else v)
                for k, v in model_inputs.items()
            }
        dev_out = eval_step(params, model_inputs, batch["targets"])
        submission.extend(decode_batch(dev_out, batch["meta"], no_sort_results))
    if round_multiple > 0:
        post = WindowPostProcessor(
            clip_length=clip_length, process_func_names=("round_multiple",)
        )
        submission = post(submission)
    return submission


def apply_nms(submission, nms_thd, max_before_nms=10, max_after_nms=10):
    """Per-query temporal NMS (main/inference_mr.py:31-40)."""
    out = []
    for row in submission:
        row = dict(row)
        row["pred_relevant_windows"] = temporal_nms(
            row["pred_relevant_windows"][:max_before_nms],
            nms_thd=nms_thd,
            max_after_nms=max_after_nms,
        )
        out.append(row)
    return out


def evaluate_submission(submission, gt_data, num_workers=8):
    return eval_submission(
        submission, gt_data, verbose=False, match_number=True, num_workers=num_workers
    )
