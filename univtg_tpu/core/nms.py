"""Temporal non-maximum suppression.

Two implementations with identical greedy semantics:

  * `temporal_nms` -- host-side numpy, vectorized suppression per kept box
    (the reference's O(N^2) Python list-popping loop in
    /root/reference/utils/temporal_nms.py:25-74 reduces to standard greedy
    NMS under hull-IoU with a strict `>` threshold and a keep cap; proven by
    tests/test_nms.py against that exact algorithm).
  * `temporal_nms_jax` -- fixed-shape jnp variant usable inside jit: returns
    a keep mask over a static number of candidates via lax.fori_loop.

The IoU used here is intersection over the enclosing hull (the reference's
"not the correct union" comment, utils/temporal_nms.py:18) -- kept for exact
metric parity.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _hull_iou_1_vs_many(span, spans):
    inter = np.maximum(
        0.0, np.minimum(span[1], spans[:, 1]) - np.maximum(span[0], spans[:, 0])
    )
    hull = np.maximum(span[1], spans[:, 1]) - np.minimum(span[0], spans[:, 0])
    out = np.zeros_like(inter)
    np.divide(inter, hull, out=out, where=hull != 0)
    return out


def temporal_nms(predictions, nms_thd, max_after_nms=100):
    """Greedy NMS over scored windows.

    Args:
      predictions: list of [st, ed, score] (or (N, 3) array). Larger score is
        better.
      nms_thd: hull-IoU threshold; candidates with IoU strictly greater than
        this vs an already-kept window are suppressed.
      max_after_nms: keep at most this many windows.

    Returns:
      list of [st, ed, score] kept windows in descending score order.
    """
    preds = np.asarray(predictions, dtype=np.float64).reshape(-1, 3)
    if len(preds) <= 1:
        return [list(map(float, p)) for p in preds]

    order = np.argsort(-preds[:, 2], kind="stable")
    preds = preds[order]
    alive = np.ones(len(preds), dtype=bool)
    keep = []
    for i in range(len(preds)):
        if not alive[i]:
            continue
        keep.append(i)
        if len(keep) >= max_after_nms:
            break
        ious = _hull_iou_1_vs_many(preds[i, :2], preds[:, :2])
        alive &= ~(ious > nms_thd)
        alive[i] = False
    return [[float(preds[i, 0]), float(preds[i, 1]), float(preds[i, 2])] for i in keep]


def temporal_nms_jax(spans, scores, nms_thd, max_keep):
    """Fixed-shape greedy NMS inside jit.

    Args:
      spans: (N, 2) xx windows. scores: (N,). Invalid candidates should carry
        score -inf. nms_thd: python float. max_keep: python int.

    Returns:
      (keep_idx, keep_mask): (max_keep,) indices into the input (ordered by
      score) and a validity mask. Suppressed/exhausted slots have mask False.
    """
    n = spans.shape[0]

    inter = jnp.clip(
        jnp.minimum(spans[:, None, 1], spans[None, :, 1])
        - jnp.maximum(spans[:, None, 0], spans[None, :, 0]),
        0,
        None,
    )
    hull = jnp.maximum(spans[:, None, 1], spans[None, :, 1]) - jnp.minimum(
        spans[:, None, 0], spans[None, :, 0]
    )
    iou = jnp.where(hull != 0, inter / jnp.where(hull != 0, hull, 1.0), 0.0)
    suppress = iou > nms_thd  # (N, N)

    def body(k, state):
        alive, keep_idx, keep_mask = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        keep_idx = keep_idx.at[k].set(jnp.where(ok, best, -1))
        keep_mask = keep_mask.at[k].set(ok)
        alive = alive & ~suppress[best] & ok
        alive = alive.at[best].set(False)
        return alive, keep_idx, keep_mask

    init = (
        jnp.isfinite(scores),
        jnp.full((max_keep,), -1, dtype=jnp.int32),
        jnp.zeros((max_keep,), dtype=bool),
    )
    _, keep_idx, keep_mask = jax.lax.fori_loop(0, max_keep, body, init)
    return keep_idx, keep_mask
