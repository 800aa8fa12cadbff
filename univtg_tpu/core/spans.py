"""Temporal span algebra.

Pure jnp implementations usable both inside jit (static shapes, mask-safe)
and on host via numpy duck-typing: every function accepts either jnp or np
arrays and returns the same family.

Behavioral contract follows the reference span utilities
(/root/reference/utils/span_utils.py:6-122 and
/root/reference/eval/utils.py:17-63), re-derived here for broadcast-first,
assert-free, mask-safe semantics so they can be vmapped/fused by XLA.

Span formats:
  xx  -- (start, end)
  cxw -- (center, width)
All functions are shape-polymorphic over leading dims; the last dim is 2.
"""
from __future__ import annotations

import jax.numpy as jnp


def xx_to_cxw(spans):
    """(..., 2) xx -> cxw. Reference: utils/span_utils.py:6-24."""
    center = (spans[..., 0] + spans[..., 1]) * 0.5
    width = spans[..., 1] - spans[..., 0]
    return jnp.stack([center, width], axis=-1)


def cxw_to_xx(spans):
    """(..., 2) cxw -> xx. Reference: utils/span_utils.py:27-43."""
    x1 = spans[..., 0] - 0.5 * spans[..., 1]
    x2 = spans[..., 0] + 0.5 * spans[..., 1]
    return jnp.stack([x1, x2], axis=-1)


def iou_cross(spans1, spans2):
    """Pairwise temporal IoU.

    Args:
      spans1: (..., N, 2) xx spans.
      spans2: (..., M, 2) xx spans.
    Returns:
      (iou, union): each (..., N, M).

    Reference semantics: utils/span_utils.py:46-73 (division is left raw:
    0-width vs 0-width at same point yields nan there; we keep identical
    behavior for parity -- use `iou_cross_safe` when masking padded spans).
    """
    areas1 = spans1[..., 1] - spans1[..., 0]
    areas2 = spans2[..., 1] - spans2[..., 0]
    left = jnp.maximum(spans1[..., :, None, 0], spans2[..., None, :, 0])
    right = jnp.minimum(spans1[..., :, None, 1], spans2[..., None, :, 1])
    inter = jnp.clip(right - left, 0, None)
    union = areas1[..., :, None] + areas2[..., None, :] - inter
    return inter / union, union


def iou_cross_safe(spans1, spans2, eps=1e-12):
    """Pairwise IoU with zero-union guarded to 0 (mask-safe variant)."""
    iou, union = iou_cross(spans1, spans2)
    return jnp.where(union > eps, iou, 0.0), union


def iou_paired(spans1, spans2):
    """Element-wise IoU over aligned span arrays; 'union' here is the
    enclosing hull length, matching the reference's paired variant
    (eval/utils.py:17-33) used by R1/mIoU. Zero hull -> iou 0.
    """
    inter = jnp.clip(
        jnp.minimum(spans1[..., 1], spans2[..., 1])
        - jnp.maximum(spans1[..., 0], spans2[..., 0]),
        0,
        None,
    )
    hull = jnp.maximum(spans1[..., 1], spans2[..., 1]) - jnp.minimum(
        spans1[..., 0], spans2[..., 0]
    )
    return jnp.where(hull != 0, inter / jnp.where(hull != 0, hull, 1.0), 0.0)


def giou_cross(spans1, spans2):
    """Pairwise generalized temporal IoU (https://giou.stanford.edu/).

    Reference: utils/span_utils.py:93-122. No ordering asserts: callers must
    supply ordered spans (our span heads produce left<=right by construction).
    """
    iou, union = iou_cross(spans1, spans2)
    left = jnp.minimum(spans1[..., :, None, 0], spans2[..., None, :, 0])
    right = jnp.maximum(spans1[..., :, None, 1], spans2[..., None, :, 1])
    enclose = jnp.clip(right - left, 0, None)
    return iou - (enclose - union) / enclose


def giou_paired(spans1, spans2, eps=1e-12):
    """Element-wise generalized IoU over aligned spans (mask-safe).

    Equivalent to diag(giou_cross(a, b)) without materializing the NxM
    matrix; this is what the dense span loss needs
    (reference computes the matrix then takes the diagonal,
    model/univtg.py:209).
    """
    areas1 = spans1[..., 1] - spans1[..., 0]
    areas2 = spans2[..., 1] - spans2[..., 0]
    inter = jnp.clip(
        jnp.minimum(spans1[..., 1], spans2[..., 1])
        - jnp.maximum(spans1[..., 0], spans2[..., 0]),
        0,
        None,
    )
    union = areas1 + areas2 - inter
    iou = inter / jnp.where(jnp.abs(union) > eps, union, eps)
    enclose = jnp.clip(
        jnp.maximum(spans1[..., 1], spans2[..., 1])
        - jnp.minimum(spans1[..., 0], spans2[..., 0]),
        0,
        None,
    )
    enclose = jnp.where(jnp.abs(enclose) > eps, enclose, eps)
    return iou - (enclose - union) / enclose


def intersection_over_pred(gt_spans, pred_spans):
    """Intersection over the *prediction* span, pairwise.

    Args:
      gt_spans: (N, 2), pred_spans: (M, 2). Returns (N, M).
    Reference: utils/span_utils.py:76-90.
    """
    left = jnp.maximum(gt_spans[..., :, None, 0], pred_spans[..., None, :, 0])
    right = jnp.minimum(gt_spans[..., :, None, 1], pred_spans[..., None, :, 1])
    inter = jnp.clip(right - left, 0, None)
    return inter / (pred_spans[..., None, :, 1] - pred_spans[..., None, :, 0])
