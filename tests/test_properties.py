"""Property-based invariants for span algebra, NMS, and AP kernels."""
import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from univtg_tpu.core import spans
from univtg_tpu.core.nms import temporal_nms
from univtg_tpu.evals.ap import average_precision, detection_ap


def ordered_spans(n_max=16):
    return st.lists(
        st.tuples(
            st.floats(0, 100, width=32),
            st.floats(0.125, 50, width=32),
        ),
        min_size=1,
        max_size=n_max,
    ).map(lambda rows: np.asarray([[s, s + w] for s, w in rows], np.float64))


@settings(max_examples=50, deadline=None)
@given(ordered_spans())
def test_cxw_roundtrip(s):
    back = np.asarray(spans.cxw_to_xx(spans.xx_to_cxw(jnp.asarray(s))))
    np.testing.assert_allclose(back, s, atol=1e-4)


@settings(max_examples=50, deadline=None)
@given(ordered_spans(8), ordered_spans(8))
def test_iou_bounds_and_symmetry(a, b):
    iou, _ = spans.iou_cross_safe(jnp.asarray(a), jnp.asarray(b))
    iou = np.asarray(iou)
    assert (iou >= -1e-9).all() and (iou <= 1 + 1e-6).all()
    iou_t, _ = spans.iou_cross_safe(jnp.asarray(b), jnp.asarray(a))
    np.testing.assert_allclose(iou, np.asarray(iou_t).T, atol=1e-6)
    # GIoU <= IoU, GIoU in [-1, 1]
    giou = np.asarray(spans.giou_cross(jnp.asarray(a), jnp.asarray(b)))
    assert (giou <= iou + 1e-6).all()
    assert (giou >= -1 - 1e-6).all()


@settings(max_examples=40, deadline=None)
@given(
    ordered_spans(24),
    st.floats(0.05, 0.95),
)
def test_nms_invariants(s, thd):
    rng = np.random.default_rng(0)
    scores = rng.uniform(0, 1, len(s))
    preds = np.concatenate([s, scores[:, None]], 1)
    kept = np.asarray(temporal_nms(preds, thd, max_after_nms=10))
    # scores non-increasing, count bounded, every kept row was an input
    assert len(kept) <= min(10, len(s))
    assert (np.diff(kept[:, 2]) <= 1e-12).all()
    for row in kept:
        assert any(np.allclose(row, p) for p in preds)


@settings(max_examples=30, deadline=None)
@given(ordered_spans(4), ordered_spans(10))
def test_detection_ap_bounds(gt, pred):
    scores = np.linspace(1, 0, len(pred))
    ap = detection_ap(gt, pred, scores)
    assert (ap >= 0).all() and (ap <= 1 + 1e-9).all()
    # perfect predictions at threshold 0.5 achieve AP 1 when preds == gts
    ap_perfect = detection_ap(gt, gt, np.linspace(1, 0.5, len(gt)))
    assert ap_perfect[0] == 1.0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 1), min_size=2, max_size=64))
def test_average_precision_bounds(labels):
    y = np.asarray(labels)
    scores = np.linspace(1, 0, len(y))
    ap = average_precision(y, scores)
    assert 0 <= ap <= 1 + 1e-9
    # ranking all positives first is optimal
    ideal = np.sort(y)[::-1]
    assert average_precision(ideal, scores) >= ap - 1e-9
