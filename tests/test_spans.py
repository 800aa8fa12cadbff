"""Span algebra unit tests against the reference doctest vectors
(utils/span_utils.py:13-20,32-39,55-61,106-110)."""
import numpy as np
import jax.numpy as jnp

from univtg_tpu.core import spans


def test_xx_to_cxw():
    s = jnp.array([[0.0, 1.0], [0.2, 0.4]])
    out = np.asarray(spans.xx_to_cxw(s))
    np.testing.assert_allclose(out, [[0.5, 1.0], [0.3, 0.2]], atol=1e-6)
    # leading batch dim
    out3 = np.asarray(spans.xx_to_cxw(s[None]))
    np.testing.assert_allclose(out3[0], out, atol=1e-6)


def test_cxw_to_xx_roundtrip():
    s = jnp.array([[0.5, 1.0], [0.3, 0.2]])
    out = np.asarray(spans.cxw_to_xx(s))
    np.testing.assert_allclose(out, [[0.0, 1.0], [0.2, 0.4]], atol=1e-6)
    rt = np.asarray(spans.xx_to_cxw(spans.cxw_to_xx(s)))
    np.testing.assert_allclose(rt, np.asarray(s), atol=1e-6)


def test_iou_cross():
    a = jnp.array([[0.0, 0.2], [0.5, 1.0]])
    b = jnp.array([[0.0, 0.3], [0.0, 1.0]])
    iou, union = spans.iou_cross(a, b)
    np.testing.assert_allclose(
        np.asarray(iou), [[0.6667, 0.2], [0.0, 0.5]], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(union), [[0.3, 1.0], [0.8, 1.0]], atol=1e-4
    )


def test_giou_cross():
    a = jnp.array([[0.0, 0.2], [0.5, 1.0]])
    b = jnp.array([[0.0, 0.3], [0.0, 1.0]])
    giou = np.asarray(spans.giou_cross(a, b))
    np.testing.assert_allclose(giou, [[0.6667, 0.2], [-0.2, 0.5]], atol=1e-4)


def test_giou_paired_matches_diag_of_cross(rng):
    starts = rng.uniform(0, 1, size=(64,))
    widths = rng.uniform(0.01, 0.5, size=(64,))
    a = np.stack([starts, starts + widths], -1)
    starts2 = rng.uniform(0, 1, size=(64,))
    widths2 = rng.uniform(0.01, 0.5, size=(64,))
    b = np.stack([starts2, starts2 + widths2], -1)
    full = np.asarray(spans.giou_cross(jnp.array(a), jnp.array(b)))
    paired = np.asarray(spans.giou_paired(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(np.diag(full), paired, atol=1e-5)


def test_iou_paired_hull_zero_guard():
    a = jnp.array([[0.0, 0.0]])
    b = jnp.array([[0.0, 0.0]])
    assert float(spans.iou_paired(a, b)[0]) == 0.0


def test_intersection_over_pred():
    gt = jnp.array([[0.0, 1.0]])
    pred = jnp.array([[0.5, 1.5], [2.0, 3.0]])
    out = np.asarray(spans.intersection_over_pred(gt, pred))
    np.testing.assert_allclose(out, [[0.5, 0.0]], atol=1e-6)
