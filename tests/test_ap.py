"""AP kernel parity: PR curve vs sklearn; get_ap and detection AP vs the
reference implementations on randomized inputs."""
import sys

import numpy as np
import pytest

from univtg_tpu.evals.ap import (
    average_precision,
    binary_pr_curve,
    detection_ap,
    interpolated_pr_auc,
)

sys.path.insert(0, "/root/reference")
from eval.utils import (  # noqa: E402
    compute_average_precision_detection as ref_detection_ap,
    get_ap as ref_get_ap,
    interpolated_precision_recall as ref_interp,
)


@pytest.mark.parametrize("seed", range(10))
def test_pr_curve_matches_sklearn(seed):
    from sklearn.metrics import precision_recall_curve

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 200))
    y_true = rng.integers(0, 2, n)
    if y_true.sum() == 0:
        y_true[0] = 1
    # quantize scores to force ties
    y_score = np.round(rng.uniform(0, 1, n), 2)
    p_ref, r_ref, _ = precision_recall_curve(y_true, y_score)
    p, r = binary_pr_curve(y_true, y_score)
    np.testing.assert_allclose(p, p_ref, atol=1e-12)
    np.testing.assert_allclose(r, r_ref, atol=1e-12)


@pytest.mark.parametrize("seed", range(10))
def test_get_ap_matches_reference(seed):
    rng = np.random.default_rng(seed + 100)
    n = int(rng.integers(3, 150))
    y_true = rng.integers(0, 2, n)
    y_score = np.round(rng.uniform(0, 1, n), 2)
    assert average_precision(y_true, y_score) == pytest.approx(
        ref_get_ap(y_true, y_score), abs=1e-12
    )


def test_get_ap_degenerate():
    assert average_precision([0, 0, 0], [0.1, 0.2, 0.3]) == 0
    assert average_precision([1, 1], [0.5, 0.1]) == 1


def test_interpolated_pr_auc_matches_reference(rng):
    prec = rng.uniform(0, 1, 20)
    rec = np.sort(rng.uniform(0, 1, 20))
    assert interpolated_pr_auc(prec, rec) == pytest.approx(
        ref_interp(prec.copy(), rec.copy()), abs=1e-12
    )


@pytest.mark.parametrize("seed", range(6))
def test_detection_ap_matches_reference(seed):
    rng = np.random.default_rng(seed + 7)
    n_gt = int(rng.integers(1, 5))
    n_pred = int(rng.integers(1, 12))
    gt_st = rng.uniform(0, 100, n_gt)
    gt = np.stack([gt_st, gt_st + rng.uniform(2, 50, n_gt)], -1)
    pr_st = rng.uniform(0, 100, n_pred)
    pr = np.stack([pr_st, pr_st + rng.uniform(2, 50, n_pred)], -1)
    scores = np.round(rng.uniform(0, 1, n_pred), 2)

    ref_gt = [{"video-id": "q", "t-start": s, "t-end": e} for s, e in gt]
    ref_pred = [
        {"video-id": "q", "t-start": s, "t-end": e, "score": sc}
        for (s, e), sc in zip(pr, scores)
    ]
    want = ref_detection_ap(ref_gt, ref_pred)
    got = detection_ap(gt, pr, scores)
    np.testing.assert_allclose(got, want, atol=1e-12)
