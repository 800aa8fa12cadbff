"""Native C++ AP kernel: build, parity vs numpy, and golden-metric parity."""
import json
import time

import numpy as np
import pytest

from univtg_tpu.evals.ap import detection_ap, detection_ap_batch
from univtg_tpu.native import load_ap_kernel


@pytest.fixture(scope="module")
def lib():
    lib = load_ap_kernel()
    if lib is None:
        pytest.skip("no g++ toolchain; numpy fallback covered elsewhere")
    return lib


def random_queries(n, seed=0):
    rng = np.random.default_rng(seed)
    gts, preds, scores = [], [], []
    for _ in range(n):
        n_gt = int(rng.integers(1, 5))
        n_pred = int(rng.integers(1, 12))
        gs = rng.uniform(0, 100, n_gt)
        gts.append(np.stack([gs, gs + rng.uniform(2, 50, n_gt)], -1))
        ps = rng.uniform(0, 100, n_pred)
        preds.append(np.stack([ps, ps + rng.uniform(2, 50, n_pred)], -1))
        scores.append(np.round(rng.uniform(0, 1, n_pred), 2))
    return gts, preds, scores


def test_native_matches_numpy(lib):
    gts, preds, scores = random_queries(60)
    got = detection_ap_batch(gts, preds, scores, n_threads=4)
    for i in range(len(gts)):
        want = detection_ap(gts[i], preds[i], scores[i])
        np.testing.assert_allclose(got[i], want, atol=1e-12, err_msg=str(i))


def test_native_empty_pred(lib):
    out = detection_ap_batch(
        [np.array([[0.0, 10.0]])], [np.zeros((0, 2))], [np.zeros(0)]
    )
    np.testing.assert_array_equal(out, 0.0)


def test_golden_mr_map_with_native_kernel(lib, qvhl_fixtures):
    """Full QVHighlights val mAP through the native kernel must reproduce the
    reference numbers exactly."""
    from univtg_tpu.evals.mr_metrics import compute_mr_ap

    pred, gt = qvhl_fixtures
    t0 = time.time()
    out = compute_mr_ap(pred, gt, num_workers=8)
    dt = time.time() - t0
    assert out["average"] == 45.99
    assert out["0.5"] == 65.6
    assert out["0.75"] == 47.73
    assert dt < 5.0, f"native AP too slow: {dt:.1f}s"
