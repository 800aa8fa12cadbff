"""NMS parity: our vectorized greedy NMS must reproduce the reference's
list-popping algorithm (utils/temporal_nms.py) on randomized inputs, and the
fixed-shape jnp variant must agree with the numpy one."""
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from univtg_tpu.core.nms import temporal_nms, temporal_nms_jax

sys.path.insert(0, "/root/reference")
from utils.temporal_nms import temporal_nms as ref_nms  # noqa: E402


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("thd", [0.3, 0.5, 0.7])
def test_matches_reference(seed, thd):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    st = rng.uniform(0, 100, n)
    dur = rng.uniform(1, 40, n)
    score = rng.uniform(0, 1, n)
    preds = [[float(s), float(s + d), float(sc)] for s, d, sc in zip(st, dur, score)]
    ours = temporal_nms(preds, nms_thd=thd, max_after_nms=10)
    theirs = ref_nms([list(p) for p in preds], nms_thd=thd, max_after_nms=10)
    np.testing.assert_allclose(np.array(ours), np.array(theirs), atol=1e-9)


def test_jax_variant_agrees():
    rng = np.random.default_rng(3)
    n = 32
    st = rng.uniform(0, 100, n)
    dur = rng.uniform(1, 40, n)
    score = rng.uniform(0, 1, n)
    spans = np.stack([st, st + dur], -1)
    keep_idx, keep_mask = temporal_nms_jax(
        jnp.array(spans), jnp.array(score), nms_thd=0.5, max_keep=10
    )
    keep_idx = np.asarray(keep_idx)[np.asarray(keep_mask)]
    got = [[spans[i, 0], spans[i, 1], score[i]] for i in keep_idx]
    want = temporal_nms(
        np.concatenate([spans, score[:, None]], -1), nms_thd=0.5, max_after_nms=10
    )
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-6)


def test_single_prediction_passthrough():
    assert temporal_nms([[0.0, 1.0, 0.5]], 0.5) == [[0.0, 1.0, 0.5]]
