"""Unit tests for the shared hot-loop runtime (train/epoch_runner.py):
transfer casting, the epoch loop with/without prefetch, and the one-window
StepProfiler semantics. The driver-level behavior is covered by the
MR/HL/QFVS e2e and knob tests; these pin the module's own contract."""
import os

import jax
import numpy as np
import pytest

from univtg_tpu.parallel import make_mesh
from univtg_tpu.train.epoch_runner import (
    StepProfiler,
    run_train_epoch,
    strip_meta,
)


def _batch(i, B=4, Lv=6, Lt=3):
    rng = np.random.default_rng(i)
    return {
        "model_inputs": {
            "src_txt": rng.standard_normal((B, Lt, 8)).astype(np.float32),
            "src_txt_mask": np.ones((B, Lt), np.float32),
            "src_vid": rng.standard_normal((B, Lv, 10)).astype(np.float32),
            "src_vid_mask": np.ones((B, Lv), np.float32),
        },
        "targets": {"y": np.full((B,), float(i), np.float32)},
        "meta": [{"qid": i}],  # stripped: never reaches the step
    }


def test_strip_meta_float32_passthrough():
    b = _batch(0)
    mi, tg = strip_meta(b)
    assert mi is b["model_inputs"] and tg is b["targets"]


def test_strip_meta_bf16_casts_features_only():
    import ml_dtypes

    mi, _ = strip_meta(_batch(0), "bfloat16")
    assert mi["src_txt"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert mi["src_vid"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert mi["src_txt_mask"].dtype == np.float32  # masks untouched


def test_strip_meta_int8_quantizes():
    mi, _ = strip_meta(_batch(0), "int8")
    assert "src_vid" not in mi and "src_vid_q" in mi
    assert mi["src_vid_q"].dtype == np.int8
    # dequant round-trips within int8 precision
    approx = mi["src_vid_q"].astype(np.float32) * mi["src_vid_scale"][..., None]
    np.testing.assert_allclose(
        approx, _batch(0)["model_inputs"]["src_vid"], atol=2e-2
    )


@pytest.mark.parametrize("prefetch_depth", [0, 2])
def test_run_train_epoch_order_and_count(prefetch_depth):
    """Both paths (direct and background-prefetch) consume every batch IN
    ORDER, strip meta, and invoke record once per step."""
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    batches = [_batch(i) for i in range(5)]
    seen, recorded = [], []

    def step(state, mi, tg, rng):
        assert "meta" not in mi
        seen.append(float(np.asarray(tg["y"])[0]))
        return state + 1, {"loss": float(np.asarray(tg["y"])[0])}

    state, n = run_train_epoch(
        batches, step, 0, None, mesh,
        prefetch_depth=prefetch_depth,
        record=lambda m: recorded.append(m["loss"]),
    )
    assert (state, n) == (5, 5)
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert recorded == seen


def test_step_profiler_one_window(tmp_path):
    """start -> after_step past the threshold -> stopped AND disabled: a
    second start() is a no-op (one trace window per run)."""
    d = str(tmp_path / "trace")
    p = StepProfiler(d, profile_steps=2)
    p.start()
    assert p._active
    p.after_step(1, np.zeros(()))  # below threshold: stays open
    assert p._active
    p.after_step(2, np.zeros(()))  # threshold reached: closes
    assert not p._active and not p.enabled
    p.start()  # one window per run
    assert not p._active
    assert os.path.isdir(d) and os.listdir(d)


def test_step_profiler_disabled_paths():
    p = StepProfiler("", profile_steps=5)  # no dir -> never active
    p.start()
    assert not p._active
    p.stop()  # no-op
    p = StepProfiler("/tmp/x", profile_steps=5, enabled=False)  # rank != 0
    p.start()
    assert not p._active
