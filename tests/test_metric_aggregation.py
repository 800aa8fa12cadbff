"""Epoch metrics in train_log.jsonl must be EXACT per-epoch means over every
training step (the reference's AverageMeter semantics, main/train_mr.py:36-49)
— in both the per-batch path and the lax.scan multi-step path (where round 1
recorded only the last scan step)."""
import json
import os

import numpy as np
import pytest

import univtg_tpu.train.driver_mr as driver_mr
from tests.test_train_e2e import make_cfg
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return create_synthetic_mr_corpus(
        str(tmp_path_factory.mktemp("agg")), n_train=40, n_val=8, seed=11
    )


def _run_and_collect(corpus, results_dir, monkeypatch, **cfg_kw):
    """Train while independently recording every step's metrics host-side."""
    recorded = []  # flat list of per-step host metric dicts, in order

    real_train = driver_mr.make_train_step
    real_scan = None

    def spy_train_step(*a, **kw):
        step = real_train(*a, **kw)

        def wrapped(state, mi, tg, rng):
            state, metrics = step(state, mi, tg, rng)
            recorded.append({k: float(np.asarray(v)) for k, v in metrics.items()})
            return state, metrics

        return wrapped

    monkeypatch.setattr(driver_mr, "make_train_step", spy_train_step)

    import univtg_tpu.train.steps as steps_mod

    real_scan = steps_mod.make_scan_train_step

    def spy_scan_step(*a, **kw):
        step = real_scan(*a, **kw)

        def wrapped(state, mi, tg, rng):
            state, metrics = step(state, mi, tg, rng)
            host = {k: np.asarray(v) for k, v in metrics.items()}
            k0 = next(iter(host))
            for i in range(host[k0].shape[0]):
                recorded.append({k: float(v[i]) for k, v in host.items()})
            return state, metrics

        return wrapped

    monkeypatch.setattr(steps_mod, "make_scan_train_step", spy_scan_step)

    import dataclasses

    cfg = make_cfg(corpus, results_dir, **cfg_kw)
    cfg = dataclasses.replace(cfg, n_epoch=2, eval_epoch=5)
    driver_mr.train_mr(cfg)
    lines = [
        json.loads(l)
        for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))
    ]
    return recorded, lines


def _check_exact_means(recorded, lines):
    i = 0
    assert lines, "no train_log lines"
    for line in lines:
        steps = line["steps"]
        chunk = recorded[i : i + steps]
        i += steps
        assert len(chunk) == steps
        for key in ("loss_overall", "loss_f", "grad_norm"):
            have = [m[key] for m in chunk if key in m]
            if not have:
                continue
            want = float(np.mean(have))
            assert line[key] == pytest.approx(want, rel=1e-6), (
                key,
                line[key],
                want,
            )
    assert i == len(recorded)


def test_epoch_means_exact_per_batch_path(corpus, tmp_path, monkeypatch):
    recorded, lines = _run_and_collect(corpus, str(tmp_path / "r1"), monkeypatch)
    assert lines[0]["steps"] == 3  # 40/16 -> 3 batches
    _check_exact_means(recorded, lines)


def test_epoch_means_exact_scan_path(corpus, tmp_path, monkeypatch):
    # 3 batches/epoch with scan_steps=2 -> one scan group of 2 + 1 remainder
    recorded, lines = _run_and_collect(
        corpus, str(tmp_path / "r2"), monkeypatch, scan_steps=2
    )
    assert lines[0]["steps"] == 3
    _check_exact_means(recorded, lines)
