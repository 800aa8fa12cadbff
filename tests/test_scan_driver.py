"""Driver-level scan training: scan_steps>1 trains correctly incl. the
remainder path."""
import json
import os

import pytest

from tests.test_train_e2e import make_cfg
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.train.driver_mr import train_mr


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return create_synthetic_mr_corpus(
        str(tmp_path_factory.mktemp("scan")), n_train=40, n_val=8, seed=9
    )


def test_scan_steps_driver(corpus, tmp_path):
    # 40 samples / bsz 16 = 3 batches per epoch -> one scan group of 2 + 1
    # remainder batch
    cfg = make_cfg(corpus, str(tmp_path / "run"), scan_steps=2)
    metrics, best = train_mr(cfg)
    assert os.path.exists(best)
    lines = [json.loads(l) for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))]
    assert lines[0]["steps"] == 3
    assert lines[-1]["loss_overall"] < lines[0]["loss_overall"] * 1.5
    assert "MR-full-mAP-key" in metrics["brief"]
