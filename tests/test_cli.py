"""CLI + presets: offline scorer end-to-end, preset construction, overrides."""
import json
import subprocess
import sys

import pytest

from univtg_tpu.presets import PRESETS, qvhighlights_mr


def test_presets_build():
    for name, builder in PRESETS.items():
        cfg = builder()
        assert cfg.results_dir, name


def test_preset_overrides():
    cfg = qvhighlights_mr(**{"bsz": 16, "model.hidden_dim": 512})
    assert cfg.bsz == 16
    assert cfg.model.hidden_dim == 512
    with pytest.raises(AssertionError):
        qvhighlights_mr(**{"nonexistent_field": 1})


def test_cli_eval_scorer(tmp_path):
    out = tmp_path / "metrics.json"
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "univtg_tpu.cli",
            "eval",
            "--submission",
            "/root/reference/plot/qvhl/univtg.jsonl",
            "--gt",
            "/root/reference/plot/qvhl/gt.jsonl",
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    metrics = json.loads(out.read_text())
    assert metrics["brief"]["MR-full-mAP-key"] == 45.99
