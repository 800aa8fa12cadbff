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


def test_cli_train_and_quantize_end_to_end(tmp_path):
    """Whole CLI training path on synthetic data via dotted overrides, then
    int8 checkpoint conversion."""
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus

    corpus = create_synthetic_mr_corpus(str(tmp_path / "c"), n_train=12, n_val=6, seed=23)
    results = str(tmp_path / "run")
    overrides = [
        f"train_data.data_path={corpus['train_path']}",
        f"eval_data.data_path={corpus['val_path']}",
        f"train_data.v_feat_dirs=('{corpus['v_feat_dirs'][0]}',)",
        f"eval_data.v_feat_dirs=('{corpus['v_feat_dirs'][0]}',)",
        f"train_data.q_feat_dir={corpus['q_feat_dir']}",
        f"eval_data.q_feat_dir={corpus['q_feat_dir']}",
        f"train_data.q_feat_dim={corpus['q_dim']}",
        f"eval_data.q_feat_dim={corpus['q_dim']}",
        f"train_data.max_q_l=10", f"eval_data.max_q_l=10",
        f"model.vid_dim={corpus['v_dim'] + 2}",
        f"model.txt_dim={corpus['q_dim']}",
        "model.hidden_dim=32", "model.num_layers=1", "model.num_heads=4",
        "model.ffn_dim=48", "model.input_dropout=0.1",
        f"results_dir={results}",
        "bsz=6", "eval_bsz=6", "n_epoch=1", "eval_epoch=1", "lr_warmup=1",
        "save_interval=-1", "dp=1", "nms_thd=-1.0",
    ]
    env = {
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "train-mr", "--preset", "qvhighlights_mr"]
        + overrides,
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "MR-full-mAP-key" in result.stdout
    import os

    best = os.path.join(results, "model_best.ckpt")
    assert os.path.exists(best)

    q_out = str(tmp_path / "model_int8.ckpt")
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "quantize", "--preset",
         "qvhighlights_mr", "--resume", best, "--out", q_out]
        + [o for o in overrides if o.startswith("model.")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert os.path.exists(q_out)


def test_cli_infer_mr(tmp_path):
    """infer-mr subprocess path: eval-only run from a fresh checkpoint."""
    import os

    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus

    corpus = create_synthetic_mr_corpus(str(tmp_path / "c"), n_train=6, n_val=6, seed=29)
    results = str(tmp_path / "run")
    overrides = [
        f"train_data.data_path={corpus['train_path']}",
        f"eval_data.data_path={corpus['val_path']}",
        f"train_data.v_feat_dirs=('{corpus['v_feat_dirs'][0]}',)",
        f"eval_data.v_feat_dirs=('{corpus['v_feat_dirs'][0]}',)",
        f"train_data.q_feat_dir={corpus['q_feat_dir']}",
        f"eval_data.q_feat_dir={corpus['q_feat_dir']}",
        f"train_data.q_feat_dim={corpus['q_dim']}",
        f"eval_data.q_feat_dim={corpus['q_dim']}",
        "train_data.max_q_l=10", "eval_data.max_q_l=10",
        f"model.vid_dim={corpus['v_dim'] + 2}",
        f"model.txt_dim={corpus['q_dim']}",
        "model.hidden_dim=32", "model.num_layers=1", "model.num_heads=4",
        "model.ffn_dim=48", "model.input_dropout=0.1",
        f"results_dir={results}",
        "bsz=6", "eval_bsz=6", "n_epoch=1", "eval_epoch=1", "lr_warmup=1",
        "save_interval=-1", "dp=1", "nms_thd=-1.0",
    ]
    env = {
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    run = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "train-mr", "--preset", "qvhighlights_mr"]
        + overrides,
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    best = os.path.join(results, "model_best.ckpt")

    out_jsonl = str(tmp_path / "preds.jsonl")
    run = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "infer-mr", "--preset",
         "qvhighlights_mr", "--resume", best, "--out", out_jsonl] + overrides,
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    assert "MR-full-mAP-key" in run.stdout
    rows = [json.loads(l) for l in open(out_jsonl)]
    assert len(rows) == 6 and "pred_relevant_windows" in rows[0]


def test_cli_train_hl_end_to_end(tmp_path):
    """CLI wiring for the HL driver: synthetic TVSum-style corpus through
    `train-hl` with dotted overrides; per-domain + AVG mAP on stdout."""
    from univtg_tpu.data.synthetic import create_synthetic_hl_corpus

    corpus = create_synthetic_hl_corpus(
        str(tmp_path / "hl"), dset_name="tvsum", n_train=6, n_val=3
    )
    overrides = [
        f"data.anno_path={corpus['anno_path']}",
        f"data.splits_path={corpus['splits_path']}",
        f"data.v_feat_dirs={tuple(corpus['v_feat_dirs'])}",
        f"data.q_feat_dir={corpus['q_feat_dir']}",
        f"data.q_feat_dim={corpus['q_dim']}",
        f"data.max_v_l={corpus['max_clips']}",
        "data.max_q_l=8",
        f"model.vid_dim={corpus['v_dim'] + 2}",
        f"model.txt_dim={corpus['q_dim']}",
        "model.hidden_dim=32", "model.num_layers=1", "model.num_heads=4",
        "model.ffn_dim=48", "model.input_dropout=0.1",
        f"model.max_v_l={corpus['max_clips']}", "model.max_q_l=8",
        "domains=('SYN',)",
        f"results_dir={tmp_path / 'hl_run'}",
        "bsz=4", "eval_bsz=4", "n_epoch=1", "eval_epoch=1", "lr_warmup=1",
        "dp=1", "tp=1",
    ]
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "train-hl", "--preset",
         "tvsum_hl"] + overrides,
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    scores = json.loads(result.stdout[result.stdout.index("{"):])
    assert "SYN" in scores and "AVG" in scores

    # eval-only re-run from the per-domain checkpoints (infer-hl wiring)
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "infer-hl", "--preset",
         "tvsum_hl", "--ckpt-dir", str(tmp_path / "hl_run")] + overrides,
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    rescores = json.loads(result.stdout[result.stdout.index("{"):])
    assert rescores["SYN"] == pytest.approx(scores["SYN"], abs=1e-6)


def test_cli_pack_h5(tmp_path):
    """CLI wiring for the h5 packer over a synthetic MR corpus."""
    import os

    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus

    corpus = create_synthetic_mr_corpus(
        str(tmp_path / "c"), n_train=4, n_val=2, seed=3
    )
    out_dir = str(tmp_path / "h5")
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "pack-h5",
         "--metadata", corpus["train_path"],
         "--v-feat-dirs", corpus["v_feat_dirs"][0],
         "--q-feat-dir", corpus["q_feat_dir"],
         "--out-dir", out_dir],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    files = os.listdir(out_dir)
    assert any(f.endswith(".hdf5") for f in files), files


def test_cli_train_qfvs_end_to_end(tmp_path):
    """CLI wiring for the QFVS driver: synthetic UT-Ego-style corpus +
    synthetic Tags.mat through `train-qfvs`; per-split F1 on stdout."""
    from univtg_tpu.data.synthetic import create_synthetic_qfvs_corpus

    corpus = create_synthetic_qfvs_corpus(str(tmp_path / "qfvs"))
    overrides = [
        f"data.root={corpus['root']}",
        "data.max_segment_num=4", "data.max_frame_num=16",
        "data.train_videos=(1,2,3)",
        f"tags_mat_path={corpus['tags_mat_path']}",
        "model.vid_dim=34", "model.txt_dim=16", "model.hidden_dim=32",
        "model.num_layers=1", "model.num_heads=4", "model.ffn_dim=48",
        "model.input_dropout=0.1", "model.max_v_l=16", "model.max_q_l=8",
        "max_q_l=8",
        f"results_dir={tmp_path / 'run'}",
        "n_epoch=1", "eval_epoch=1", "splits=((2,3,4),)",
    ]
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "train-qfvs", "--preset",
         "qfvs"] + overrides,
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    scores = json.loads(result.stdout[result.stdout.index("{"):])
    assert "V1" in scores and "F" in scores["V1"]

    # eval-only re-run from the split checkpoints (infer-qfvs wiring)
    result = subprocess.run(
        [sys.executable, "-m", "univtg_tpu.cli", "infer-qfvs", "--preset",
         "qfvs", "--ckpt-dir", str(tmp_path / "run")] + overrides,
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    rescores = json.loads(result.stdout[result.stdout.index("{"):])
    assert rescores["V1"]["F"] == pytest.approx(scores["V1"]["F"], abs=1e-6)
