"""int8 host->device feature transfer (TrainConfig.transfer_dtype='int8').

The transfer is the end-to-end training bottleneck on bandwidth-limited
links (docs/PERF.md "Training throughput"); int8 quantization of the
L2-normalized input features cuts it 4x vs float32 with ~0.3% RMS error.
"""
import numpy as np
import pytest

from univtg_tpu.data.collate import quantize_for_transfer
from univtg_tpu.train.steps import dequantize_inputs


def _l2n(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-5)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    mi = {
        "src_txt": _l2n(rng.standard_normal((4, 10, 64)).astype(np.float32)),
        "src_txt_mask": np.ones((4, 10), np.float32),
        "src_vid": _l2n(rng.standard_normal((4, 20, 128)).astype(np.float32)),
        "src_vid_mask": np.ones((4, 20), np.float32),
    }
    q = quantize_for_transfer(mi)
    assert q["src_vid_q"].dtype == np.int8
    assert q["src_vid_scale"].shape == (4, 20)
    assert "src_vid" not in q and "src_txt" not in q
    # masks pass through untouched
    np.testing.assert_array_equal(q["src_vid_mask"], mi["src_vid_mask"])

    deq = dequantize_inputs({k: np.asarray(v) for k, v in q.items()})
    for key in ("src_txt", "src_vid"):
        err = np.asarray(deq[key]) - mi[key]
        rms = np.sqrt((err**2).mean()) / np.sqrt((mi[key] ** 2).mean())
        assert rms < 0.01, (key, rms)
    assert set(deq) == set(mi)


def test_quantize_zero_rows_safe():
    mi = {
        "src_txt": np.zeros((2, 3, 8), np.float32),
        "src_vid": np.zeros((2, 4, 8), np.float32),
    }
    q = quantize_for_transfer(mi)
    assert np.isfinite(q["src_txt_scale"]).all()
    deq = dequantize_inputs(q)
    np.testing.assert_array_equal(np.asarray(deq["src_vid"]), mi["src_vid"])


def test_train_step_loss_matches_f32():
    """One jitted train step over quantized inputs stays within 1% of the
    float32-transfer loss (same weights, same rng)."""
    import jax

    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=1, num_heads=4,
        ffn_dim=48, max_v_l=16, max_q_l=8, droppath=0.0, input_dropout=0.0,
    )
    model = UniVTG(cfg)
    optimizer = make_optimizer(lambda s: 1e-4)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))

    B, Lv, Lt = 4, 16, 8
    rng = np.random.default_rng(1)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 3:8] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = 3 / Lv, 8 / Lv
    mi = {
        "src_txt": _l2n(rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32)),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": _l2n(rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32)),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    }
    tg = {
        "timestamp": ts,
        "timestamp_mask": np.ones((B, Lv), np.float32),
        "timestamp_window": window,
        "span_labels_nn": nn_sp,
        "saliency_scores": rng.uniform(0, 1, (B, Lv)).astype(np.float32),
        "saliency_pos_labels": np.full((B, 1), 4, np.int32),
    }
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    _, m_f32 = step(state, mi, tg, jax.random.PRNGKey(2))
    _, m_int8 = step(state, quantize_for_transfer(mi), tg, jax.random.PRNGKey(2))
    l0, l1 = float(m_f32["loss_overall"]), float(m_int8["loss_overall"])
    assert abs(l1 - l0) / abs(l0) < 0.01, (l0, l1)


def test_run_inference_int8_matches_f32():
    """Submission windows from int8-transferred features match f32 decode
    (rank-stable; scores shift < 1e-2)."""
    import jax

    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.train.infer_mr import run_inference

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=1, num_heads=4,
        ffn_dim=48, max_v_l=16, max_q_l=8,
    )
    model = UniVTG(cfg)
    B, Lv, Lt = 3, 16, 8
    rng = np.random.default_rng(7)
    mi = {
        "src_txt": _l2n(rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32)),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": _l2n(rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32)),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
        mi["src_vid_mask"], train=False,
    )["params"]
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)).astype(np.float32)
    batch = {
        "model_inputs": mi,
        "targets": {"timestamp": ts},
        "meta": [
            {"qid": i, "query": f"q{i}", "vid": f"v{i}", "duration": 32.0}
            for i in range(B)
        ],
    }
    # no_sort_results keeps rows in clip order: with random weights the
    # scores are near-tied and int8's ~1e-3 score jitter would otherwise
    # reorder the sorted window list
    sub_f32 = run_inference(model, params, [batch], round_multiple=0,
                            no_sort_results=True)
    sub_int8 = run_inference(model, params, [batch], round_multiple=0,
                             transfer_dtype="int8", no_sort_results=True)
    assert len(sub_f32) == len(sub_int8) == B
    for a, b in zip(sub_f32, sub_int8):
        wa = np.asarray(a["pred_relevant_windows"], np.float32)
        wb = np.asarray(b["pred_relevant_windows"], np.float32)
        assert wa.shape == wb.shape
        np.testing.assert_allclose(wa[:, 2], wb[:, 2], atol=1e-2)  # scores
        np.testing.assert_allclose(wa[:, :2], wb[:, :2], atol=0.5)  # seconds


@pytest.mark.parametrize("scan_steps", [1, 2])
def test_driver_trains_with_int8_transfer(tmp_path, scan_steps):
    """Full driver epoch loop with transfer_dtype='int8' learns and logs
    (both the single-step path and the lax.scan multi-step dispatch)."""
    import json
    import os

    from univtg_tpu.data.mr import MRDataConfig
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    corpus = create_synthetic_mr_corpus(str(tmp_path / "corpus"), n_train=24, n_val=8, seed=3)
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2, txt_dim=corpus["q_dim"], hidden_dim=48,
        num_layers=1, num_heads=4, ffn_dim=64, droppath=0.0, input_dropout=0.0,
        max_v_l=corpus["max_clips"], max_q_l=10,
    )
    data_kw = dict(
        dset_name="qvhighlights", v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"], q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"], clip_len=corpus["clip_len"],
        max_q_l=10, max_v_l=corpus["max_clips"],
    )
    cfg = TrainConfig(
        model=model,
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=str(tmp_path / "run"),
        bsz=8, eval_bsz=8, n_epoch=2, eval_epoch=2, lr=3e-4, lr_warmup=1,
        lr_drop=100, max_es_cnt=100, save_interval=-1,
        transfer_dtype="int8", scan_steps=scan_steps,
    )
    metrics, best_path = train_mr(cfg)
    assert os.path.exists(best_path)
    lines = [json.loads(l) for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))]
    assert len(lines) == 2
    assert np.isfinite(lines[-1]["loss_overall"])
    assert lines[-1]["loss_overall"] < lines[0]["loss_overall"]


def test_eval_ignores_train_transfer_compression(tmp_path, monkeypatch):
    """transfer_dtype='int8' speeds TRAINING transfer only: the in-loop
    evaluation (checkpoint selection + reported metrics) runs at
    transfer_dtype_eval, default float32 (ADVICE r2)."""
    from univtg_tpu.data.mr import MRDataConfig
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train import driver_mr
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    corpus = create_synthetic_mr_corpus(str(tmp_path / "corpus"), n_train=8, n_val=4, seed=5)
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2, txt_dim=corpus["q_dim"], hidden_dim=32,
        num_layers=1, num_heads=4, ffn_dim=48, droppath=0.0, input_dropout=0.0,
        max_v_l=corpus["max_clips"], max_q_l=10,
    )
    data_kw = dict(
        dset_name="qvhighlights", v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"], q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"], clip_len=corpus["clip_len"],
        max_q_l=10, max_v_l=corpus["max_clips"],
    )
    cfg = TrainConfig(
        model=model,
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=str(tmp_path / "run"),
        bsz=8, eval_bsz=8, n_epoch=1, eval_epoch=1, lr=3e-4, lr_warmup=1,
        lr_drop=100, save_interval=-1, transfer_dtype="int8",
    )
    seen = []
    orig = driver_mr.run_inference

    def spy(*args, **kw):
        seen.append(kw.get("transfer_dtype", "float32"))
        return orig(*args, **kw)

    monkeypatch.setattr(driver_mr, "run_inference", spy)
    train_mr(cfg)
    assert seen == ["float32"]
