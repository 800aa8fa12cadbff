"""Eval-only inference entry points + plotting tooling."""
import os

import numpy as np
import pytest

from univtg_tpu.tools.plots import plot_query, plot_submission


def test_plot_query_fixture(tmp_path, qvhl_fixtures):
    pred, gt = qvhl_fixtures
    out = tmp_path / "q.png"
    fig = plot_query(pred[0], gt[0], clip_len=2.0, out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_submission(tmp_path):
    n = plot_submission(
        "/root/reference/plot/qvhl/univtg.jsonl",
        "/root/reference/plot/qvhl/gt.jsonl",
        str(tmp_path / "figs"),
        max_queries=3,
        baseline_jsonl="/root/reference/plot/qvhl/momentdetr.jsonl",
    )
    assert n == 3
    assert len(os.listdir(tmp_path / "figs")) == 3


def test_infer_hl_roundtrip(tmp_path):
    """train_hl saves per-domain ckpts; infer_hl must reproduce the scores."""
    from univtg_tpu.data.synthetic import create_synthetic_hl_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.data.hl import HLDataConfig
    from univtg_tpu.train.driver_hl import HLTrainConfig, infer_hl, train_hl

    corpus = create_synthetic_hl_corpus(str(tmp_path / "hl"), n_train=4, n_val=2)
    data = HLDataConfig(
        dset_name="tvsum",
        domain="SYN",
        anno_path=corpus["anno_path"],
        splits_path=corpus["splits_path"],
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        max_v_l=corpus["max_clips"],
        max_q_l=8,
    )
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2, txt_dim=corpus["q_dim"], hidden_dim=32,
        num_layers=1, num_heads=4, ffn_dim=48, input_dropout=0.1,
        max_v_l=corpus["max_clips"], max_q_l=8,
    )
    cfg = HLTrainConfig(
        model=model, data=data, domains=["SYN"],
        results_dir=str(tmp_path / "run"), bsz=4, eval_bsz=4,
        n_epoch=1, eval_epoch=1, lr=3e-4, lr_warmup=1, dp=1, tp=1,
        weights=LossWeights(b=0, g=0, f=10, s_intra=0.1, s_inter=0.1),
    )
    train_scores = train_hl(cfg)
    infer_scores = infer_hl(cfg, cfg.results_dir)
    assert infer_scores["SYN"] == pytest.approx(train_scores["SYN"], abs=1e-6)


def test_infer_qfvs_roundtrip(tmp_path):
    from univtg_tpu.data.qfvs import QFVSDataConfig
    from univtg_tpu.data.synthetic import create_synthetic_qfvs_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_qfvs import QFVSTrainConfig, infer_qfvs, train_qfvs

    corpus = create_synthetic_qfvs_corpus(str(tmp_path / "qfvs"))
    model = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=1, num_heads=4,
        ffn_dim=48, input_dropout=0.1, max_v_l=16, max_q_l=8,
    )
    cfg = QFVSTrainConfig(
        model=model,
        data=QFVSDataConfig(
            root=corpus["root"], max_segment_num=4, max_frame_num=16,
            train_videos=(1, 2, 3),
        ),
        results_dir=str(tmp_path / "run"),
        n_epoch=1, eval_epoch=1, splits=((2, 3, 4),), max_q_l=8,
    )
    train_res = train_qfvs(cfg, videos_tag=corpus["videos_tag"])
    infer_res = infer_qfvs(cfg, cfg.results_dir, videos_tag=corpus["videos_tag"])
    assert infer_res["V1"]["F"] == pytest.approx(train_res["V1"]["F"], abs=1e-6)
