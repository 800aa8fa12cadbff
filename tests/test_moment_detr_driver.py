"""End-to-end Moment-DETR training through the MR driver (model_id switch)."""
import json
import os

import pytest

from univtg_tpu.data.mr import MRDataConfig
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.models.moment_detr import MomentDETRConfig
from univtg_tpu.train.driver_mr import TrainConfig, train_mr


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return create_synthetic_mr_corpus(
        str(tmp_path_factory.mktemp("md")), n_train=24, n_val=8, seed=5
    )


def test_moment_detr_training(corpus, tmp_path):
    model = MomentDETRConfig(
        vid_dim=corpus["v_dim"] + 2,
        txt_dim=corpus["q_dim"],
        hidden_dim=64,
        num_layers=1,
        num_heads=4,
        ffn_dim=96,
        num_queries=6,
        num_decoder_layers=2,
        input_dropout=0.1,
        max_v_l=corpus["max_clips"],
        max_q_l=10,
        aux_loss=True,
    )
    data_kw = dict(
        dset_name="qvhighlights",
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        clip_len=corpus["clip_len"],
        max_q_l=10,
        max_v_l=corpus["max_clips"],
    )
    cfg = TrainConfig(
        model=model,
        model_id="moment_detr",
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=str(tmp_path / "md_run"),
        bsz=8,
        eval_bsz=8,
        n_epoch=2,
        eval_epoch=1,
        lr=3e-4,
        lr_warmup=1,
        save_interval=-1,
        dp=2,
        tp=1,
        weights=LossWeights(b=10, g=1, f=4, s_intra=1.0, s_inter=0.0),
        eval_mode=None,
    )
    metrics, best = train_mr(cfg)
    assert os.path.exists(best)
    brief = metrics["brief"]
    assert "MR-full-mAP-key" in brief
    lines = [json.loads(l) for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))]
    assert lines[-1]["loss_overall"] < lines[0]["loss_overall"]
    # submission rows carry num_queries windows
    rows = [json.loads(l) for l in open(os.path.join(cfg.results_dir, "latest_val_preds.jsonl"))]
    assert len(rows[0]["pred_relevant_windows"]) == 6


def test_moment_detr_ce_training(corpus, tmp_path):
    """'ce' span type end-to-end: integer span labels, CE matching/losses,
    absolute-seconds decode."""
    model = MomentDETRConfig(
        vid_dim=corpus["v_dim"] + 2,
        txt_dim=corpus["q_dim"],
        hidden_dim=48,
        num_layers=1,
        num_heads=4,
        ffn_dim=64,
        num_queries=5,
        num_decoder_layers=1,
        input_dropout=0.1,
        max_v_l=corpus["max_clips"],
        max_q_l=10,
        aux_loss=False,
        span_loss_type="ce",
    )
    data_kw = dict(
        dset_name="qvhighlights",
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        clip_len=corpus["clip_len"],
        max_q_l=10,
        max_v_l=corpus["max_clips"],
        span_loss_type="ce",
    )
    cfg = TrainConfig(
        model=model,
        model_id="moment_detr",
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=str(tmp_path / "ce_run"),
        bsz=8,
        eval_bsz=8,
        n_epoch=1,
        eval_epoch=1,
        lr=3e-4,
        lr_warmup=1,
        save_interval=-1,
        dp=1,
        tp=1,
        weights=LossWeights(b=10, g=1, f=4, s_intra=1.0, s_inter=0.0),
        eval_mode=None,
    )
    metrics, best = train_mr(cfg)
    assert "MR-full-mAP-key" in metrics["brief"]
    rows = [
        json.loads(l)
        for l in open(os.path.join(cfg.results_dir, "latest_val_preds.jsonl"))
    ]
    # ce decode: window boundaries are clip multiples within the video
    for st, ed, score in rows[0]["pred_relevant_windows"]:
        assert st % corpus["clip_len"] == 0 and ed % corpus["clip_len"] == 0
        assert 0 <= st <= ed
