"""Pretrain -> co-train chaining (the reference's pretrain.sh -> cotrain.sh
workflow): VLP pretraining checkpoint loads weights-only into downstream MR
fine-tuning; resume_all continues epochs with optimizer state."""
import json
import os

import pytest

from tests.test_vlp import make_vlp_cfg
from univtg_tpu.data.mr import MRDataConfig
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.models import ModelConfig
from univtg_tpu.train.driver_mr import TrainConfig, train_mr
from univtg_tpu.train.driver_vlp import VLPTrainConfig, train_vlp


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    a = create_synthetic_mr_corpus(str(tmp_path_factory.mktemp("ct_a")), n_train=16, n_val=6, seed=11)
    b = create_synthetic_mr_corpus(str(tmp_path_factory.mktemp("ct_b")), n_train=8, n_val=4, seed=12)
    return a, b


def test_pretrain_then_cotrain(corpora, tmp_path):
    a, _ = corpora
    model = ModelConfig(
        vid_dim=a["v_dim"] + 2, txt_dim=a["q_dim"], hidden_dim=48,
        num_layers=1, num_heads=4, ffn_dim=64, input_dropout=0.1,
        max_v_l=a["max_clips"], max_q_l=10,
    )
    data_kw = dict(
        dset_name="qvhighlights",
        v_feat_dirs=a["v_feat_dirs"],
        q_feat_dir=a["q_feat_dir"],
        q_feat_dim=a["q_dim"],
        v_feat_dim=a["v_dim"],
        max_q_l=10,
        max_v_l=a["max_clips"],
    )
    eval_data = MRDataConfig(data_path=a["val_path"], **data_kw)

    vlp_cfg = VLPTrainConfig(
        model=model, vlp_data=make_vlp_cfg(corpora), train_data=None,
        eval_data=eval_data, results_dir=str(tmp_path / "pretrain"),
        bsz=8, eval_bsz=8, n_epoch=1, eval_epoch=1, lr=3e-4, lr_warmup=1,
        save_interval=-1, dp=2, tp=1,
    )
    _, pretrain_ckpt = train_vlp(vlp_cfg)
    assert os.path.exists(pretrain_ckpt)

    # downstream fine-tune, weights-only resume (fresh optimizer)
    mr_cfg = TrainConfig(
        model=model,
        train_data=MRDataConfig(data_path=a["train_path"], **data_kw),
        eval_data=eval_data,
        results_dir=str(tmp_path / "cotrain"),
        bsz=8, eval_bsz=8, n_epoch=1, eval_epoch=1, lr=3e-4, lr_warmup=1,
        save_interval=-1, dp=2, tp=1,
    )
    metrics, best = train_mr(mr_cfg, resume=pretrain_ckpt)
    assert "MR-full-mAP-key" in metrics["brief"]

    # resume_all continues from the saved epoch (no retraining of epoch 0)
    mr_cfg2 = TrainConfig(**{**mr_cfg.__dict__, "n_epoch": 2})
    metrics2, _ = train_mr(mr_cfg2, resume=os.path.join(mr_cfg.results_dir, "model_latest.ckpt"), resume_all=True)
    lines = [
        json.loads(l)
        for l in open(os.path.join(mr_cfg.results_dir, "train_log.jsonl"))
    ]
    epochs = [l["epoch"] for l in lines]
    assert epochs == [0, 1]  # first run epoch 0; resumed run only epoch 1
