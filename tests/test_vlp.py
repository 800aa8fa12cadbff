"""VLP multi-corpus pretraining: gate plumbing + zero-shot eval smoke."""
import numpy as np
import pytest

from univtg_tpu.data.collate import collate_mr
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.data.vlp import TYPE_GATES, VLPCorpusSpec, VLPDataConfig, VLPDataset
from univtg_tpu.models import ModelConfig
from univtg_tpu.models.losses import LossWeights


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    a = create_synthetic_mr_corpus(str(tmp_path_factory.mktemp("vlp_a")), n_train=10, n_val=6, seed=3)
    b = create_synthetic_mr_corpus(str(tmp_path_factory.mktemp("vlp_b")), n_train=8, n_val=4, seed=4)
    return a, b


def make_vlp_cfg(corpora, **kw):
    a, b = corpora
    return VLPDataConfig(
        corpora=(
            VLPCorpusSpec(
                data_path=a["train_path"],
                dset_name="qvhighlights",
                v_feat_dirs=a["v_feat_dirs"],
                q_feat_dir=a["q_feat_dir"],
                type="curve",
            ),
            VLPCorpusSpec(
                data_path=b["train_path"],
                dset_name="videocc",
                v_feat_dirs=b["v_feat_dirs"],
                q_feat_dir=b["q_feat_dir"],
                type="interval",
            ),
        ),
        q_feat_dim=a["q_dim"],
        v_feat_dim=a["v_dim"],
        max_q_l=10,
        max_v_l=a["max_clips"],
        txt_drop_ratio=0.1,
        **kw,
    )


def test_vlp_dataset_concat_and_gates(corpora):
    ds = VLPDataset(make_vlp_cfg(corpora))
    assert len(ds) == 18
    first = ds[0]
    last = ds[17]
    np.testing.assert_array_equal(first["gates"], TYPE_GATES["curve"])
    np.testing.assert_array_equal(last["gates"], TYPE_GATES["interval"])

    batch = collate_mr([ds[0], ds[17]], max_q_l=10, max_v_l=75)
    assert batch["targets"]["gates"].shape == (2, 5)


def test_vlp_data_ratio(corpora):
    ds = VLPDataset(make_vlp_cfg(corpora, data_ratio=0.5))
    assert len(ds) == 9


def test_vlp_driver_zero_shot_eval(corpora, tmp_path):
    from univtg_tpu.data.mr import MRDataConfig
    from univtg_tpu.train.driver_vlp import VLPTrainConfig, train_vlp

    a, _ = corpora
    model = ModelConfig(
        vid_dim=a["v_dim"] + 2,
        txt_dim=a["q_dim"],
        hidden_dim=48,
        num_layers=1,
        num_heads=4,
        ffn_dim=64,
        input_dropout=0.1,
        max_v_l=a["max_clips"],
        max_q_l=10,
    )
    eval_data = MRDataConfig(
        dset_name="qvhighlights",
        data_path=a["val_path"],
        v_feat_dirs=a["v_feat_dirs"],
        q_feat_dir=a["q_feat_dir"],
        q_feat_dim=a["q_dim"],
        v_feat_dim=a["v_dim"],
        max_q_l=10,
        max_v_l=a["max_clips"],
    )
    cfg = VLPTrainConfig(
        model=model,
        vlp_data=make_vlp_cfg(corpora),
        train_data=None,
        eval_data=eval_data,
        results_dir=str(tmp_path / "vlp_run"),
        bsz=8,
        eval_bsz=8,
        n_epoch=2,
        eval_epoch=1,
        lr=3e-4,
        lr_warmup=1,
        save_interval=-1,
        dp=4,
        tp=2,
    )
    metrics, best = train_vlp(cfg)
    assert "MR-full-mAP-key" in metrics["brief"]


def test_init_distributed_single_process():
    from univtg_tpu.train.driver_vlp import init_distributed

    pid, count = init_distributed()
    assert (pid, count) == (0, 1)
    pid, count = init_distributed(num_processes=1)
    assert (pid, count) == (0, 1)
