"""QFVS vertical: metric parity vs the reference evaluator, data contract,
loss behavior, and a leave-one-out driver smoke run."""
import sys

import numpy as np
import pytest

from univtg_tpu.data.qfvs import (
    QFVSDataConfig,
    QFVSDataset,
    prepare_qfvs_batch,
)
from univtg_tpu.data.synthetic import create_synthetic_qfvs_corpus
from univtg_tpu.evals.qfvs_metric import semantic_iou_matrix, semantic_matching
from univtg_tpu.models import ModelConfig
from univtg_tpu.models.losses import compact_to_grid, qfvs_losses

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return create_synthetic_qfvs_corpus(str(tmp_path_factory.mktemp("qfvs")))


def make_data_cfg(corpus, train_videos=(1, 2, 3)):
    return QFVSDataConfig(
        root=corpus["root"],
        train_videos=train_videos,
        test_videos=(4,),
        max_segment_num=4,
        max_frame_num=16,
    )


@pytest.mark.parametrize("seed", range(4))
def test_semantic_matching_vs_reference(corpus, seed):
    """Our LSAP-based matching must equal the reference's networkx
    max_weight_matching P/R/F1 (eval/qfvs.py:57-74)."""
    from eval.qfvs import calculate_semantic_matching as ref_match

    rng = np.random.default_rng(seed)
    tags = corpus["videos_tag"][0]
    n = len(tags)
    machine = rng.choice(n, size=5, replace=False).tolist()
    gt = rng.choice(n, size=4, replace=False).tolist()
    want = ref_match(machine, gt, [tags], video_id=0)
    got = semantic_matching(machine, gt, tags)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_semantic_iou_matrix():
    a = np.array([[1, 1, 0], [0, 0, 1]])
    b = np.array([[1, 0, 0]])
    got = semantic_iou_matrix(a, b)
    np.testing.assert_allclose(got, [[0.5], [0.0]])


def test_dataset_and_batch_contract(corpus):
    ds = QFVSDataset(make_data_cfg(corpus))
    assert len(ds) == 9  # 3 videos x C(3,2) oracle files
    item = ds[0]
    S, F = item["mask_GT"].shape
    assert item["features"].shape[:2] == (S, F)
    in1, in2, in_oracle, mask_flat = prepare_qfvs_batch(item, max_q_l=8)
    assert in1["src_vid"].shape == (S, F, item["features"].shape[2] + 2)
    assert in_oracle["src_txt"].shape[1] == in1["src_txt"].shape[1] * 2
    assert mask_flat.shape == (S * F,)
    # GT written at compact indices; scatter to grid respects seg_len
    n_valid = int(item["seg_len"].sum())
    grid = compact_to_grid(item["concept1_GT"][:n_valid], item["seg_len"], S, F)
    assert grid.sum() == item["concept1_GT"][:n_valid].sum()
    assert (grid * (1 - mask_flat)).sum() == 0  # nothing outside valid frames


def test_qfvs_losses_sane(corpus):
    import jax.numpy as jnp

    ds = QFVSDataset(make_data_cfg(corpus))
    item = ds[0]
    S, F = item["mask_GT"].shape
    n_valid = int(item["seg_len"].sum())
    gt = compact_to_grid(item["concept1_GT"][:n_valid], item["seg_len"], S, F)
    outputs = {
        "pred_logits": jnp.full((S, F, 1), 0.5),
        "saliency_scores": jnp.zeros((S, F)),
    }
    ld = qfvs_losses(outputs, jnp.asarray(gt), jnp.asarray(item["mask_GT"].reshape(-1)))
    assert np.isfinite(float(ld["loss_f"]))
    assert np.isfinite(float(ld["loss_s_intra"]))
    # empty GT -> zero losses
    ld0 = qfvs_losses(
        outputs, jnp.zeros(S * F), jnp.asarray(item["mask_GT"].reshape(-1))
    )
    assert float(ld0["loss_f"]) == 0.0


def test_qfvs_driver_smoke(corpus, tmp_path):
    from univtg_tpu.train.driver_qfvs import QFVSTrainConfig, train_qfvs

    model = ModelConfig(
        vid_dim=34,
        txt_dim=16,
        hidden_dim=32,
        num_layers=1,
        num_heads=4,
        ffn_dim=48,
        input_dropout=0.1,
        max_v_l=16,
        max_q_l=8,
    )
    cfg = QFVSTrainConfig(
        model=model,
        data=make_data_cfg(corpus),
        results_dir=str(tmp_path / "qfvs_run"),
        n_epoch=1,
        eval_epoch=1,
        splits=((2, 3, 4), (1, 2, 3)),
        max_q_l=8,
    )
    results = train_qfvs(cfg, videos_tag=corpus["videos_tag"])
    assert "V1" in results and "V4" in results and "AVG_F" in results
    for k in ("V1", "V4"):
        assert set(results[k]) == {"F", "R", "P"}


def test_tags_mat_roundtrip(tmp_path):
    """write_tags_mat produces the exact eval/Tags.mat cell nesting that
    load_videos_tag parses: matrices roundtrip shape- and value-exact."""
    import numpy as np

    from univtg_tpu.data.synthetic import write_tags_mat
    from univtg_tpu.evals.qfvs_metric import load_videos_tag

    rng = np.random.default_rng(0)
    videos_tag = [
        (rng.uniform(0, 1, (7, 4)) > 0.5).astype(int),
        (rng.uniform(0, 1, (3, 4)) > 0.5).astype(int),
    ]
    path = write_tags_mat(str(tmp_path / "Tags.mat"), videos_tag)
    loaded = load_videos_tag(path)
    assert len(loaded) == 2
    for want, got in zip(videos_tag, loaded):
        np.testing.assert_array_equal(got, want)


def test_qfvs_driver_runtime_knobs(corpus, tmp_path):
    """QFVS accepts the shared runtime knobs: background host-prep prefetch
    and the profile window (VERDICT r4 item 8)."""
    import os

    from univtg_tpu.train.driver_qfvs import QFVSTrainConfig, train_qfvs

    model = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=1, num_heads=4,
        ffn_dim=48, input_dropout=0.0, max_v_l=16, max_q_l=8,
    )
    profile_dir = str(tmp_path / "trace")
    cfg = QFVSTrainConfig(
        model=model, data=make_data_cfg(corpus),
        results_dir=str(tmp_path / "qfvs_knobs"), n_epoch=1, eval_epoch=1,
        splits=((2, 3, 4),), max_q_l=8, prefetch_depth=2,
        profile_dir=profile_dir, profile_steps=1,
    )
    results = train_qfvs(cfg, videos_tag=corpus["videos_tag"])
    assert "V1" in results
    assert os.path.isdir(profile_dir) and os.listdir(profile_dir)
