"""bf16 mixed-precision training, QVHighlights test-split submission flow."""
import json
import os
import zipfile

import numpy as np
import pytest

from univtg_tpu.data.collate import collate_mr
from univtg_tpu.data.loader import Loader
from univtg_tpu.data.mr import MRDataConfig, MRDataset
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.models import ModelConfig, UniVTG


def test_bf16_training_step():
    import jax
    import optax

    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.train.steps import init_state, make_train_step

    from tests.test_spmd_equivalence import make_batch

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, max_v_l=16, max_q_l=6, compute_dtype="bfloat16",
    )
    model = UniVTG(cfg)
    optimizer = optax.adamw(1e-3)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    # params stay f32 (mixed precision: bf16 activations, f32 master weights)
    assert all(
        np.asarray(x).dtype == np.float32
        for x in jax.tree_util.tree_leaves(state.params)
    )
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(5):
        mi, tg = make_batch(B=8, seed=i)
        state, metrics = step(state, mi, tg, rng)
        losses.append(float(metrics["loss_overall"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_test_split_submission_flow(tmp_path):
    """test-split inference: dummy [[0,150]] windows, no GT metrics, codalab
    packaging (the reference's test_public path)."""
    import jax

    from univtg_tpu.data.features import save_jsonl
    from univtg_tpu.tools.codalab import package_submission
    from univtg_tpu.train.infer_mr import run_inference
    from univtg_tpu.train.steps import init_state, make_optimizer

    corpus = create_synthetic_mr_corpus(str(tmp_path / "c"), n_train=6, n_val=6, seed=3)
    # rename val split to a test-named file
    test_path = str(tmp_path / "c" / "qvhighlights_test.jsonl")
    rows = [json.loads(l) for l in open(corpus["val_path"])]
    for r in rows:
        r.pop("relevant_windows")  # test split has no GT
        r.pop("saliency_scores")
        r.pop("relevant_clip_ids")
    with open(test_path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    cfg = MRDataConfig(
        dset_name="qvhighlights",
        data_path=test_path,
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        max_q_l=10,
        max_v_l=corpus["max_clips"],
        load_labels=True,
    )
    ds = MRDataset(cfg)
    assert ds.is_test_split
    item = ds[0]
    # dummy [[0,150]] supervision is applied internally (meta untouched,
    # unlike the reference which mutates its metadata in place)
    assert "relevant_windows" not in item["meta"]
    assert item["timestamp_window"].sum() >= 1

    mcfg = ModelConfig(
        vid_dim=corpus["v_dim"] + 2, txt_dim=corpus["q_dim"], hidden_dim=32,
        num_layers=1, num_heads=4, ffn_dim=48, max_v_l=corpus["max_clips"], max_q_l=10,
    )
    model = UniVTG(mcfg)
    state = init_state(model, mcfg, make_optimizer(lambda s: 0.0), jax.random.PRNGKey(0))
    loader = Loader(
        ds, 4, lambda items, pad_batch_to: collate_mr(items, 10, corpus["max_clips"], pad_batch_to)
    )
    submission = run_inference(model, state.params, loader)
    assert len(submission) == 6
    assert all("pred_relevant_windows" in r for r in submission)

    val_p = str(tmp_path / "val_sub.jsonl")
    test_p = str(tmp_path / "test_sub.jsonl")
    save_jsonl(submission, val_p)
    save_jsonl(submission, test_p)
    out = package_submission(val_p, test_p, str(tmp_path / "sub.zip"))
    assert zipfile.ZipFile(out).namelist() == [
        "hl_val_submission.jsonl",
        "hl_test_submission.jsonl",
    ]


def test_tensorboard_events_written(tmp_path):
    from tests.test_train_e2e import make_cfg

    corpus = create_synthetic_mr_corpus(str(tmp_path / "tbc"), n_train=16, n_val=6, seed=13)
    cfg = make_cfg(corpus, str(tmp_path / "run"), tensorboard_dir="auto")
    from univtg_tpu.train.driver_mr import train_mr
    import dataclasses

    cfg = dataclasses.replace(cfg, n_epoch=1)
    train_mr(cfg)
    tb_dir = os.path.join(cfg.results_dir, "tb")
    files = os.listdir(tb_dir)
    assert any("tfevents" in f for f in files), files


def test_bf16_transfer_dtype_driver(tmp_path):
    from tests.test_train_e2e import make_cfg
    from univtg_tpu.train.driver_mr import train_mr
    import dataclasses

    corpus = create_synthetic_mr_corpus(str(tmp_path / "bft"), n_train=16, n_val=6, seed=17)
    cfg = make_cfg(corpus, str(tmp_path / "run"), transfer_dtype="bfloat16")
    cfg = dataclasses.replace(cfg, n_epoch=1)
    metrics, best = train_mr(cfg)
    assert os.path.exists(best)
    assert "MR-full-mAP-key" in metrics["brief"]


def test_decode_sanitizes_nonfinite():
    from univtg_tpu.train.infer_mr import decode_batch

    dev_out = {
        "scores": np.array([[np.nan, 0.5]]),
        "spans": np.array([[[np.inf, -np.inf], [1.0, 3.0]]]),
        "saliency": np.array([[np.nan, 0.2]]),
        "valid_len": np.array([2]),
    }
    rows = decode_batch(dev_out, [{"qid": 1, "query": "q", "vid": "v", "duration": 10.0}])
    flat = np.asarray(rows[0]["pred_relevant_windows"], np.float64)
    assert np.isfinite(flat).all()
    assert np.isfinite(rows[0]["pred_saliency_scores"]).all()
