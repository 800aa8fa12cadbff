"""End-to-end smoke: train the full MR pipeline on a synthetic corpus over
an 8-device virtual mesh (dp=4, tp=2) and check learning + artifacts."""
import json
import os

import numpy as np
import pytest

from univtg_tpu.data.mr import MRDataConfig
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.models import ModelConfig
from univtg_tpu.train.driver_mr import TrainConfig, train_mr


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    return create_synthetic_mr_corpus(str(root), n_train=48, n_val=16, seed=2)


def make_cfg(corpus, results_dir, **kw):
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2,
        txt_dim=corpus["q_dim"],
        hidden_dim=64,
        num_layers=2,
        num_heads=4,
        ffn_dim=96,
        droppath=0.1,
        input_dropout=0.1,
        max_v_l=corpus["max_clips"],
        max_q_l=10,
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
    return TrainConfig(
        model=model,
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=results_dir,
        bsz=16,
        eval_bsz=16,
        n_epoch=3,
        eval_epoch=1,
        lr=3e-4,
        lr_warmup=1,
        lr_drop=100,
        max_es_cnt=100,
        save_interval=-1,
        dp=4,
        tp=2,
        **kw,
    )


def test_train_and_eval(corpus, tmp_path):
    results = str(tmp_path / "run")
    cfg = make_cfg(corpus, results)
    metrics, best_path = train_mr(cfg)

    # artifacts
    assert os.path.exists(best_path)
    assert os.path.exists(os.path.join(results, "opt.json"))
    lines = [
        json.loads(l) for l in open(os.path.join(results, "train_log.jsonl"))
    ]
    assert len(lines) == 3
    assert lines[-1]["loss_overall"] < lines[0]["loss_overall"]

    # metrics structure from the exact-parity evaluator
    brief = metrics["brief"]
    assert "MR-full-mAP-key" in brief and "HL-min-VeryGood-mAP-key" in brief
    # the synthetic signal is strong; sanity-check it learned *something*
    assert brief["MR-full-mIoU-key"] > 5.0


def test_checkpoint_roundtrip(corpus, tmp_path):
    import jax

    from univtg_tpu.train import checkpoint as ckpt
    from univtg_tpu.train.driver_mr import build_everything

    cfg = make_cfg(corpus, str(tmp_path / "ck"))
    model, optimizer, state = build_everything(cfg, steps_per_epoch=3)
    path = str(tmp_path / "ck" / "model_test.ckpt")
    ckpt.save_checkpoint(path, state, epoch=7, config_json="{}")
    state2, epoch = ckpt.restore_checkpoint(path, state)
    assert epoch == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    params = ckpt.restore_params(path, state.params)
    assert len(jax.tree_util.tree_leaves(params)) == len(
        jax.tree_util.tree_leaves(state.params)
    )


def test_early_stop_breaks_loop(corpus, tmp_path):
    """max_es_cnt early stopping exits the epoch loop (the stop decision is
    computed under the rank-0 guard and applied outside it -- the
    multi-process broadcast path shares this code)."""
    import dataclasses

    results = str(tmp_path / "es")
    cfg = dataclasses.replace(
        make_cfg(corpus, results),
        n_epoch=10, eval_epoch=1, max_es_cnt=1, lr=0.0, lr_warmup=0,
    )
    train_mr(cfg)
    lines = [json.loads(l) for l in open(os.path.join(results, "train_log.jsonl"))]
    # epoch 0 sets best; epoch 1 cannot improve (lr=0) -> stop. Not 10 epochs.
    assert len(lines) == 2


def test_train_pipelined_interleaved_driver(corpus, tmp_path):
    """End-to-end pp=2 x interleave=2 driver run (TrainConfig.pp): the loss
    trajectory matches the sequential-scan driver, checkpoints are saved in
    CANONICAL layer order (the driver trains on a device-major pre-permuted
    state but converts at save/restore), and resume='auto' restores through
    the conversion."""
    import dataclasses

    import jax

    from univtg_tpu.train import checkpoint as ckpt

    def _cfg(results, **pipe):
        base = make_cfg(corpus, results)
        model = dataclasses.replace(
            base.model,
            num_layers=4, droppath=0.0, input_dropout=0.0,
            scan_layers=True, **pipe,
        )
        return dataclasses.replace(
            base, model=model, dp=4, tp=1, n_epoch=2, eval_epoch=2
        )

    res_seq = str(tmp_path / "seq")
    cfg_seq = _cfg(res_seq)
    train_mr(cfg_seq)
    seq_lines = [
        json.loads(l) for l in open(os.path.join(res_seq, "train_log.jsonl"))
    ]

    res_pp = str(tmp_path / "pp")
    cfg_pp = dataclasses.replace(
        _cfg(
            res_pp,
            pipeline_stages=2, pipeline_microbatches=4, pipeline_interleave=2,
        ),
        pp=2, dp=4,
    )
    train_mr(cfg_pp)
    pp_lines = [
        json.loads(l) for l in open(os.path.join(res_pp, "train_log.jsonl"))
    ]

    np.testing.assert_allclose(
        [l["loss_overall"] for l in pp_lines],
        [l["loss_overall"] for l in seq_lines],
        rtol=1e-4,
    )

    # the saved checkpoint must be canonical: its params match the
    # sequential run's checkpoint leaf-wise
    from flax import serialization

    def _raw_params(path):
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())["params"]

    p_seq = _raw_params(os.path.join(res_seq, "model_best.ckpt"))
    p_pp = _raw_params(os.path.join(res_pp, "model_best.ckpt"))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        p_pp, p_seq,
    )

    # elastic restart through the device-major conversion
    cfg_resume = dataclasses.replace(cfg_pp, n_epoch=3)
    train_mr(cfg_resume, resume="auto")
    lines = [
        json.loads(l) for l in open(os.path.join(res_pp, "train_log.jsonl"))
    ]
    assert lines[-1]["epoch"] == 2
    assert np.isfinite(lines[-1]["loss_overall"])


@pytest.mark.parametrize("interleave,dp,tp", [(1, 4, 1), (2, 4, 1), (1, 2, 2)])
def test_train_1f1b_driver(corpus, tmp_path, interleave, dp, tp):
    """End-to-end pipeline_schedule='1f1b' driver run (v=1, the
    interleaved v=2 schedule on the driver-managed device-major state,
    and the 1f1b x tp composition on a (dp=2, pp=2, tp=2) mesh):
    trains, learns, saves artifacts, and evaluates (eval decodes through
    the forward/GPipe path -- the schedule choice only affects training).
    The logged loss is the mean of per-(microbatch x dp-shard) losses
    (steps_1f1b.py docstring), so no equality to the full-batch sequential
    trajectory is asserted here; tests/test_pipeline_1f1b.py pins
    gradients against that definition."""
    import dataclasses

    results = str(tmp_path / f"f1b{interleave}_{dp}_{tp}")
    base = make_cfg(corpus, results)
    model = dataclasses.replace(
        base.model,
        num_layers=4, droppath=0.0, input_dropout=0.0, scan_layers=True,
        pipeline_stages=2, pipeline_microbatches=4,
        pipeline_interleave=interleave,
    )
    cfg = dataclasses.replace(
        base, model=model, pp=2, dp=dp, tp=tp, pipeline_schedule="1f1b",
        n_epoch=2, eval_epoch=2,
    )
    metrics, best_path = train_mr(cfg)
    assert os.path.exists(best_path)
    lines = [
        json.loads(l) for l in open(os.path.join(results, "train_log.jsonl"))
    ]
    assert len(lines) == 2
    assert all(np.isfinite(l["loss_overall"]) for l in lines)
    assert lines[-1]["loss_overall"] < lines[0]["loss_overall"]
    assert "MR-full-mAP-key" in metrics["brief"]

    # elastic restart continues through the 1F1B step
    train_mr(dataclasses.replace(cfg, n_epoch=3), resume="auto")
    lines = [
        json.loads(l) for l in open(os.path.join(results, "train_log.jsonl"))
    ]
    assert lines[-1]["epoch"] == 2 and np.isfinite(lines[-1]["loss_overall"])


def test_train_pp_config_validation(corpus, tmp_path):
    import dataclasses

    cfg = make_cfg(corpus, str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="pipeline_stages"):
        train_mr(dataclasses.replace(cfg, pp=2, dp=4, tp=1))

    pipe_model = dataclasses.replace(
        cfg.model, num_layers=4, scan_layers=True,
        pipeline_stages=2, pipeline_microbatches=4,
    )
    good = dataclasses.replace(cfg, model=pipe_model, pp=2, dp=4, tp=1)
    with pytest.raises(ValueError, match="pipeline_schedule"):
        train_mr(dataclasses.replace(good, pipeline_schedule="zigzag"))
    # 1f1b constraint violations fail up front with a named error
    # (tp > 1 is NOT one: 1f1b composes with tp via the engine's AUTO axis)
    with pytest.raises(ValueError, match="1f1b"):
        train_mr(dataclasses.replace(good, pipeline_schedule="1f1b", scan_steps=4))


def test_train_pp_rejects_bad_tiling_and_batches(corpus, tmp_path):
    """pp misconfigurations fail UP FRONT with named errors, not after
    epochs of training (or as a silent layer drop)."""
    import dataclasses

    base = make_cfg(corpus, str(tmp_path / "bad2"))
    pipe_model = dataclasses.replace(
        base.model, num_layers=4, scan_layers=True,
        pipeline_stages=2, pipeline_microbatches=4, pipeline_interleave=3,
    )
    with pytest.raises(ValueError, match="tile over"):
        train_mr(dataclasses.replace(base, model=pipe_model, pp=2, dp=4, tp=1))

    pipe_model = dataclasses.replace(pipe_model, pipeline_interleave=2)
    # eval_bsz=8 / n_micro=4 = 2 rows per microbatch, does not tile over dp=4
    with pytest.raises(ValueError, match="eval_bsz"):
        train_mr(
            dataclasses.replace(
                base, model=pipe_model, pp=2, dp=4, tp=1, eval_bsz=8
            )
        )

    # pp + num_shards > 1 / multi-process is SUPPORTED since round 5 (the
    # driver evaluates through a rank-local non-pipeline twin on gathered
    # canonical params); the composition is pinned end-to-end by
    # tests/test_multiprocess.py::test_two_process_pipeline_parallel_gang.


def test_eval_shard_covers_every_item_exactly_once():
    """Stride shards must cover the whole eval set INCLUDING the remainder
    (the Loader's training shards drop the tail for rank-uniform step
    counts; evaluation must not)."""
    from univtg_tpu.train.driver_mr import _EvalShard

    class _DS(list):
        pass

    for n in (5, 6, 7, 13):
        ds = _DS(range(n))
        for num_shards in (1, 2, 3, 4):
            got = []
            for r in range(num_shards):
                shard = _EvalShard(ds, r, num_shards)
                got.extend(shard[i] for i in range(len(shard)))
            assert sorted(got) == list(range(n)), (n, num_shards, got)


def test_allgather_bytes_single_process_identity():
    from univtg_tpu.train.driver_mr import _allgather_bytes

    blob = b'{"qid": 1, "x": [1.5, 2.0]}'
    assert _allgather_bytes(blob) == [blob]


def test_profile_dir_captures_device_trace(corpus, tmp_path):
    """TrainConfig.profile_dir: the first profile_steps training steps of
    the first epoch are captured as an XLA profiler trace (viewable in
    TensorBoard/XProf); the run itself is unaffected. The reference has no
    device profiler at all (SURVEY.md §5)."""
    import dataclasses

    prof = str(tmp_path / "prof")
    cfg = dataclasses.replace(
        make_cfg(corpus, str(tmp_path / "run")),
        n_epoch=1, eval_epoch=5, profile_dir=prof, profile_steps=2,
    )
    train_mr(cfg)
    captured = []
    for root, _, files in os.walk(prof):
        captured.extend(os.path.join(root, f) for f in files)
    assert captured, f"no profiler artifacts under {prof}"


def test_train_moe_ep_driver(corpus, tmp_path):
    """MoE encoder trained through the full driver on a dp=2 x ep=2 x tp=2
    mesh: learns, logs the aux loss, and the saved checkpoint restores into
    a vanilla (unsharded) eval host."""
    import dataclasses

    results = str(tmp_path / "run_moe")
    cfg = make_cfg(corpus, results, ep=2)
    cfg = dataclasses.replace(cfg, dp=2, tp=2)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, moe_experts=4, moe_top_k=2, scan_layers=True
        ),
    )
    metrics, best_path = train_mr(cfg)
    assert os.path.exists(best_path)
    lines = [
        json.loads(l) for l in open(os.path.join(results, "train_log.jsonl"))
    ]
    assert len(lines) == 3
    assert lines[-1]["loss_overall"] < lines[0]["loss_overall"]
    assert all(np.isfinite(l["loss_moe_aux"]) for l in lines)
    assert metrics["brief"]["MR-full-mIoU-key"] > 5.0

    # checkpoint restores off-mesh (expert kernels are ordinary leaves)
    from univtg_tpu.models import UniVTG
    from univtg_tpu.train import checkpoint as ckpt_io
    from univtg_tpu.train.steps import init_state, make_optimizer

    model = UniVTG(cfg.model)
    fresh = init_state(
        model, cfg.model, make_optimizer(lambda s: 1e-4),
        __import__("jax").random.PRNGKey(0),
    )
    restored, _ = ckpt_io.restore_checkpoint(best_path, fresh)
    assert (
        restored.params["encoder"]["layers"]["layer"]["moe_w1"].shape[1] == 4
    )


def test_train_moe_ep_validation(corpus, tmp_path):
    """ep misconfigurations fail before any training is spent."""
    import dataclasses

    cfg = make_cfg(corpus, str(tmp_path / "run"), ep=2)
    cfg = dataclasses.replace(cfg, dp=2, tp=1)
    # ep doesn't divide the expert count
    bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, moe_experts=3)
    )
    with pytest.raises(ValueError, match="moe_experts"):
        train_mr(bad)
    # ep on a dense model silently wastes the ep devices -> rejected
    bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, moe_experts=0)
    )
    with pytest.raises(ValueError, match="moe_experts"):
        train_mr(bad)
    # ep + pp composes on BOTH schedules since round 5 (GPipe threads the
    # aux through the tick carry; 1F1B seeds the aux cotangent per chunk
    # vjp) -- pinned by tests/test_moe.py::
    # test_moe_pipeline_matches_sequential_at_m1 /
    # test_moe_1f1b_matches_microbatched_autodiff. Still rejected: 1f1b
    # with pre_norm.
    bad = dataclasses.replace(
        cfg,
        ep=1,
        pp=2,
        pipeline_schedule="1f1b",
        model=dataclasses.replace(
            cfg.model, pre_norm=True, scan_layers=True, pipeline_stages=2
        ),
    )
    with pytest.raises(ValueError, match="pre_norm"):
        train_mr(bad)
