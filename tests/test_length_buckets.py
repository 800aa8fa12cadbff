"""Length-bucketed training batches (TrainConfig.length_buckets): loss
numerics invariant to the bucket choice, bounded compiled-program count,
measured padding reduction, and driver integration.

Replaces the reference's pad-to-batch-max (main/dataset.py:1037-1052) with
an XLA-friendly bucket ladder (SURVEY.md §7 "Ragged -> static shapes")."""
import json
import os

import numpy as np
import pytest

import jax

from univtg_tpu.data.collate import collate_mr
from univtg_tpu.data.loader import Loader
from univtg_tpu.data.mr import timestamp_grid


def _item(rng, ctx_l, v_dim=34, q_dim=16, Lt=6):
    ts = timestamp_grid(ctx_l, 2.0)
    window = np.zeros(ctx_l, np.float32)
    st = int(rng.integers(0, max(1, ctx_l - 5)))
    ed = min(st + 3, ctx_l - 1)
    window[st : ed + 1] = 1
    nn = np.zeros((ctx_l, 2), np.float32)
    nn[:, 0], nn[:, 1] = st / ctx_l, (ed + 1) / ctx_l
    return {
        "meta": {"qid": int(rng.integers(1e6)), "duration": ctx_l * 2.0},
        "query_feat": rng.standard_normal((Lt, q_dim)).astype(np.float32),
        "video_feat": rng.standard_normal((ctx_l, v_dim)).astype(np.float32),
        "timestamp": ts,
        "span_labels_nn": nn,
        "timestamp_window": window,
        "saliency_scores": (rng.uniform(0, 1, ctx_l) * window).astype(np.float32),
        "saliency_pos_labels": np.asarray([st], np.int32),
        "saliency_neg_labels": np.asarray([max(0, st - 1)], np.int32),
    }


def test_bucketed_collate_shapes_and_masks():
    rng = np.random.default_rng(0)
    items = [_item(rng, L) for L in (9, 14, 11)]
    b = collate_mr(items, 8, 64, v_buckets=(16, 32, 64))
    assert b["model_inputs"]["src_vid"].shape[1] == 16  # bucket of max(14)
    assert b["targets"]["timestamp"].shape[1] == 16
    assert b["targets"]["saliency_scores"].shape[1] == 16
    np.testing.assert_array_equal(
        b["model_inputs"]["src_vid_mask"].sum(1), [9, 14, 11]
    )
    # bucket never exceeds max_v_l
    b2 = collate_mr(items, 8, 12, v_buckets=(16, 32))
    assert b2["model_inputs"]["src_vid"].shape[1] == 12


def test_bucketed_loss_equals_pad_to_max():
    """The SAME batch collated at bucket 16 and at max_v_l=64 must produce
    identical train-step losses and gradients: every consumer masks."""
    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step

    rng = np.random.default_rng(1)
    items = [_item(rng, L) for L in (9, 14, 11, 13)]
    b_bucket = collate_mr(items, 8, 64, v_buckets=(16, 32, 64))
    b_full = collate_mr(items, 8, 64)
    assert b_bucket["model_inputs"]["src_vid"].shape[1] == 16
    assert b_full["model_inputs"]["src_vid"].shape[1] == 64

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=2, num_heads=4,
        ffn_dim=48, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=64, max_q_l=8,
    )
    model = UniVTG(cfg)
    optimizer = make_optimizer(lambda s: 1e-3)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, LossWeights(), donate=False)

    outs = {}
    for name, batch in (("bucket", b_bucket), ("full", b_full)):
        new_state, metrics = step(
            state, batch["model_inputs"], batch["targets"], jax.random.PRNGKey(2)
        )
        outs[name] = (
            {k: float(v) for k, v in metrics.items()},
            jax.tree_util.tree_leaves(new_state.params),
        )
    m_b, p_b = outs["bucket"]
    m_f, p_f = outs["full"]
    for k in m_f:
        assert m_b[k] == pytest.approx(m_f[k], rel=1e-5), k
    # f32 reduction order differs between the two padded widths; Adam's
    # g/sqrt(v) normalization amplifies that to ~5e-6 on the first step
    for a, b in zip(p_b, p_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loader_window_sort():
    """Length-aware batching: every index still appears exactly once per
    epoch, batch order is shuffled, and per-batch length spread (= padding
    waste) drops vs plain shuffling."""

    class Toy:
        def __init__(self, n):
            self.lengths = np.random.default_rng(3).integers(8, 65, n)

        def __len__(self):
            return len(self.lengths)

        def __getitem__(self, i):
            return int(i)

    ds = Toy(256)
    collate = lambda items, pad_batch_to: list(items)
    plain = Loader(ds, 16, collate, shuffle=True, seed=0, num_threads=2)
    bucketed = Loader(
        ds, 16, collate, shuffle=True, seed=0, num_threads=2,
        lengths=ds.lengths, bucket_window=4,
    )

    def epoch_stats(loader):
        seen, waste = [], 0
        for batch in loader:
            ls = ds.lengths[batch]
            waste += int((ls.max() - ls).sum())
            seen.extend(batch)
        return sorted(seen), waste

    seen_b, waste_b = epoch_stats(bucketed)
    seen_p, waste_p = epoch_stats(plain)
    assert seen_b == list(range(256)) == seen_p  # exact population
    assert waste_b < 0.5 * waste_p, (waste_b, waste_p)
    # batch order is de-correlated from length order across epochs
    bucketed.set_epoch(1)
    seen2, _ = epoch_stats(bucketed)
    assert seen2 == list(range(256))


def test_driver_trains_with_length_buckets(tmp_path):
    """Full driver loop with length_buckets: learns, logs, and pads fewer
    tokens than pad-to-max (measured through the collate bucket sizes)."""
    from univtg_tpu.data.mr import MRDataConfig, MRDataset
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    corpus = create_synthetic_mr_corpus(
        str(tmp_path / "corpus"), n_train=32, n_val=8, seed=9
    )
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
    buckets = (48, 64, corpus["max_clips"])
    cfg = TrainConfig(
        model=model,
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=str(tmp_path / "run"),
        bsz=8, eval_bsz=8, n_epoch=2, eval_epoch=2, lr=3e-4, lr_warmup=1,
        lr_drop=100, max_es_cnt=100, save_interval=-1,
        length_buckets=buckets,
    )
    metrics, best_path = train_mr(cfg)
    assert os.path.exists(best_path)
    lines = [json.loads(l) for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss_overall"])

    # measured padding reduction on this corpus's length distribution
    ds = MRDataset(cfg.train_data)
    lens = ds.feature_lengths()
    loader = Loader(
        ds, 8,
        lambda items, pad_batch_to: collate_mr(
            items, 10, corpus["max_clips"], pad_batch_to, v_buckets=buckets
        ),
        shuffle=True, seed=0, num_threads=2, lengths=lens,
    )
    bucket_tokens = sum(
        b["model_inputs"]["src_vid"].shape[0] * b["model_inputs"]["src_vid"].shape[1]
        for b in loader
    )
    max_tokens = len(loader) * 8 * corpus["max_clips"]
    assert bucket_tokens < max_tokens, (bucket_tokens, max_tokens)


def test_driver_buckets_compose_with_scan_steps(tmp_path):
    """length_buckets + scan_steps>1: same-bucket batches stack into scan
    dispatches, ragged remainders flush through the single step; the epoch
    still covers every batch."""
    from univtg_tpu.data.mr import MRDataConfig
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    corpus = create_synthetic_mr_corpus(
        str(tmp_path / "corpus"), n_train=32, n_val=8, seed=11
    )
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
        lr_drop=100, save_interval=-1,
        length_buckets=(48, 64, corpus["max_clips"]), scan_steps=2,
    )
    train_mr(cfg)
    lines = [json.loads(l) for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))]
    assert lines[0]["steps"] == 4  # 32 samples / bsz 8
    assert np.isfinite(lines[0]["loss_overall"])


def test_ladder_below_max_never_truncates():
    """A bucket ladder whose top rung is below the batch max must pad to
    max_v_l (implicit top bucket), never truncate: label indices point into
    the full clip range (review r3 finding)."""
    rng = np.random.default_rng(2)
    items = [_item(rng, 20), _item(rng, 30)]
    b = collate_mr(items, 8, 64, v_buckets=(16,))
    assert b["model_inputs"]["src_vid"].shape[1] == 64  # NOT 16
    np.testing.assert_array_equal(b["model_inputs"]["src_vid_mask"].sum(1), [20, 30])
    # all label indices remain addressable
    assert int(b["targets"]["saliency_pos_labels"].max()) < 64




def test_global_bucket_plan_consistent_across_shards():
    """plan_shards: every rank derives the identical global batch plan, the
    ranks' batches partition the dataset exactly, per-step pad targets are
    identical across ranks, and the collated shapes agree (the SPMD shape
    contract for multi-process length bucketing)."""

    class Toy:
        def __init__(self, n, rng):
            self.lengths = rng.integers(8, 65, n)

        def __len__(self):
            return len(self.lengths)

        def __getitem__(self, i):
            return int(i)

    rng = np.random.default_rng(4)
    ds = Toy(140, rng)  # NOT a multiple of the global batch (drops remainder)
    collected = {}
    for shard in (0, 1):
        loader = Loader(
            ds, 8,
            lambda items, pad_batch_to, pad_v_to=None: (list(items), pad_v_to),
            shuffle=True, seed=3, num_threads=2,
            shard_index=shard, num_shards=2,
            lengths=ds.lengths, plan_shards=True, plan_buckets=(16, 32, 64),
        )
        assert len(loader) == 140 // 16  # full global batches only
        collected[shard] = list(loader)

    seen = []
    for (b0, h0), (b1, h1) in zip(collected[0], collected[1]):
        assert h0 == h1  # identical per-step pad target on every rank
        assert len(b0) == len(b1) == 8
        # the hint covers both ranks' actual lengths (margin included)
        assert max(ds.lengths[b0 + b1]) <= h0
        seen += b0 + b1
    assert len(seen) == len(set(seen)) == 16 * (140 // 16)  # exact partition

    # epoch change -> different plan, still consistent
    l0 = Loader(
        ds, 8, lambda items, pad_batch_to, pad_v_to=None: (list(items), pad_v_to),
        shuffle=True, seed=3, num_threads=2, shard_index=0, num_shards=2,
        lengths=ds.lengths, plan_shards=True, plan_buckets=(16, 32, 64),
    )
    l0.set_epoch(1)
    other = [b for b, _ in l0]
    assert other != [b for b, _ in collected[0]]


def test_collate_pad_v_to_undershoot_warns_and_clamps():
    """Plan under-shoot (metadata durations disagree with feature files):
    collate keeps the rank-uniform planned shape -- raising on ONE rank
    would hang the rest of the SPMD gang mid-collective -- but warns loudly
    and clamps clip-index labels into range instead of leaving them
    pointing past the cut."""
    rng = np.random.default_rng(5)
    item = _item(rng, 20)
    item["saliency_pos_labels"] = np.asarray([19], np.int32)  # will be cut
    with pytest.warns(UserWarning, match="under-shoot"):
        b = collate_mr([item], 8, 64, pad_v_to=16)
    assert b["model_inputs"]["src_vid"].shape[1] == 16  # planned shape kept
    assert int(b["targets"]["saliency_pos_labels"].max()) <= 15
    assert int(b["targets"]["saliency_neg_labels"].max()) <= 15

    # adequate plan: no warning, no clamp
    b2 = collate_mr([_item(rng, 20)], 8, 64, pad_v_to=32)
    assert b2["model_inputs"]["src_vid"].shape[1] == 32


def test_driver_multiprocess_guard_without_lengths(tmp_path):
    """Datasets without feature_lengths() cannot be bucket-planned across
    ranks -> clear error instead of an SPMD shape divergence."""
    from univtg_tpu.data.mr import MRDataConfig
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    corpus = create_synthetic_mr_corpus(str(tmp_path / "c"), n_train=8, n_val=4, seed=1)

    class NoLengths:
        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def __getitem__(self, i):
            return self._inner[i]

    from univtg_tpu.data.mr import MRDataset

    data_cfg = MRDataConfig(
        dset_name="qvhighlights", data_path=corpus["train_path"],
        v_feat_dirs=corpus["v_feat_dirs"], q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"], v_feat_dim=corpus["v_dim"],
        clip_len=corpus["clip_len"], max_q_l=10, max_v_l=corpus["max_clips"],
    )
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2, txt_dim=corpus["q_dim"], hidden_dim=32,
        num_layers=1, num_heads=4, ffn_dim=48, max_v_l=corpus["max_clips"], max_q_l=10,
    )
    cfg = TrainConfig(
        model=model, train_data=data_cfg,
        results_dir=str(tmp_path / "run"),
        bsz=4, n_epoch=1, dp=1, length_buckets=(48, 64), num_shards=2,
        shard_index=0,
    )
    with pytest.raises(ValueError, match="feature_lengths"):
        train_mr(cfg, train_dataset=NoLengths(MRDataset(data_cfg)))
