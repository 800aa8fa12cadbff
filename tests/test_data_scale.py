"""VLP-scale data path: a 100k-sample lazy-metadata corpus streams through
the shard-aware Loader with 8 disjoint per-host shards, deterministic
shuffles, and no per-record dict residency (the reference holds the whole
4.2M-sample corpus in RAM, main/dataset.py:133-148; shard loading replaces
its DistributedSampler, train_vlp_ddp.py:112)."""
import json
import os

import numpy as np
import pytest

from univtg_tpu.data.features import LazyJsonl, load_jsonl
from univtg_tpu.data.loader import Loader
from univtg_tpu.data.mr import MRDataConfig, MRDataset
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus

N = 100_000
N_VIDS = 32  # metadata scales to 100k rows; features are shared across rows


@pytest.fixture(scope="module")
def big_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("scale")
    base = create_synthetic_mr_corpus(
        str(root / "feats"), n_train=N_VIDS, n_val=4, seed=17, max_clips=20
    )
    # reuse the base corpus's (vid, qid) feature files across 100k rows
    rows = load_jsonl(base["train_path"])
    path = str(root / "big_train.jsonl")
    with open(path, "w") as f:
        for i in range(N):
            r = dict(rows[i % len(rows)])
            r["qid"] = rows[i % len(rows)]["qid"]
            f.write(json.dumps(r) + "\n")
    return base, path


def make_ds(base, path, lazy=True):
    return MRDataset(
        MRDataConfig(
            dset_name="qvhighlights",
            data_path=path,
            v_feat_dirs=base["v_feat_dirs"],
            q_feat_dir=base["q_feat_dir"],
            q_feat_dim=base["q_dim"],
            v_feat_dim=base["v_dim"],
            max_q_l=10,
            max_v_l=20,
            lazy_metadata=lazy,
        )
    )


def test_lazy_jsonl_semantics(big_corpus):
    base, path = big_corpus
    lz = LazyJsonl(path)
    eager = load_jsonl(path)
    assert len(lz) == N == len(eager)
    for i in (0, 1, 12_345, N - 1):
        assert lz[i] == eager[i]
    # slicing returns a lazy view, not parsed dicts
    view = lz[1000:1010]
    assert isinstance(view, LazyJsonl)
    assert len(view) == 10
    assert view[0] == eager[1000]
    # memory: offsets only (8 bytes/record)
    assert lz.offsets.nbytes == N * 8


def test_lazy_dataset_matches_eager(big_corpus):
    base, path = big_corpus
    lazy_ds = make_ds(base, path, lazy=True)
    eager_ds = make_ds(base, path, lazy=False)
    assert len(lazy_ds) == len(eager_ds) == N
    for i in (0, 777, 99_999):
        a, b = lazy_ds[i], eager_ds[i]
        np.testing.assert_array_equal(a["video_feat"], b["video_feat"])
        np.testing.assert_array_equal(a["timestamp_window"], b["timestamp_window"])
        assert a["meta"] == b["meta"]


def test_eight_shards_disjoint_and_deterministic(big_corpus):
    base, path = big_corpus
    ds = make_ds(base, path)

    def shard_indices(shard, epoch, seed=5):
        ld = Loader(
            ds, 64, lambda items, pad_batch_to: items, shuffle=True, seed=seed,
            shard_index=shard, num_shards=8,
        )
        ld.set_epoch(epoch)
        return ld._indices()

    shards = [shard_indices(s, epoch=0) for s in range(8)]
    sizes = {len(s) for s in shards}
    assert sizes == {N // 8}
    all_idx = np.concatenate(shards)
    assert len(np.unique(all_idx)) == N  # disjoint and covering
    # deterministic per (seed, epoch)
    np.testing.assert_array_equal(shards[3], shard_indices(3, epoch=0))
    # reshuffled across epochs
    assert not np.array_equal(shards[3], shard_indices(3, epoch=1))


@pytest.mark.slow
def test_streaming_throughput_smoke(big_corpus):
    """Batches flow through the threaded loader over the 100k lazy corpus at
    a usable rate (order 10k samples/s on CPU; we assert a very safe floor so
    the test is regression-only, not flaky)."""
    import time

    base, path = big_corpus
    ds = make_ds(base, path)
    from univtg_tpu.data.collate import collate_mr

    ld = Loader(
        ds, 256,
        lambda items, pad_batch_to: collate_mr(items, 10, 20, pad_batch_to),
        shuffle=True, seed=1, num_threads=8, shard_index=0, num_shards=8,
    )
    t0 = time.time()
    n = 0
    for batch in ld:
        n += len(batch["meta"])
        if n >= 5120:
            break
    rate = n / (time.time() - t0)
    # floor sized for a fully-loaded single-vCPU CI host (idle: ~10k/s);
    # this guards against pathological regressions only, not throughput
    assert rate > 100, f"loader too slow: {rate:.0f} samples/s"
