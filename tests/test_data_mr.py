"""MR data pipeline unit tests (hand-derived vectors; the reference
DatasetMR is not importable here -- it requires nncore)."""
import numpy as np
import pytest

from univtg_tpu.data.collate import collate_mr
from univtg_tpu.data.mr import (
    MRDataConfig,
    MRDataset,
    assign_nearest_windows,
    clamp_short_windows,
    tef_features,
    timestamp_grid,
)
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return create_synthetic_mr_corpus(str(root), n_train=12, n_val=6, seed=1)


def make_ds(corpus, split="train_path", **kw):
    cfg = MRDataConfig(
        dset_name="qvhighlights",
        data_path=corpus[split],
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        clip_len=corpus["clip_len"],
        max_q_l=10,
        max_v_l=corpus["max_clips"],
        **kw,
    )
    return MRDataset(cfg)


def test_timestamp_grid():
    ts = timestamp_grid(4, 2.0)
    np.testing.assert_allclose(ts[:, 0], [0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(ts[:, 0], ts[:, 1])


def test_assign_nearest_windows():
    ts = timestamp_grid(10, 2.0)  # centers 0.1..1.0
    windows = np.array([[0.0, 0.35], [0.5, 0.95]], np.float32)
    nn, win = assign_nearest_windows(ts, windows)
    # clips 0,1,2 (0.1,0.2,0.3) in w0; 4..8 (0.5..0.9) in w1 (0.95>=ts needs ts<=0.95)
    assert win[:3].tolist() == [1, 1, 1]
    assert win[3] == 0
    np.testing.assert_allclose(nn[1], windows[0])
    np.testing.assert_allclose(nn[5], windows[1])
    # a clip inside no window keeps zeros
    np.testing.assert_allclose(nn[3], [0, 0])


def test_assign_no_hit_falls_back_to_first_window():
    ts = timestamp_grid(3, 2.0)
    windows = np.array([[2.0, 3.0]], np.float32)  # contains no clip center span
    nn, win = assign_nearest_windows(ts, windows)
    assert win.sum() == 0
    np.testing.assert_allclose(nn, np.tile(windows[0], (3, 1)))


def test_clamp_short_windows():
    out = clamp_short_windows([[10.0, 10.5]], duration=100, clip_len=2.0)
    assert out[0][1] - out[0][0] == pytest.approx(2.0)


def test_tef():
    tef = tef_features(4)
    np.testing.assert_allclose(tef[0], [0, 0.25])
    np.testing.assert_allclose(tef[-1], [0.75, 1.0])


def test_dataset_item_contract(corpus):
    ds = make_ds(corpus)
    item = ds[0]
    Lv, Dv = item["video_feat"].shape
    assert Dv == corpus["v_dim"] + 2  # TEF
    assert item["timestamp"].shape == (Lv, 2)
    assert item["timestamp_window"].sum() >= 1
    assert item["saliency_scores"].shape == (Lv,)
    assert 0 <= item["saliency_pos_labels"][0] < Lv
    # features L2-normalized (pre-TEF part)
    norms = np.linalg.norm(item["video_feat"][:, :-2], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # positive clip lies inside the GT window
    w = item["meta"]["relevant_windows"][0]
    st, ed = int(w[0] / 2.0), int(w[1] / 2.0)
    nz = np.flatnonzero(item["timestamp_window"])
    # clip centers on the window boundary are included -> allow one-off at start
    assert st - 1 <= nz[0] and nz[-1] <= ed


def test_dataset_determinism(corpus):
    ds = make_ds(corpus)
    a = ds[3]
    b = ds[3]
    assert a["saliency_pos_labels"].tolist() == b["saliency_pos_labels"].tolist()
    ds.set_epoch(1)
    # different epoch may resample; array contract intact
    c = ds[3]
    assert c["saliency_pos_labels"].shape == a["saliency_pos_labels"].shape


def test_collate_static_shapes(corpus):
    ds = make_ds(corpus)
    items = [ds[i] for i in range(5)]
    batch = collate_mr(items, max_q_l=10, max_v_l=corpus["max_clips"], pad_batch_to=8)
    mi, tg = batch["model_inputs"], batch["targets"]
    assert mi["src_vid"].shape == (8, 75, corpus["v_dim"] + 2)
    assert mi["src_txt"].shape == (8, 10, corpus["q_dim"])
    assert tg["batch_mask"].tolist() == [1, 1, 1, 1, 1, 0, 0, 0]
    assert len(batch["meta"]) == 5
    # masks mark real rows
    lens = mi["src_vid_mask"].sum(1)
    assert (lens[:5] == [len(it["video_feat"]) for it in items]).all()


def test_loader_propagates_dataset_errors(corpus):
    from univtg_tpu.data.loader import Loader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return {"x": np.zeros(3)}

    loader = Loader(Broken(), 4, lambda items, pad_batch_to: items, num_threads=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_clip_len_one_semantics(tmp_path):
    """Charades-style clip_len=1: timestamp grid, window densification, and
    span normalization all scale by clip_len (dataset.py:501, 511, 634)."""
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus

    corpus = create_synthetic_mr_corpus(
        str(tmp_path / "c1"), n_train=6, n_val=2, clip_len=1.0, max_clips=40, seed=21
    )
    cfg = MRDataConfig(
        dset_name="charades",
        data_path=corpus["train_path"],
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        clip_len=1.0,
        max_q_l=10,
        max_v_l=40,
    )
    ds = MRDataset(cfg)
    item = ds[0]
    L = len(item["video_feat"])
    # grid: (i + 0.5) / L at clip_len=1
    np.testing.assert_allclose(item["timestamp"][:, 0], (np.arange(L) + 0.5) / L)
    # densified window normalized by L * clip_len == duration
    w = item["meta"]["relevant_windows"][0]
    nz = np.flatnonzero(item["timestamp_window"])
    inside = item["span_labels_nn"][nz[0]]
    np.testing.assert_allclose(inside, np.asarray(w) / (L * 1.0), atol=1e-6)
    # span labels cxw normalized by duration
    cx, width = item["span_labels"][0]
    assert cx == pytest.approx((w[0] + w[1]) / 2 / (L * 1.0), abs=1e-6)
    assert width == pytest.approx((w[1] - w[0]) / (L * 1.0), abs=1e-6)


def test_saliency_sampling_variants():
    from univtg_tpu.data.mr import (
        sample_saliency_from_scores,
        sample_saliency_sub_as_query,
    )

    rng = np.random.default_rng(0)
    rel_ids = [3, 4, 5, 6]
    scores = [[1, 1, 1], [4, 4, 4], [2, 2, 2], [0, 0, 0]]
    # easy-only (default): positives drawn from rel ids, negatives outside
    pos, neg = sample_saliency_from_scores(rel_ids, scores, 20, rng)
    assert pos[0] in rel_ids and neg[0] not in rel_ids
    # hard+easy (easy_negative_only=0): best/worst scored + one random pair
    pos, neg = sample_saliency_from_scores(
        rel_ids, scores, 20, rng, add_easy_negative=1, easy_negative_only=0
    )
    assert pos[0] == 4 and neg[0] == 6  # argmax/argmin of summed scores
    assert len(pos) == 2 and len(neg) == 2
    # equal scores: hard negatives collapse onto positives (dataset.py:602-603)
    pos, neg = sample_saliency_from_scores(
        [1, 2], [[2, 2, 2], [2, 2, 2]], 20, rng, add_easy_negative=0,
        easy_negative_only=0,
    )
    assert pos == neg
    # sub-as-query: pos inside the window, neg outside; degenerate window
    pos, neg = sample_saliency_sub_as_query([8.0, 16.0], 20, 2.0, rng)
    assert 4 <= pos[0] <= 7 and not (4 <= neg[0] <= 7)
    pos, neg = sample_saliency_sub_as_query([0.0, 40.0], 5, 2.0, rng)
    assert neg == pos  # empty negative pool falls back to positives
