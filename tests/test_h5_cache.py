"""h5 feature-cache path: packed caches must serve the same items as npz
dirs (the reference's use_cache fast-IO mode)."""
import os

import numpy as np
import pytest

from univtg_tpu.data.mr import MRDataConfig, MRDataset
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.tools.pack_h5 import pack_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return create_synthetic_mr_corpus(
        str(tmp_path_factory.mktemp("h5c")), n_train=8, n_val=4, seed=7
    )


def test_cache_matches_npz(corpus, tmp_path):
    cache_dir = str(tmp_path / "h5py")
    counts = pack_dataset(
        corpus["train_path"], corpus["v_feat_dirs"], corpus["q_feat_dir"], cache_dir
    )
    assert all(v == 8 for v in counts.values()), counts

    kw = dict(
        dset_name="qvhighlights",
        data_path=corpus["train_path"],
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        clip_len=corpus["clip_len"],
        max_q_l=10,
        max_v_l=corpus["max_clips"],
    )
    plain = MRDataset(MRDataConfig(**kw))
    cached = MRDataset(MRDataConfig(h5_cache_dir=cache_dir, **kw))
    assert cached.v_sources[0].cache is not None
    assert cached.q_source.cache is not None

    for i in (0, 3, 7):
        a, b = plain[i], cached[i]
        np.testing.assert_allclose(a["video_feat"], b["video_feat"], atol=1e-4)
        np.testing.assert_allclose(a["query_feat"], b["query_feat"], atol=1e-4)
        np.testing.assert_array_equal(a["timestamp_window"], b["timestamp_window"])
