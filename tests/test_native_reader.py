"""Native C++ batch .npz feature reader vs the numpy path.

The native reader (univtg_tpu/native/src/feature_reader.cpp) replaces
np.load+astype+l2_normalize (reference semantics main/dataset.py:680-696,
utils/basic_utils.py:97-99) with a GIL-free zip-parse + inflate + fused
normalization. These tests pin its outputs to the numpy implementation and
its failure modes to per-file fallback.
"""
import os

import numpy as np
import pytest

from univtg_tpu.data.features import FeatureSource, l2_normalize
from univtg_tpu.native.reader import (
    native_io_enabled,
    read_npz,
    read_npz_batch,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("feats")
    rng = np.random.default_rng(7)
    spec = [
        ("stored_f4", np.savez, np.float32, (37, 13)),
        ("deflate_f4", np.savez_compressed, np.float32, (75, 40)),
        ("deflate_f2", np.savez_compressed, np.float16, (21, 8)),
        ("stored_f8", np.savez, np.float64, (5, 3)),
    ]
    arrays = {}
    for name, saver, dt, shape in spec:
        a = rng.standard_normal(shape).astype(dt)
        saver(os.path.join(d, f"{name}.npz"), features=a)
        arrays[name] = a
    np.savez(os.path.join(d, "oned.npz"), features=rng.standard_normal(16).astype(np.float32))
    np.savez(os.path.join(d, "nokey.npz"), other=np.ones(3, np.float32))
    with open(os.path.join(d, "corrupt.npz"), "wb") as f:
        f.write(b"not a zip at all")
    return str(d), arrays


def _lib_or_skip():
    from univtg_tpu.native.build import load_feature_reader

    if load_feature_reader() is None:
        pytest.skip("no native toolchain")


def test_batch_matches_numpy_all_dtypes(corpus):
    _lib_or_skip()
    d, arrays = corpus
    names = list(arrays)
    out = read_npz_batch([os.path.join(d, f"{n}.npz") for n in names], n_threads=4)
    assert out is not None
    for name, got in zip(names, out):
        ref = l2_normalize(arrays[name].astype(np.float32))
        assert got is not None and got.dtype == np.float32
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_unnormalized_is_bit_exact(corpus):
    _lib_or_skip()
    d, arrays = corpus
    got = read_npz(os.path.join(d, "stored_f4.npz"), normalize=False)
    assert np.array_equal(got, arrays["stored_f4"])
    got = read_npz(os.path.join(d, "deflate_f4.npz"), normalize=False)
    assert np.array_equal(got, arrays["deflate_f4"])


def test_rejections_return_none_per_slot(corpus):
    _lib_or_skip()
    d, _ = corpus
    paths = [
        os.path.join(d, "oned.npz"),  # non-2-D
        os.path.join(d, "nokey.npz"),  # member absent
        os.path.join(d, "corrupt.npz"),  # not a zip
        os.path.join(d, "missing.npz"),  # no such file
        os.path.join(d, "stored_f4.npz"),  # healthy neighbor unaffected
    ]
    out = read_npz_batch(paths, n_threads=2)
    assert out is not None
    assert out[:4] == [None, None, None, None]
    assert out[4] is not None


def test_feature_source_native_equals_numpy(corpus):
    _lib_or_skip()
    d, arrays = corpus
    src_np = FeatureSource(d, native=False)
    src_nat = FeatureSource(d, native=True)
    for name in arrays:
        a, b = src_np.get(name), src_nat.get(name)
        np.testing.assert_allclose(a, b, atol=2e-6)
    # native rejects 1-D -> silently falls back to the numpy path
    a, b = src_np.get("oned"), src_nat.get("oned")
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b)
    assert src_nat.get("nokey") is None
    assert src_nat.get("corrupt") is None
    assert src_nat.get("missing") is None


def test_native_default_is_env_gated(corpus, monkeypatch):
    d, _ = corpus
    monkeypatch.delenv("UNIVTG_NATIVE_IO", raising=False)
    assert not native_io_enabled()
    assert FeatureSource(d).native is False
    monkeypatch.setenv("UNIVTG_NATIVE_IO", "1")
    assert native_io_enabled()
    assert FeatureSource(d).native is True


def test_empty_batch(corpus):
    _lib_or_skip()
    assert read_npz_batch([]) == []
