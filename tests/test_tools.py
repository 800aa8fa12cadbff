"""Offline tooling: windows utils (reference doctest vectors), KTS parity vs
the reference DP, teacher pseudo-labels, h5 packing, codalab zip."""
import json
import os
import sys
import zipfile

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from univtg_tpu.core.kts import cpd_auto, cpd_nonlin, segment_scatters
from univtg_tpu.core.windows import (
    clip_ids_to_windows,
    clip_window_to_seconds,
    windows_to_clip_ids,
)
from univtg_tpu.tools.codalab import package_submission
from univtg_tpu.tools.pack_h5 import pack_feature_dir
from univtg_tpu.tools.teacher import pseudo_label_video, score_curve_windows


def test_windows_doctest_vectors():
    ids = [56, 57, 58, 59, 60, 61, 62] + [64] + [67, 68, 69, 70, 71]
    assert clip_ids_to_windows(ids) == [[56, 62], [64, 64], [67, 71]]
    assert windows_to_clip_ids([[56, 62], [64, 64], [67, 71]]) == ids
    assert clip_window_to_seconds([10, 19], 2) == [20, 40]


@pytest.mark.parametrize("seed", range(3))
def test_kts_matches_reference(seed):
    from utils.cpd_nonlin import cpd_nonlin as ref_nonlin, calc_scatters

    rng = np.random.default_rng(seed)
    # piecewise-constant signal with 3 true segments
    X = np.concatenate(
        [
            rng.normal(0, 0.3, (12, 4)),
            rng.normal(3, 0.3, (10, 4)),
            rng.normal(-2, 0.3, (14, 4)),
        ]
    )
    K = X @ X.T
    np.testing.assert_allclose(segment_scatters(K), calc_scatters(K), atol=1e-8)
    cps, obj = cpd_nonlin(K, 2, lmin=2, lmax=40)
    ref_cps, ref_obj = ref_nonlin(K, 2, lmin=2, lmax=40, verbose=False)
    np.testing.assert_array_equal(cps, ref_cps)
    np.testing.assert_allclose(obj[: 3], ref_obj[:3], atol=1e-6)
    # change points near the true boundaries
    assert abs(cps[0] - 12) <= 1 and abs(cps[1] - 22) <= 1


def test_kts_auto():
    rng = np.random.default_rng(1)
    X = np.concatenate(
        [rng.normal(0, 0.2, (15, 4)), rng.normal(4, 0.2, (15, 4))]
    )
    K = X @ X.T
    cps, costs = cpd_auto(K, 5, vmax=1.0, lmin=2, lmax=40)
    assert len(costs) == 6
    assert len(cps) >= 1 and abs(cps[0] - 15) <= 1


def test_score_curve_windows():
    # max level 2 runs: [2,2] at idx 1-2, [2] at idx 5; trailing run dropped
    scores = [1, 2, 2, 0, 1, 2]
    assert score_curve_windows(scores, clip_len=2.0) == [[2.0, 6.0]]
    scores = [2, 1, 2, 0]
    assert score_curve_windows(scores, 2.0) == [[0, 2.0], [4.0, 6.0]]


def test_pseudo_label_video():
    rng = np.random.default_rng(0)
    C, D, T = 6, 16, 20
    bank = rng.standard_normal((C, D)).astype(np.float32)
    feats = 0.1 * rng.standard_normal((T, D)).astype(np.float32)
    feats[5:9] += bank[2]  # concept 2 active in clips 5..8
    names = [f"concept{i}" for i in range(C)]
    rows = pseudo_label_video("v0", feats, bank, names, clip_len=2.0, topk=3)
    assert rows and all(r["vid"] == "v0" for r in rows)
    by_query = {r["query"]: r for r in rows}
    # the injected concept must surface with a window over clips 5..8
    assert "concept2" in by_query
    assert any(8 <= w[0] <= 12 for w in by_query["concept2"]["relevant_windows"])
    assert len(rows[0]["saliency_scores"]) == T


def test_pack_h5_roundtrip(tmp_path):
    import h5py

    d = tmp_path / "feats"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.savez(d / f"v{i}.npz", features=rng.standard_normal((5, 8)).astype(np.float32))
    out = tmp_path / "packed.hdf5"
    n = pack_feature_dir(str(d), str(out))
    assert n == 3
    with h5py.File(out) as f:
        arr = f["v1"][:]
        np.testing.assert_allclose(np.linalg.norm(arr, axis=1), 1.0, atol=1e-3)


def test_codalab_zip(tmp_path):
    val = tmp_path / "val.jsonl"
    test = tmp_path / "test.jsonl"
    val.write_text(json.dumps({"qid": 1}))
    test.write_text(json.dumps({"qid": 2}))
    out = package_submission(str(val), str(test), str(tmp_path / "sub.zip"))
    with zipfile.ZipFile(out) as z:
        assert set(z.namelist()) == {
            "hl_val_submission.jsonl",
            "hl_test_submission.jsonl",
        }


def test_encode_class_bank():
    import jax

    from univtg_tpu.extract.clip.model import CLIP, CLIPConfig
    from univtg_tpu.extract.pipeline import ClipEncoder
    from univtg_tpu.tools.teacher import encode_class_bank

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=4, transformer_layers=1,
    )
    model = CLIP(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, 77), np.int32),
    )
    enc = ClipEncoder(params, cfg, text_batch=2)
    bank = encode_class_bank(enc, ["dog", "pizza", "surfing"])
    assert bank.shape == (3, 32)
    assert np.isfinite(bank).all()
