"""Window post-processor length ops + padding bucket ladder."""
import numpy as np
import sys

import pytest

sys.path.insert(0, "/root/reference")

from univtg_tpu.core.padding import bucket_length, default_buckets
from univtg_tpu.evals.postprocessing import WindowPostProcessor


def test_clip_window_lengths_left():
    post = WindowPostProcessor(
        clip_length=2, min_w_l=4, max_w_l=20, move_window_method="left",
        process_func_names=("clip_window_l",),
    )
    rows = [{"pred_relevant_windows": [[0, 2, 0.9], [10, 40, 0.5], [5, 15, 0.2]]}]
    out = post(rows)[0]["pred_relevant_windows"]
    assert out[0][:2] == [0, 4]      # grown to min length, left anchored
    assert out[1][:2] == [10, 30]    # shrunk to max length
    assert out[2][:2] == [5, 15]     # untouched


def test_clip_window_lengths_center_and_right():
    for method, want in (("center", [8.5, 12.5]), ("right", [7.0, 11.0])):
        post = WindowPostProcessor(
            min_w_l=4, max_w_l=50, move_window_method=method,
            process_func_names=("clip_window_l",),
        )
        out = post([{"pred_relevant_windows": [[10, 11, 0.5]]}])
        assert out[0]["pred_relevant_windows"][0][:2] == want, method


def test_clip_ts():
    post = WindowPostProcessor(
        min_ts_val=0, max_ts_val=150, process_func_names=("clip_ts",)
    )
    out = post([{"pred_relevant_windows": [[-5, 200, 0.5]]}])
    assert out[0]["pred_relevant_windows"][0][:2] == [0, 150]


def test_full_pipeline_matches_reference():
    import types

    if "torch" not in sys.modules:
        pytest.importorskip("torch")
    from eval.postprocessing import PostProcessorDETR

    rows = [
        {"pred_relevant_windows": [[-3.2, 151.7, 0.9], [10.4, 11.1, 0.3]]},
        {"pred_relevant_windows": [[60.01, 80.49, 0.7]]},
    ]
    import copy

    ref = PostProcessorDETR(
        clip_length=2, min_ts_val=0, max_ts_val=150, min_w_l=2, max_w_l=150,
        move_window_method="left",
        process_func_names=("clip_ts", "round_multiple", "clip_window_l"),
    )
    mine = WindowPostProcessor(
        clip_length=2, min_ts_val=0, max_ts_val=150, min_w_l=2, max_w_l=150,
        move_window_method="left",
        process_func_names=("clip_ts", "round_multiple", "clip_window_l"),
    )
    want = ref(copy.deepcopy(rows))
    got = mine(copy.deepcopy(rows))
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            a["pred_relevant_windows"], b["pred_relevant_windows"], atol=1e-9
        )


def test_bucket_ladder():
    assert default_buckets(75) == [32, 64, 75]
    assert default_buckets(2048, base=128) == [128, 256, 512, 1024, 2048]
    assert bucket_length(50, [32, 64, 75]) == 64
    assert bucket_length(75, [32, 64, 75]) == 75
    assert bucket_length(100, [32, 64, 75]) == 75  # truncation bucket
