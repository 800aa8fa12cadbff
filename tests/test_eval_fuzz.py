"""Randomized full-evaluator parity: eval_submission vs the reference
implementation on generated submissions/GT (beyond the fixed golden
fixtures)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

pytest.importorskip("sklearn")
from eval.eval import eval_submission as ref_eval_submission  # noqa: E402

from univtg_tpu.evals import eval_submission  # noqa: E402


def make_random_eval_data(seed, n_queries=40):
    rng = np.random.default_rng(seed)
    submission, gt = [], []
    for q in range(n_queries):
        duration = int(rng.choice([60, 100, 150]))
        n_clips = duration // 2
        n_gt = int(rng.integers(1, 4))
        gt_windows = []
        for _ in range(n_gt):
            st = int(rng.integers(0, n_clips - 2)) * 2
            ed = int(rng.integers(st // 2 + 1, n_clips)) * 2
            gt_windows.append([st, ed])
        rel_ids = sorted({int(i) for w in gt_windows for i in range(w[0] // 2, w[1] // 2)})
        sal = [[int(rng.integers(0, 5)) for _ in range(3)] for _ in rel_ids]
        gt.append(
            {
                "qid": q,
                "query": f"q{q}",
                "vid": f"v{q}",
                "duration": duration,
                "relevant_windows": gt_windows,
                "relevant_clip_ids": rel_ids,
                "saliency_scores": sal,
            }
        )
        n_pred = int(rng.integers(1, 12))
        preds = []
        for _ in range(n_pred):
            st = float(rng.uniform(0, duration - 4))
            ed = float(rng.uniform(st + 1, duration))
            preds.append([round(st, 4), round(ed, 4), round(float(rng.uniform(0, 1)), 4)])
        preds.sort(key=lambda x: -x[2])
        submission.append(
            {
                "qid": q,
                "query": f"q{q}",
                "vid": f"v{q}",
                "pred_relevant_windows": preds,
                "pred_saliency_scores": np.round(
                    rng.uniform(-1, 1, n_clips), 4
                ).tolist(),
            }
        )
    return submission, gt


@pytest.mark.parametrize("seed", range(3))
def test_full_evaluator_fuzz(seed):
    submission, gt = make_random_eval_data(seed)
    want = ref_eval_submission(
        [dict(s) for s in submission], [dict(g) for g in gt], verbose=False
    )
    got = eval_submission(submission, gt, num_workers=1)
    assert dict(got["brief"]) == dict(want["brief"])
    for rng_name in ("short", "middle", "long", "full"):
        assert got[rng_name]["MR-mAP"] == want[rng_name]["MR-mAP"], rng_name
        assert got[rng_name]["MR-R1"] == want[rng_name]["MR-R1"], rng_name
        assert got[rng_name]["MR-R5"] == want[rng_name]["MR-R5"], rng_name
    for name in ("HL-min-Fair", "HL-min-Good", "HL-min-VeryGood"):
        assert got[name] == want[name], name
