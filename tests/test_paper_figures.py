"""Paper-figure parity (plot/qvhl.py:35-330): pred-vs-baseline-vs-GT
comparison figure sets rendered from the reference's own shipped prediction
fixtures (plot/qvhl/{univtg,momentdetr,gt}.jsonl)."""
import os

import numpy as np
import pytest

FIX = "/root/reference/plot/qvhl"
VIDEO = "/root/reference/examples/charades.mp4"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "gt.jsonl")), reason="no fixtures"
)


@pytest.fixture(scope="module")
def rows():
    from univtg_tpu.data.features import load_jsonl

    preds = {r["qid"]: r for r in load_jsonl(os.path.join(FIX, "univtg.jsonl"))}
    gts = {r["qid"]: r for r in load_jsonl(os.path.join(FIX, "gt.jsonl"))}
    bases = {r["qid"]: r for r in load_jsonl(os.path.join(FIX, "momentdetr.jsonl"))}
    qid = next(q for q in preds if q in gts and q in bases)
    return preds[qid], gts[qid], bases[qid]


def test_mr_paper_bars(rows):
    import matplotlib.pyplot as plt

    from univtg_tpu.tools.plots import plot_mr_paper

    pred, gt, base = rows
    fig = plot_mr_paper(pred, gt, baseline_row=base, pred_num=1)
    ax = fig.axes[0]
    # 3 white track bars + 1 window bar per system
    assert len(ax.patches) == 3 + 3
    assert ax.get_xlim() == (0.0, float(gt["duration"]))
    labels = [t.get_text() for t in ax.texts]
    assert any("GT Interval" in l for l in labels)
    assert any("UniVTG" in l for l in labels)
    assert any("Baseline" in l for l in labels)
    plt.close(fig)


def test_hl_paper_curves(rows):
    import matplotlib.pyplot as plt

    from univtg_tpu.tools.plots import plot_hl_paper

    pred, gt, base = rows
    fig = plot_hl_paper(pred, gt, baseline_row=base, gap=10.0)
    ax = fig.axes[0]
    assert len(ax.lines) == 3
    for line in ax.lines:  # min-max normalized curves
        y = line.get_ydata()
        assert y.min() >= -1e-9 and y.max() <= 1 + 1e-9
    plt.close(fig)


def test_render_comparison_set(rows, tmp_path):
    from univtg_tpu.tools.plots import render_comparison

    pred, gt, base = rows
    out = render_comparison(pred, gt, str(tmp_path), baseline_row=base)
    files = sorted(os.listdir(out))
    assert files == ["1_mr.jpg", "2_hl.jpg", "combined.jpg"]
    for f in files:
        assert os.path.getsize(os.path.join(out, f)) > 10_000
    # dir name leads with the top-1 IoU like the reference's save_dir_i
    leading = os.path.basename(out).split("_")[0]
    assert 0.0 <= float(leading) <= 1.0


@pytest.mark.skipif(not os.path.exists(VIDEO), reason="no example video")
def test_frame_strip(rows, tmp_path):
    import matplotlib.pyplot as plt

    from univtg_tpu.tools.plots import plot_frame_strip

    out = str(tmp_path / "strip.jpg")
    fig = plot_frame_strip(VIDEO, 30.0, "person opens a door", out, n_frames=5)
    assert fig is not None
    assert os.path.getsize(out) > 20_000
    plt.close(fig)
    # absent video -> None, no crash
    assert plot_frame_strip("/nonexistent.mp4", 30.0, "q") is None


def test_comparison_set_batch(tmp_path):
    from univtg_tpu.tools.plots import plot_comparison_set

    made = plot_comparison_set(
        os.path.join(FIX, "univtg.jsonl"),
        os.path.join(FIX, "gt.jsonl"),
        str(tmp_path),
        baseline_jsonl=os.path.join(FIX, "momentdetr.jsonl"),
        max_queries=2,
    )
    assert len(made) == 2
    for d in made:
        assert os.path.exists(os.path.join(d, "combined.jpg"))
