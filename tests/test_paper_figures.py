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


def test_frame_strip_with_template(tmp_path):
    """apply_template (plot/qvhl.py:21-33): the frame lands on a white
    canvas 1.4x its height at 19% offset, the RGBA template composites on
    top. Pinned against a hand-computed composite on a synthetic frame +
    synthetic half-transparent template."""
    from PIL import Image

    from univtg_tpu.tools.plots import apply_template, plot_frame_strip

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    # template: opaque red top band, transparent rest
    tpl = np.zeros((56, 60, 4), np.uint8)
    tpl[:8, :, 0] = 255
    tpl[:8, :, 3] = 255
    tpl_path = str(tmp_path / "template.png")
    Image.fromarray(tpl, "RGBA").save(tpl_path)

    out = apply_template(frame, tpl_path)
    assert out.shape == (56, 60, 3)  # 1.4x height canvas
    np.testing.assert_array_equal(out[:8], np.broadcast_to([255, 0, 0], (8, 60, 3)))
    # the frame region (below the 19% offset) shows through the transparency
    y0 = int(40 * 0.19)
    np.testing.assert_array_equal(out[y0 + 8 : y0 + 40], frame[8:])

    # end to end through the strip renderer on the shipped demo video
    if os.path.exists(VIDEO):
        import matplotlib.pyplot as plt

        out_path = str(tmp_path / "strip_tpl.jpg")
        fig = plot_frame_strip(
            VIDEO, 30.0, "q", out_path, n_frames=3, template_path=tpl_path
        )
        assert fig is not None and os.path.getsize(out_path) > 10_000
        plt.close(fig)


def test_vs_paper_shot_tracks(tmp_path):
    """QFVS summary figure (plot/qfvs.py:115-215): two shot tracks with the
    selected cells filled, H:MM:SS end labels at 5 s/shot."""
    import matplotlib.pyplot as plt

    from univtg_tpu.tools.plots import plot_vs_paper, seconds_to_hms

    assert seconds_to_hms(0) == "0:00:00"
    assert seconds_to_hms(3725) == "1:02:05"
    row = {"shots": 120, "gt": [3, 4, 5, 50, 51], "top_pred": [3, 4, 40, 90]}
    out = str(tmp_path / "vs.jpg")
    fig = plot_vs_paper(row, out)
    assert os.path.getsize(out) > 10_000
    plt.close(fig)


def test_render_comparison_part_selection(rows, tmp_path):
    """MR-only (ego4d/tacos variants) and HL-only (tvsum/youtube variants)
    figure sets via the `include` selector; the HL figure also renders with
    gt_row=None (TVSum has no per-query GT rows)."""
    import matplotlib.pyplot as plt

    from univtg_tpu.tools.plots import plot_hl_paper, render_comparison

    pred, gt, base = rows
    d = render_comparison(pred, gt, str(tmp_path / "mr_only"), include=("mr",))
    files = set(os.listdir(d))
    assert "1_mr.jpg" in files and "2_hl.jpg" not in files
    d = render_comparison(pred, gt, str(tmp_path / "hl_only"), include=("hl",))
    files = set(os.listdir(d))
    assert "2_hl.jpg" in files and "1_mr.jpg" not in files

    fig = plot_hl_paper(pred, None, str(tmp_path / "hl_nogt.jpg"),
                        baseline_row=base)
    assert os.path.getsize(str(tmp_path / "hl_nogt.jpg")) > 10_000
    plt.close(fig)
