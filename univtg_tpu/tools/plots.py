"""Figure plotting for qualitative results.

Matplotlib rework of the reference's plot/ tooling (plot/qvhl.py:35-330):
per-query MR window + saliency-curve figures from prediction/GT jsonls.
Offline tooling -- not part of the runtime path.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def plot_query(
    pred_row: dict,
    gt_row: Optional[dict] = None,
    clip_len: float = 2.0,
    out_path: Optional[str] = None,
    baseline_row: Optional[dict] = None,
):
    """One query -> figure: saliency curve + top predicted windows vs GT.

    Args:
      pred_row: submission row (pred_relevant_windows, pred_saliency_scores).
      gt_row: optional GT row (relevant_windows, saliency_scores, duration).
      baseline_row: optional second submission row for comparison.
    Returns the matplotlib Figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_sal, ax_win) = plt.subplots(
        2, 1, figsize=(10, 4), sharex=True, height_ratios=[2, 1]
    )
    sal = np.asarray(pred_row["pred_saliency_scores"], np.float64)
    t = np.arange(len(sal)) * clip_len + clip_len / 2
    ax_sal.plot(t, sal, label="pred saliency", color="#1f77b4")
    if gt_row is not None and isinstance(gt_row.get("saliency_scores"), list):
        gt_sal = np.zeros(len(sal))
        ids = np.asarray(gt_row["relevant_clip_ids"])
        vals = np.mean(np.asarray(gt_row["saliency_scores"], np.float64), axis=1)
        keep = ids < len(sal)
        gt_sal[ids[keep]] = vals[keep]
        ax_sal.plot(t, gt_sal / 4.0 * (sal.max() - sal.min() + 1e-6) + sal.min(),
                    label="gt saliency (scaled)", color="#2ca02c", alpha=0.7)
    ax_sal.legend(loc="upper right", fontsize=8)
    ax_sal.set_ylabel("saliency")
    ax_sal.set_title(str(pred_row.get("query", pred_row.get("qid", ""))), fontsize=9)

    def draw_windows(rows, y, color, label):
        first = True
        for w in rows:
            ax_win.barh(y, w[1] - w[0], left=w[0], height=0.6, color=color,
                        alpha=0.8, label=label if first else None)
            first = False

    draw_windows(pred_row["pred_relevant_windows"][:3], 2, "#1f77b4", "pred top-3")
    if baseline_row is not None:
        draw_windows(baseline_row["pred_relevant_windows"][:3], 1, "#ff7f0e", "baseline")
    if gt_row is not None:
        draw_windows(gt_row.get("relevant_windows", []), 0, "#2ca02c", "gt")
    ax_win.set_yticks([])
    ax_win.set_xlabel("time (s)")
    ax_win.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, dpi=120)
    return fig


def plot_submission(
    pred_jsonl: str,
    gt_jsonl: Optional[str],
    out_dir: str,
    max_queries: int = 20,
    clip_len: float = 2.0,
    baseline_jsonl: Optional[str] = None,
):
    """Dump per-query figures for the first max_queries queries."""
    import matplotlib.pyplot as plt

    from univtg_tpu.data.features import load_jsonl

    preds = load_jsonl(pred_jsonl)[:max_queries]
    gts = {r["qid"]: r for r in load_jsonl(gt_jsonl)} if gt_jsonl else {}
    baselines = (
        {r["qid"]: r for r in load_jsonl(baseline_jsonl)} if baseline_jsonl else {}
    )
    os.makedirs(out_dir, exist_ok=True)
    for row in preds:
        fig = plot_query(
            row,
            gts.get(row["qid"]),
            clip_len,
            os.path.join(out_dir, f"{row['qid']}.png"),
            baselines.get(row["qid"]),
        )
        plt.close(fig)
    return len(preds)
