#!/usr/bin/env python
"""Synthetic end-to-end validation: train the grounding model on a planted
signal until the MR metrics recover it.

The synthetic corpus injects query-aligned features inside each GT window
(univtg_tpu/data/synthetic.py), so a correct pipeline must reach high
R1@0.5 / mIoU. Run on any backend:

    python scripts/validate_synthetic.py [--epochs 30] [--hidden 128]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from univtg_tpu.data.mr import MRDataConfig
from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
from univtg_tpu.models import ModelConfig
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.train.driver_mr import TrainConfig, train_mr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--bsz", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="univtg_synth_")
    corpus = create_synthetic_mr_corpus(
        root, n_train=args.n_train, n_val=64, v_dim=64, q_dim=32, seed=0
    )
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2,
        txt_dim=corpus["q_dim"],
        hidden_dim=args.hidden,
        num_layers=2,
        num_heads=4,
        ffn_dim=args.hidden,
        input_dropout=0.1,
        droppath=0.1,
        max_v_l=corpus["max_clips"],
        max_q_l=10,
    )
    data_kw = dict(
        dset_name="qvhighlights",
        v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"],
        q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"],
        max_q_l=10,
        max_v_l=corpus["max_clips"],
    )
    cfg = TrainConfig(
        model=model,
        train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
        eval_data=MRDataConfig(data_path=corpus["val_path"], **data_kw),
        results_dir=f"{root}/run",
        bsz=args.bsz,
        eval_bsz=32,
        n_epoch=args.epochs,
        eval_epoch=5,
        lr=3e-4,
        lr_warmup=3,
        lr_drop=1000,
        weights=LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1),
        save_interval=-1,
        max_es_cnt=1000,
    )
    metrics, best = train_mr(cfg)
    brief = metrics["brief"]
    line = {
        "R1@0.5": brief["MR-full-R1@0.5-key"],
        "R1@0.7": brief["MR-full-R1@0.7-key"],
        "mAP": brief["MR-full-mAP-key"],
        "mIoU": brief["MR-full-mIoU-key"],
        "HL-VeryGood-mAP": brief["HL-min-VeryGood-mAP-key"],
        "best_ckpt": best,
    }
    print(json.dumps(line, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(line, f, indent=1)
    ok = line["R1@0.5"] > 50 and line["mIoU"] > 50
    print("VALIDATION", "PASSED" if ok else "WEAK", "(planted signal recovery)")


if __name__ == "__main__":
    main()
