"""Reproduce the reference model zoo's QVHighlights numbers from a released
PyTorch checkpoint (model.md:19-20) with this framework's evaluator.

Ready to run once released weights + extracted features are on disk:

  python scripts/reproduce_model_md.py \
      --resume  /path/to/model_best.ckpt            # torch.save container \
      --eval-path /path/to/highlight_val_release.jsonl \
      --v-feat-dirs /feats/slowfast /feats/clip      # concat on feat dim \
      --q-feat-dir  /feats/clip_text \
      [--opt-json /path/to/opt.json]                 # else ckpt dir / in-ckpt

Expected (model.md:20, w/ PT, val): MR-full-mAP 45.44, HL HIT@1 68.77.
The architecture is reconstructed from the run's saved opt.json (the
reference's TestOptions flow, main/config.py:233-247), weights are mapped
through interop.load_reference_run (DDP 'module.' prefixes stripped), and
inference mirrors main/inference_mr.py:87-193 (eval_mode=add, round_multiple).
"""
import argparse
import json
import os
import sys

# importable from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from univtg_tpu.utils.compile_cache import pin_platform_from_env

    pin_platform_from_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True, help="released .ckpt (torch.save)")
    ap.add_argument("--opt-json", default=None, help="saved opt.json (default: next to ckpt)")
    ap.add_argument("--eval-path", required=True, help="QVHL val jsonl with GT")
    ap.add_argument("--v-feat-dirs", nargs="+", required=True)
    ap.add_argument("--q-feat-dir", required=True)
    ap.add_argument("--clip-len", type=float, default=2.0)
    ap.add_argument("--eval-bsz", type=int, default=32)
    ap.add_argument("--eval-mode", default="add")
    # reference inference defaults (scripts/qvhl_inference.sh:41,52):
    # no clip-multiple rounding; NMS at 0.7 reported as SECONDARY metrics
    ap.add_argument("--round-multiple", type=int, default=-1)
    ap.add_argument("--nms-thd", type=float, default=0.7)
    ap.add_argument("--out", default="reproduce_metrics.json")
    args = ap.parse_args()

    from univtg_tpu.data.collate import collate_mr
    from univtg_tpu.data.loader import Loader
    from univtg_tpu.data.mr import MRDataConfig, MRDataset
    from univtg_tpu.interop import load_reference_run
    from univtg_tpu.models import UniVTG
    from univtg_tpu.train.infer_mr import (
        apply_nms,
        evaluate_submission,
        run_inference,
    )

    cfg, params = load_reference_run(args.resume, args.opt_json)
    print(f"restored: hidden={cfg.hidden_dim} layers={cfg.num_layers} "
          f"vid_dim={cfg.vid_dim} txt_dim={cfg.txt_dim}")
    model = UniVTG(cfg)

    data_cfg = MRDataConfig(
        dset_name="qvhighlights",
        data_path=args.eval_path,
        v_feat_dirs=tuple(args.v_feat_dirs),
        q_feat_dir=args.q_feat_dir,
        v_feat_dim=cfg.vid_dim - 2,  # pre-TEF
        q_feat_dim=cfg.txt_dim,
        clip_len=args.clip_len,
        max_q_l=cfg.max_q_l,
        max_v_l=cfg.max_v_l,
    )
    ds = MRDataset(data_cfg)
    loader = Loader(
        ds,
        args.eval_bsz,
        lambda items, pad_batch_to: collate_mr(
            items, data_cfg.max_q_l, data_cfg.max_v_l, pad_batch_to
        ),
        shuffle=False,
    )
    submission = run_inference(
        model,
        params["params"],
        loader,
        eval_mode=args.eval_mode,
        clip_length=args.clip_len,
        round_multiple=args.round_multiple,
    )
    # Headline model.md metrics are computed on the PRE-NMS submission (the
    # reference evaluates `submission` at main/inference_mr.py:50 and the
    # NMS'd copy separately at :72); mirroring that exactly here.
    metrics = evaluate_submission(submission, ds.data)
    if args.nms_thd > 0:
        nms_submission = apply_nms(submission, args.nms_thd, 10, 10)
        metrics["metrics_nms"] = evaluate_submission(nms_submission, ds.data)["brief"]
    brief = metrics["brief"]
    print(json.dumps(brief, indent=1))
    with open(args.out, "w") as f:
        json.dump(metrics, f, indent=1)

    expect = {"MR-full-mAP-key": 45.44, "HL-min-VeryGood-Hit1-key": 68.77}
    for k, want in expect.items():
        got = brief.get(k)
        if got is not None:
            print(f"{k}: got {got:.2f}  (model.md expects {want:.2f}, "
                  f"delta {got - want:+.2f})")


if __name__ == "__main__":
    main()
