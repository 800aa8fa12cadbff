"""Command-line entry points.

Replaces the reference's per-task main/ scripts + SLURM launchers with one
CLI over typed preset configs:

  python -m univtg_tpu.cli train-mr --preset qvhighlights_mr [key=value ...]
  python -m univtg_tpu.cli train-hl --preset tvsum_hl
  python -m univtg_tpu.cli train-qfvs --preset qfvs
  python -m univtg_tpu.cli infer-mr --preset qvhighlights_mr --resume ckpt
  python -m univtg_tpu.cli eval --submission preds.jsonl --gt gt.jsonl
  python -m univtg_tpu.cli ground --video v.mp4 --query "..." --resume ckpt
  python -m univtg_tpu.cli pack-h5 --metadata m.jsonl --out-dir data/x/h5py ...

Overrides use dotted dataclass paths, e.g. bsz=16 model.hidden_dim=512.
"""
from __future__ import annotations

import argparse
import ast
import json
import sys


def _apply_overrides(cfg, pairs):
    from univtg_tpu.presets import _replace

    for pair in pairs:
        key, _, raw = pair.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        cfg = _replace(cfg, key, value)
    return cfg


def _preset_cfg(args):
    from univtg_tpu.presets import PRESETS

    builder = PRESETS[args.preset]
    cfg = builder()
    return _apply_overrides(cfg, args.overrides)


def cmd_train_mr(args):
    from univtg_tpu.train.driver_mr import train_mr

    metrics, best = train_mr(_preset_cfg(args), resume=args.resume)
    print(json.dumps(metrics.get("brief", {}), indent=1))
    print(f"best checkpoint: {best}")


def cmd_train_hl(args):
    from univtg_tpu.train.driver_hl import train_hl

    print(json.dumps(train_hl(_preset_cfg(args)), indent=1))


def cmd_train_qfvs(args):
    from univtg_tpu.train.driver_qfvs import train_qfvs

    print(json.dumps(train_qfvs(_preset_cfg(args)), indent=1))


def cmd_train_vlp(args):
    from univtg_tpu.train.driver_vlp import train_vlp

    metrics, best = train_vlp(_preset_cfg(args), resume=args.resume)
    print(json.dumps(metrics.get("brief", {}), indent=1))
    print(f"best checkpoint: {best}")


def cmd_infer_mr(args):
    """Eval-only run on the preset's eval split (the reference's
    start_inference, main/inference_mr.py:224-269)."""
    import jax

    from univtg_tpu.data.collate import collate_mr
    from univtg_tpu.data.loader import Loader
    from univtg_tpu.data.mr import MRDataset
    from univtg_tpu.data.features import save_jsonl
    from univtg_tpu.models import UniVTG
    from univtg_tpu.train import checkpoint as ckpt
    from univtg_tpu.train.infer_mr import evaluate_submission, run_inference
    from univtg_tpu.train.steps import init_state, make_optimizer

    cfg = _preset_cfg(args)
    model = UniVTG(cfg.model)
    state = init_state(model, cfg.model, make_optimizer(lambda s: 0.0), jax.random.PRNGKey(0))
    params = ckpt.restore_params(args.resume, state.params)
    eval_ds = MRDataset(cfg.eval_data)
    loader = Loader(
        eval_ds,
        cfg.eval_bsz,
        lambda items, pad_batch_to: collate_mr(
            items, cfg.eval_data.max_q_l, cfg.eval_data.max_v_l, pad_batch_to
        ),
    )
    submission = run_inference(
        model,
        params,
        loader,
        eval_mode=cfg.eval_mode,
        clip_length=cfg.eval_data.clip_len,
        round_multiple=cfg.round_multiple,
        # evaluation uses the eval-side transfer precision (default f32),
        # not the training-throughput compression, matching in-training eval
        transfer_dtype=cfg.transfer_dtype_eval,
    )
    out = args.out or "inference_preds.jsonl"
    save_jsonl(submission, out)
    metrics = evaluate_submission(submission, eval_ds.data)
    print(json.dumps(metrics["brief"], indent=1))


def cmd_eval(args):
    """Offline submission scorer (eval/eval.py:377-394 eval_main)."""
    from univtg_tpu.data.features import load_jsonl
    from univtg_tpu.evals import eval_submission

    metrics = eval_submission(load_jsonl(args.submission), load_jsonl(args.gt))
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


def cmd_ground(args):
    """Single video+query grounding (the reference's gradio demo path)."""
    import jax

    from univtg_tpu.extract.pipeline import ClipEncoder
    from univtg_tpu.interop.clip_ckpt import load_clip_checkpoint
    from univtg_tpu.models import UniVTG
    from univtg_tpu.serve import GroundingPipeline
    from univtg_tpu.train import checkpoint as ckpt
    from univtg_tpu.train.steps import init_state, make_optimizer

    cfg = _preset_cfg(args)
    model = UniVTG(cfg.model)
    state = init_state(model, cfg.model, make_optimizer(lambda s: 0.0), jax.random.PRNGKey(0))
    from univtg_tpu.serve.quantize import restore_serving_params

    params = restore_serving_params(args.resume, state.params)
    clip_params, clip_cfg = load_clip_checkpoint(args.clip_ckpt)
    pipe = GroundingPipeline(
        cfg.model,
        params,
        clip_encoder=ClipEncoder(clip_params, clip_cfg),
    )
    result = pipe.ground_video(args.video, args.query)
    print(pipe.describe(result, args.query))
    print(json.dumps({k: v for k, v in result.items() if k != "saliency"}, indent=1))


def cmd_infer_hl(args):
    from univtg_tpu.train.driver_hl import infer_hl

    print(json.dumps(infer_hl(_preset_cfg(args), args.ckpt_dir), indent=1))


def cmd_infer_qfvs(args):
    from univtg_tpu.train.driver_qfvs import infer_qfvs

    print(json.dumps(infer_qfvs(_preset_cfg(args), args.ckpt_dir), indent=1))


def cmd_plot(args):
    if args.paper:
        if not args.gt:
            raise SystemExit("--paper requires --gt (the comparison needs GT rows)")
        from univtg_tpu.tools.plots import plot_comparison_set

        made = plot_comparison_set(
            args.submission, args.gt, args.out_dir,
            baseline_jsonl=args.baseline, video_dir=args.video_dir,
            max_queries=args.max_queries, template_path=args.template,
        )
        print(f"wrote {len(made)} figure sets to {args.out_dir}")
        return
    from univtg_tpu.tools.plots import plot_submission

    n = plot_submission(
        args.submission, args.gt, args.out_dir, args.max_queries, baseline_jsonl=args.baseline
    )
    print(f"wrote {n} figures to {args.out_dir}")


def cmd_pack_h5(args):
    from univtg_tpu.tools.pack_h5 import pack_dataset

    out = pack_dataset(args.metadata, args.v_feat_dirs, args.q_feat_dir, args.out_dir)
    print(json.dumps(out, indent=1))


def cmd_quantize(args):
    """Convert a trained checkpoint into an int8 serving checkpoint."""
    import jax

    from univtg_tpu.serve.quantize import save_quantized
    from univtg_tpu.train import checkpoint as ckpt
    from univtg_tpu.train.steps import init_state, make_optimizer

    cfg = _preset_cfg(args)
    from univtg_tpu.train.driver_mr import build_model

    model = build_model(cfg)
    state = init_state(model, cfg.model, make_optimizer(lambda s: 0.0), jax.random.PRNGKey(0))
    params = ckpt.restore_params(args.resume, state.params)
    save_quantized(args.out, params)
    import os

    print(f"wrote int8 checkpoint: {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)")


def cmd_serve(args):
    """HTTP grounding service with dynamic micro-batching
    (univtg_tpu.serve.server; the production counterpart of the reference's
    single-user gradio demo, main_gradio.py:187-238)."""
    import jax

    from univtg_tpu.models import UniVTG
    from univtg_tpu.serve import GroundingPipeline, GroundingServer
    from univtg_tpu.train.steps import init_state, make_optimizer

    cfg = _preset_cfg(args)
    if cfg.model_id != "univtg":
        raise SystemExit(
            f"serve supports model_id='univtg' only (the dense-regression "
            f"decode GroundingPipeline implements); got {cfg.model_id!r}"
        )
    model = UniVTG(cfg.model)
    state = init_state(model, cfg.model, make_optimizer(lambda s: 0.0), jax.random.PRNGKey(0))
    from univtg_tpu.serve.quantize import restore_serving_params

    params = restore_serving_params(args.resume, state.params)
    clip_encoder = None
    if args.clip_ckpt:
        from univtg_tpu.extract.pipeline import ClipEncoder
        from univtg_tpu.interop.clip_ckpt import load_clip_checkpoint

        clip_params, clip_cfg = load_clip_checkpoint(args.clip_ckpt)
        clip_encoder = ClipEncoder(clip_params, clip_cfg)
    pipe = GroundingPipeline(
        cfg.model, params, clip_encoder=clip_encoder, eval_mode=cfg.eval_mode,
        param_dtype=args.param_dtype,
    )
    # POST /reload re-restores (default: the --resume path, which a trainer
    # keeps atomically rewriting) and hot-swaps the weights. It takes a
    # client-chosen filesystem path, so on a NON-local bind it stays
    # disabled unless --reload-token gates it -- relying on operators
    # reading help text is not a security posture.
    local_hosts = ("127.0.0.1", "localhost", "::1")
    reload_ok = args.host in local_hosts or args.reload_token is not None
    if not reload_ok:
        print(
            f"note: /reload disabled (host {args.host} is non-local and no "
            f"--reload-token was given)"
        )
    server = GroundingServer(
        pipe, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        request_timeout_s=args.request_timeout_s,
        param_loader=(
            (lambda p: restore_serving_params(p, state.params))
            if reload_ok else None
        ),
        checkpoint_path=args.resume,
        reload_token=args.reload_token,
    )
    if args.warmup is not None:
        if args.warmup == "default":
            lengths = None
        else:
            try:
                lengths = [int(x) for x in args.warmup.split(",")]
            except ValueError:
                raise SystemExit(
                    f"--warmup takes a comma-separated list of video "
                    f"lengths (e.g. --warmup=128,512), got {args.warmup!r}. "
                    f"Bare --warmup must come after the positional "
                    f"overrides or use the --warmup=... form."
                )
        print("warming batch programs (compile happens now, not on the "
              "first client)...")
        server.warmup(lengths)

    import signal

    def _sigterm(*_):
        # SIGTERM (systemd/k8s stop) drains like ctrl-c instead of killing
        # mid-batch; raising lets serve_forever unwind — calling
        # server.close() here would deadlock (shutdown() waits on the very
        # loop this handler interrupts)
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    print(f"serving on http://{args.host}:{server.port}  (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        # drain: in-flight requests get answers, bounded by the same cap a
        # live request has (keep it under the k8s termination grace period)
        print("draining in-flight requests...")
        server.close(drain_s=args.request_timeout_s)


def cmd_extract_text(args):
    """Offline query-feature dump (run_on_video/text_extractor.py)."""
    from univtg_tpu.data.features import load_jsonl
    from univtg_tpu.extract.pipeline import ClipEncoder, extract_query_features
    from univtg_tpu.interop.clip_ckpt import load_clip_checkpoint

    clip_params, clip_cfg = load_clip_checkpoint(args.clip_ckpt)
    enc = ClipEncoder(clip_params, clip_cfg)
    rows = load_jsonl(args.metadata)
    extract_query_features(enc, rows, args.out_dir)
    print(f"wrote {len(rows)} query features to {args.out_dir}")


def build_parser():
    p = argparse.ArgumentParser(prog="univtg_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **extra):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        return sp

    for name, fn in (
        ("train-mr", cmd_train_mr),
        ("train-hl", cmd_train_hl),
        ("train-qfvs", cmd_train_qfvs),
        ("train-vlp", cmd_train_vlp),
    ):
        sp = add(name, fn)
        sp.add_argument("--preset", required=True)
        sp.add_argument("--resume", default=None)
        sp.add_argument("overrides", nargs="*")

    sp = add("infer-mr", cmd_infer_mr)
    sp.add_argument("--preset", required=True)
    sp.add_argument("--resume", required=True)
    sp.add_argument("--out", default=None)
    sp.add_argument("overrides", nargs="*")

    for name, fn in (("infer-hl", cmd_infer_hl), ("infer-qfvs", cmd_infer_qfvs)):
        sp = add(name, fn)
        sp.add_argument("--preset", required=True)
        sp.add_argument("--ckpt-dir", required=True)
        sp.add_argument("overrides", nargs="*")

    sp = add("plot", cmd_plot)
    sp.add_argument("--submission", required=True)
    sp.add_argument("--gt", default=None)
    sp.add_argument("--baseline", default=None)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--max-queries", type=int, default=20)
    sp.add_argument("--paper", action="store_true",
                    help="paper-style per-query comparison figure sets")
    sp.add_argument("--video-dir", default=None,
                    help="dir of {vid}.mp4 files for the frame strips")
    sp.add_argument("--template", default=None,
                    help="RGBA template PNG composited over each frame "
                         "(the reference's film-strip border)")

    sp = add("eval", cmd_eval)
    sp.add_argument("--submission", required=True)
    sp.add_argument("--gt", required=True)
    sp.add_argument("--out", default=None)

    sp = add("ground", cmd_ground)
    sp.add_argument("--preset", required=True)
    sp.add_argument("--resume", required=True)
    sp.add_argument("--clip-ckpt", required=True)
    sp.add_argument("--video", required=True)
    sp.add_argument("--query", required=True)
    sp.add_argument("overrides", nargs="*")

    sp = add("pack-h5", cmd_pack_h5)
    sp.add_argument("--metadata", required=True)
    sp.add_argument("--v-feat-dirs", nargs="+", required=True)
    sp.add_argument("--q-feat-dir", required=True)
    sp.add_argument("--out-dir", required=True)

    sp = add("quantize", cmd_quantize)
    sp.add_argument("--preset", required=True)
    sp.add_argument("--resume", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("overrides", nargs="*")

    sp = add("serve", cmd_serve)
    sp.add_argument("--preset", required=True)
    sp.add_argument("--resume", required=True)
    sp.add_argument("--clip-ckpt", default=None)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8008)
    sp.add_argument("--max-batch", type=int, default=32)
    sp.add_argument("--max-wait-ms", type=float, default=4.0)
    sp.add_argument("--request-timeout-s", type=float, default=600.0,
                    help="per-request wait cap; must cover a first-touch "
                         "jit compile of a new batch shape")
    sp.add_argument("--reload-token", default=None,
                    help="require this X-Reload-Token header on POST "
                         "/reload (set it whenever --host is not local)")
    sp.add_argument("--param-dtype", default=None,
                    choices=[None, "bfloat16", "float32"],
                    help="cast weights at load; bfloat16 halves weight HBM "
                         "at rest (latency unchanged at serving shapes)")
    sp.add_argument("--warmup", nargs="?", const="default", default=None,
                    help="pre-compile the batch-program ladder before "
                         "accepting traffic; optionally a comma-separated "
                         "list of video lengths (e.g. 128,512)")
    sp.add_argument("overrides", nargs="*")

    sp = add("extract-text", cmd_extract_text)
    sp.add_argument("--metadata", required=True)
    sp.add_argument("--clip-ckpt", required=True)
    sp.add_argument("--out-dir", required=True)
    return p


def main(argv=None):
    from univtg_tpu.utils.compile_cache import (
        enable_compilation_cache,
        pin_platform_from_env,
    )

    pin_platform_from_env()
    enable_compilation_cache()  # reuse compiled XLA programs across runs
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
