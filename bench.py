"""Benchmark: flagship UniVTG training-step + inference throughput.

Measures, in this order:

  1. the full jitted TRAINING step (forward + losses + backward + AdamW)
     at the reference's released architecture (hidden 1024, slowfast+clip
     features, 75-clip QVHighlights videos; scripts/qvhl_pretrain.sh) —
     reported as train_clips_per_sec / train_ms_per_step;
  2. the full jitted inference path (input projections -> 4-layer encoder
     -> three heads -> dense decode) at the same shape — the headline
     "grounding_throughput" clips/sec/chip.

The TRAIN phase runs FIRST and is never skipped: it is the number that
silently regressed to "skipped" in round 4 when the budget guard spent the
whole compile budget on inference. If the remote-compile service is
degraded and the train phase eats most of the budget, the INFERENCE phase
is skipped instead and the headline metric falls back to the training
throughput (the line says so explicitly).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline",
"train_clips_per_sec", "train_ms_per_step", ...}.
vs_baseline is measured against the BASELINE.json north-star target of
10_000 clips/sec/chip.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.train.steps import make_eval_step, make_optimizer

BASELINE_CLIPS_PER_SEC = 10_000.0


def bench_train_step(model, cfg, B, Lv, Lt, n_iters):
    """clips/sec through the full training step. Shared harness:
    univtg_tpu/utils/benchkit.py (chained anti-memoization methodology,
    arguments-not-closures discipline)."""
    from univtg_tpu.utils.benchkit import time_chained_train

    optimizer = make_optimizer(lambda s: 1e-4)
    return time_chained_train(model, cfg, optimizer, B, n_iters, Lv=Lv, Lt=Lt)


def bench_inference(model, cfg, params, B, Lv, Lt, n_iters):
    """clips/sec through the jitted eval step (dense decode included)."""
    rng = jax.random.PRNGKey(0)
    txt = jax.random.normal(rng, (B, Lt, cfg.txt_dim), jnp.float32)
    vid = jax.random.normal(rng, (B, Lv, cfg.vid_dim), jnp.float32)
    model_inputs = {
        "src_txt": txt,
        "src_txt_mask": jnp.ones((B, Lt), jnp.float32),
        "src_vid": vid,
        "src_vid_mask": jnp.ones((B, Lv), jnp.float32),
    }
    ts = jnp.tile(((jnp.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2))
    targets = {"timestamp": ts}
    eval_step = make_eval_step(model, eval_mode="add")

    # Chained iterations inside one XLA program: each step consumes a value
    # derived from the previous step's output, so the device cannot dedupe
    # or overlap iterations (the tunnel runtime caches identical dispatches,
    # making naive per-call timing meaningless).
    def chained(params, model_inputs, targets, seed, n):
        def body(i, carry):
            mi = dict(model_inputs)
            mi["src_vid"] = model_inputs["src_vid"] + carry * 1e-6
            out = eval_step(params, mi, targets)
            # consume EVERY decoded tensor: reducing only `scores` lets XLA
            # dead-code-eliminate the span head and the saliency path (the
            # saliency head alone would even drop the whole encoder), which
            # silently inflates the measured throughput
            return (
                out["scores"].mean()
                + out["spans"].mean() * 1e-3
                + out["saliency"].mean() * 1e-3
            )

        return jax.lax.fori_loop(0, n, body, seed)

    run = jax.jit(chained, static_argnums=4)
    # compile + warm; each timed call gets a distinct seed value so a
    # memoizing runtime cannot replay a cached execution, and the scalar
    # result is fetched to host -- block_until_ready alone does not
    # actually wait for completion under tunneled runtimes. Best of 3
    # windows: a transient tunnel stall in a single ~1 s window
    # under-reports by 20%+ (same rationale as benchkit.time_chained_train).
    float(np.asarray(run(params, model_inputs, targets, jnp.float32(-1.0), n_iters)))
    best_dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        out = run(params, model_inputs, targets, jnp.float32(trial), n_iters)
        result = float(np.asarray(out))
        best_dt = min(best_dt, time.perf_counter() - t0)
        assert np.isfinite(result)
    return B * Lv * n_iters / best_dt


def main():
    from univtg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    t_start = time.perf_counter()
    platform = jax.devices()[0].platform
    compute_dtype = "bfloat16" if platform != "cpu" else "float32"
    cfg = ModelConfig(
        vid_dim=2818,  # slowfast 2304 + clip 512 + tef 2
        txt_dim=512,
        hidden_dim=1024,
        num_layers=4,
        num_heads=8,
        ffn_dim=1024,
        max_v_l=75,
        max_q_l=32,
        compute_dtype=compute_dtype,
    )
    B, Lv, Lt = (256 if platform != "cpu" else 8), 75, 32
    model = UniVTG(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        jax.random.normal(rng, (B, Lt, cfg.txt_dim), jnp.float32),
        jnp.ones((B, Lt), jnp.float32),
        jax.random.normal(rng, (B, Lv, cfg.vid_dim), jnp.float32),
        jnp.ones((B, Lv), jnp.float32),
        train=False,
    )["params"]

    # ---- Phase 1: TRAINING throughput (first; never skipped) ----
    train_clips, train_ms = bench_train_step(
        model, cfg, B, Lv, Lt, 20 if platform != "cpu" else 2
    )
    line = {
        "train_clips_per_sec": round(train_clips, 1),
        "train_ms_per_step": round(train_ms, 3),
        "train_batch": B,
    }

    # ---- Phase 2: inference throughput (skipped only if the compile
    # service already ate the budget on phase 1) ----
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    if time.perf_counter() - t_start < budget * 0.60:
        clips_per_sec = bench_inference(
            model, cfg, params, B, Lv, Lt, 50 if platform != "cpu" else 2
        )
        line.update(
            metric="grounding_throughput",
            value=round(clips_per_sec, 1),
            unit="clips/sec/chip",
            vs_baseline=round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        )
    else:
        line.update(
            metric="train_throughput",
            value=round(train_clips, 1),
            unit="clips/sec/chip",
            vs_baseline=round(train_clips / BASELINE_CLIPS_PER_SEC, 3),
            inference_skipped="compile service too slow this run",
        )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
