"""Long-video TRAINING throughput: pallas flash attention vs XLA attention.

Measures the full jitted training step (forward + losses + backward + AdamW)
on the flagship architecture (hidden 1024, 4 layers, 2818-d features, bf16
compute) at long-video shape (default B=8 x 2048 clips) with
attention_impl='pallas' (custom-vjp flash kernels, O(L) residual memory)
against attention_impl='xla' (O(L^2) score materialization). Uses the
chained anti-memoization harness (univtg_tpu/utils/benchkit.py) -- see
docs/PERF.md "Measurement pitfall" for why naive timing lies on tunneled
runtimes.

Run on a real TPU:  timeout 1750 python scripts/bench_long_context.py
Prints one JSON line per impl + a final summary line.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from univtg_tpu.models import ModelConfig, UniVTG  # noqa: E402
from univtg_tpu.train.steps import make_optimizer  # noqa: E402
from univtg_tpu.utils.benchkit import time_chained_train  # noqa: E402


def main(B=8, Lv=2048, Lt=32, n_iters=20, only=None):
    platform = jax.devices()[0].platform
    compute_dtype = "bfloat16" if platform != "cpu" else "float32"
    if platform == "cpu":
        B, Lv, n_iters = 2, 256, 2
    results = {}
    impls = (only,) if only else ("pallas", "xla")
    for impl in impls:
        cfg = ModelConfig(
            vid_dim=2818, txt_dim=512, hidden_dim=1024, num_layers=4,
            num_heads=8, ffn_dim=1024, max_v_l=Lv, max_q_l=Lt,
            compute_dtype=compute_dtype, attention_impl=impl,
        )
        model = UniVTG(cfg)
        optimizer = make_optimizer(lambda s: 1e-4)
        t0 = time.perf_counter()
        clips, ms = time_chained_train(model, cfg, optimizer, B, n_iters, Lv=Lv, Lt=Lt)
        results[impl] = (clips, ms)
        print(json.dumps({
            "metric": "long_context_train_throughput",
            "impl": impl, "B": B, "Lv": Lv,
            "clips_per_sec": round(clips, 1),
            "ms_per_step": round(ms, 3),
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
    if "pallas" in results and "xla" in results:
        speedup = results["pallas"][0] / results["xla"][0]
        print(json.dumps({
            "metric": "pallas_vs_xla_train_speedup", "B": B, "Lv": Lv,
            "value": round(speedup, 3),
        }), flush=True)


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kw[k] = v if k == "only" else int(v)
    main(**kw)
