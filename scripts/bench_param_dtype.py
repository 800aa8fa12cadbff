"""Measure serving-forward latency vs weight dtype on the real chip.

Result (v5e, 2026-08-17): NO latency difference at B in {1,4,8}, Lv=128
(0.43/0.74/1.1 ms per forward, f32 and bf16 params within noise). Two
reasons: (1) from B=4 up the forward is FLOP-bound (~128 GFLOP at B=8
against a ~137 TFLOP/s bf16 ceiling), and (2) inside the chained timing
loop the f32->bf16 weight cast is loop-invariant, so XLA hoists it — both
variants read bf16 weights per iteration, which also approximates a warm
serving steady state. bf16 params therefore buy HBM *capacity* (173->87 MB
at rest), not measured latency; docs/PERF.md records this as a checked
negative.

Methodology follows utils/benchkit.py: iterations chain through a
data-dependent carry inside one fori_loop program, every output folds into
the fetched scalar (no DCE), params/inputs pass as jit arguments (tunnel
413 guard). Run: python scripts/bench_param_dtype.py
"""
import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.models import UniVTG
from univtg_tpu.presets import PRESETS
from univtg_tpu.train.steps import decode_dense_outputs


def run_shape(B, Lv, Lt=32):
    cfg = dataclasses.replace(
        PRESETS["qvhighlights_mr"]().model, compute_dtype="bfloat16",
        max_v_l=Lv,
    )
    model = UniVTG(cfg)
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.standard_normal((B, Lt, cfg.txt_dim)), jnp.float32)
    tm = jnp.ones((B, Lt), jnp.float32)
    vid = jnp.asarray(rng.standard_normal((B, Lv, cfg.vid_dim)), jnp.float32)
    vm = jnp.ones((B, Lv), jnp.float32)
    ts = jnp.asarray(
        np.tile(((np.arange(Lv) + 0.5) / Lv)[None, :, None], (B, 1, 2)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), txt, tm, vid, vm, train=False)[
        "params"
    ]
    n_bytes = sum(
        np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(params)
    )
    print(f"B={B} Lv={Lv}: params {n_bytes/1e6:.1f} MB f32")

    def fwd(p, vid_i):
        out = model.apply({"params": p}, txt, tm, vid_i, vm, train=False)
        d = decode_dense_outputs(out, vm, ts, "add")
        return sum(jnp.sum(v.astype(jnp.float32)) for v in d.values())

    @partial(jax.jit, static_argnums=(2,))
    def chained(p, vid0, n):
        def body(i, c):
            s = fwd(p, vid0 + c * 1e-6)
            return s * 1e-9 + 1.0

        return jax.lax.fori_loop(0, n, body, 0.0)

    N = 100
    for name, cast in (("f32", None), ("bf16", jnp.bfloat16)):
        p = params
        if cast is not None:
            p = jax.tree_util.tree_map(
                lambda l: l.astype(cast)
                if jnp.issubdtype(l.dtype, jnp.floating) else l,
                params,
            )
        p = jax.device_put(p)
        # warm with the SAME static n as the timed calls — n is a static
        # arg, so a different n compiles a different program
        chained(p, vid, N).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chained(p, vid, N).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"  {name} params: {best*1e3:.3f} ms/forward")


def main():
    for B in (1, 4, 8):
        run_shape(B, 128)


if __name__ == "__main__":
    main()
