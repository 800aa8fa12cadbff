"""Roofline measurement for the flagship grounding model on the local chip.

Measures, with the repo's standard anti-memoization methodology (iterations
chained through a data-dependent carry inside ONE fori_loop program, scalar
fetched to host at the end):

  * calib  -- pure bf16 4096^3 matmul: the achievable matmul ceiling on this
              host/chip (the tunneled v5e is virtualized; expect run-to-run
              variance -- record the ceiling from the SAME session you
              measure the model in).
  * conv   -- the k=3 Conv1d head stack vs an equivalent formulation as 3
              shifted matmuls (checks whether XLA's conv lowering leaves
              MXU throughput on the table -- measured: it does not).
  * fwd    -- flagship inference forward at B=256.
  * train  -- full training step (fwd + losses + bwd + AdamW + clip) at
              B=32 and B=256.

Model FLOPs are counted analytically (matmul/conv MACs x2; attention scores
included; elementwise ignored) so the printed TFLOP/s are comparable across
runs. Usage:

    python scripts/roofline.py [--only calib,conv,fwd,train]

Findings feed docs/PERF.md ("Roofline" section).
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root

from univtg_tpu.models import ModelConfig, UniVTG  # noqa: E402

from univtg_tpu.train.steps import make_optimizer  # noqa: E402

V5E_BF16_PEAK = 197e12  # marketing peak, one v5e chip


def flagship_flops_fwd(B, Lv=75, Lt=32, D=1024, Dv=2818, Dt=512, ffn=1024, layers=4):
    """Analytic forward FLOPs (matmul MACs x2) for the flagship UniVTG."""
    Ltot = Lv + Lt
    proj = Lv * (Dv * D + D * D) + Lt * (Dt * D + D * D)  # 2-layer input projs
    enc = layers * (Ltot * (4 * D * D + 2 * D * ffn) + 2 * Ltot * Ltot * D)
    heads = 2 * Lv * 6 * D * D  # class+span ConvHeads: k=3 convs D->D->out
    return 2 * B * (proj + enc + heads)


def time_chained(name, body, init, n, flops_per_iter=None, consts=()):
    """body(consts, i, carry) -> carry; carry is (pytree, scalar) or scalar.

    `consts` (params, inputs, ...) MUST hold every large array the body
    reads: they pass through jit as ARGUMENTS. Closing over them instead
    embeds them as captured constants in the serialized compile request,
    which remote-compile tunnels reject past ~256 MB (HTTP 413).
    """

    def chained(consts, init, seed, n):
        start = (init[0], init[1] + seed) if isinstance(init, tuple) else init + seed
        return jax.lax.fori_loop(0, n, lambda i, c: body(consts, i, c), start)

    run = jax.jit(chained, static_argnums=3)

    def fetch(out):
        leaf = out[1] if isinstance(out, tuple) else out
        return float(np.asarray(leaf))

    fetch(run(consts, init, jnp.float32(-1.0), n))  # compile + warm
    t0 = time.perf_counter()
    r = fetch(run(consts, init, jnp.float32(0.0), n))
    dt = time.perf_counter() - t0
    assert np.isfinite(r)
    extra = ""
    if flops_per_iter:
        tf = flops_per_iter * n / dt / 1e12
        extra = f"  {tf:7.2f} TFLOP/s ({tf * 1e12 / V5E_BF16_PEAK * 100:5.1f}% of v5e peak)"
    print(f"{name:42s} {dt / n * 1e3:9.3f} ms/iter{extra}", flush=True)
    return dt / n


def run_calib():
    M = 4096
    A = jnp.ones((M, M), jnp.bfloat16)
    B_ = jnp.ones((M, M), jnp.bfloat16) * 0.001

    def body(consts, i, carry):
        A, B_ = consts
        A2 = A + carry.astype(jnp.bfloat16) * 1e-6
        # consume the WHOLE product: reading one element lets XLA DCE the
        # matmul down to a single dot product (measured 500+ "TFLOP/s")
        return (A2 @ B_).mean().astype(jnp.float32)

    time_chained(
        "calib bf16 4096^3 matmul", body, jnp.float32(0.0), 100, 2 * M**3,
        consts=(A, B_),
    )


def run_conv():
    from univtg_tpu.models.layers import ConvHead

    Bc, L, D = 256, 75, 1024
    x = jnp.ones((Bc, L, D), jnp.bfloat16)
    mask = jnp.ones((Bc, L), jnp.float32)
    head = ConvHead(D, 2, 3, dtype=jnp.bfloat16)
    hp = head.init(jax.random.PRNGKey(0), x, mask)["params"]
    flops = Bc * L * 6 * D * D * 2

    def body(consts, i, carry):
        hp, x, mask = consts
        out = head.apply({"params": hp}, x + carry.astype(jnp.bfloat16) * 1e-6, mask)
        return out.mean().astype(jnp.float32)

    time_chained(
        "ConvHead nn.Conv k=3 (B=256,L=75,D=1024)", body, jnp.float32(0.0), 50,
        flops, consts=(hp, x, mask),
    )

    def conv_as_matmul(params, x, mask):
        m = mask[..., None].astype(x.dtype)
        x = x * m
        for i, pname in enumerate(["conv_0", "conv_1", "conv_2"]):
            k = params[pname]["kernel"].astype(x.dtype)  # (3, in, out)
            b = params[pname]["bias"].astype(x.dtype)
            left = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
            right = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
            x = left @ k[0] + x @ k[1] + right @ k[2] + b
            if i != 2:
                x = jax.nn.relu(x)
            x = x * m
        return x

    def body2(consts, i, carry):
        hp, x, mask = consts
        out = conv_as_matmul(hp, x + carry.astype(jnp.bfloat16) * 1e-6, mask)
        return out.mean().astype(jnp.float32)

    time_chained(
        "ConvHead as 3 shifted matmuls", body2, jnp.float32(0.0), 50, flops,
        consts=(hp, x, mask),
    )


def _flagship():
    return ModelConfig(
        vid_dim=2818, txt_dim=512, hidden_dim=1024, num_layers=4, num_heads=8,
        ffn_dim=1024, max_v_l=75, max_q_l=32, compute_dtype="bfloat16",
    )


def _batch(B, cfg, Lv=75, Lt=32):
    rng = np.random.default_rng(0)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2))
    window = np.zeros((B, Lv), np.float32)
    window[:, 10:30] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = 10 / Lv, 30 / Lv
    mi = {
        "src_txt": jnp.asarray(rng.standard_normal((B, Lt, cfg.txt_dim)), jnp.float32),
        "src_txt_mask": jnp.ones((B, Lt), jnp.float32),
        "src_vid": jnp.asarray(rng.standard_normal((B, Lv, cfg.vid_dim)), jnp.float32),
        "src_vid_mask": jnp.ones((B, Lv), jnp.float32),
    }
    tg = {
        "timestamp": jnp.asarray(ts, jnp.float32),
        "timestamp_mask": jnp.ones((B, Lv), jnp.float32),
        "timestamp_window": jnp.asarray(window),
        "span_labels_nn": jnp.asarray(nn_sp),
        "saliency_scores": jnp.asarray(rng.uniform(0, 1, (B, Lv)), jnp.float32),
        "saliency_pos_labels": np.full((B, 1), 15, np.int32),
    }
    return mi, tg


def run_fwd():
    cfg = _flagship()
    model = UniVTG(cfg)
    B = 256
    mi, _ = _batch(B, cfg)
    params = model.init(
        jax.random.PRNGKey(0), mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
        mi["src_vid_mask"], train=False,
    )["params"]

    def body(consts, i, carry):
        params, mi = consts
        out = model.apply(
            {"params": params}, mi["src_txt"], mi["src_txt_mask"],
            mi["src_vid"] + carry * 1e-6, mi["src_vid_mask"], train=False,
        )
        # consume every head: saliency alone does not depend on the encoder
        # (it reads the input projections), so reducing only it would let
        # XLA DCE virtually the whole model
        consume = (
            out["pred_logits"].mean()
            + out["pred_spans"].mean()
            + out["saliency_scores"].mean()
        )
        return consume.astype(jnp.float32) * 1e-9 + carry

    time_chained(
        f"fwd B={B}", body, jnp.float32(0.0), 40, flagship_flops_fwd(B),
        consts=(params, mi),
    )


def run_train():
    from univtg_tpu.utils.benchkit import time_chained_train

    cfg = _flagship()
    model = UniVTG(cfg)
    optimizer = make_optimizer(lambda s: 1e-4)

    for B, n in ((32, 30), (256, 20)):
        clips, ms = time_chained_train(model, cfg, optimizer, B, n)
        tf = 3 * flagship_flops_fwd(B) / (ms / 1e3) / 1e12
        print(
            f"{f'train step B={B}':42s} {ms:9.3f} ms/iter  {tf:7.2f} TFLOP/s "
            f"({tf * 1e12 / V5E_BF16_PEAK * 100:5.1f}% of v5e peak)",
            flush=True,
        )
        print(f"    -> {clips:12.0f} training clips/sec/chip", flush=True)


def run_long():
    """Long-video inference shape (B=8, 2048 clips) with full-output
    consumption; re-measures the round-1 PERF.md long-video row honestly."""
    cfg = ModelConfig(
        vid_dim=2818, txt_dim=512, hidden_dim=1024, num_layers=4, num_heads=8,
        ffn_dim=1024, max_v_l=2048, max_q_l=32, compute_dtype="bfloat16",
        attention_impl="pallas" if jax.devices()[0].platform == "tpu" else "xla",
    )
    model = UniVTG(cfg)
    B, Lv, Lt = 8, 2048, 32
    mi, _ = _batch(B, cfg, Lv=Lv, Lt=Lt)
    params = model.init(
        jax.random.PRNGKey(0), mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
        mi["src_vid_mask"], train=False,
    )["params"]

    def body(consts, i, carry):
        params, mi = consts
        out = model.apply(
            {"params": params}, mi["src_txt"], mi["src_txt_mask"],
            mi["src_vid"] + carry * 1e-6, mi["src_vid_mask"], train=False,
        )
        consume = (
            out["pred_logits"].mean()
            + out["pred_spans"].mean()
            + out["saliency_scores"].mean()
        )
        return consume.astype(jnp.float32) * 1e-9 + carry

    dt = time_chained(
        f"fwd long-video B={B} Lv={Lv} ({cfg.attention_impl})", body,
        jnp.float32(0.0), 30, flagship_flops_fwd(B, Lv=Lv, Lt=Lt),
        consts=(params, mi),
    )
    print(f"    -> {B * Lv / dt:12.0f} inference clips/sec/chip", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="calib,conv,fwd,train")
    args = ap.parse_args()
    from univtg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    parts = args.only.split(",")
    if "calib" in parts:
        run_calib()
    if "conv" in parts:
        run_conv()
    if "fwd" in parts:
        run_fwd()
    if "train" in parts:
        run_train()
    if "long" in parts:
        run_long()
