"""Int8 weight-only quantization: roundtrip fidelity, checkpoint format,
metric preservation on a trained model, and the Pallas dequant-matmul."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.serve.quantize import (
    dequantize_params,
    load_quantized,
    quantize_params,
    save_quantized,
)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, max_v_l=16, max_q_l=6,
    )
    model = UniVTG(cfg)
    rng = np.random.default_rng(0)
    txt = rng.standard_normal((2, 6, 16)).astype(np.float32)
    vid = rng.standard_normal((2, 16, 34)).astype(np.float32)
    tm, vm = np.ones((2, 6), np.float32), np.ones((2, 16), np.float32)
    params = model.init(jax.random.PRNGKey(0), txt, tm, vid, vm, train=False)["params"]
    return cfg, model, params, (txt, tm, vid, vm)


def test_quantize_roundtrip(model_and_params):
    _, _, params, _ = model_and_params
    q, scales = quantize_params(params)
    deq = dequantize_params(q, scales)
    # norms/biases untouched; kernels within per-channel quantization error
    leaves_q = jax.tree_util.tree_leaves_with_path(q)
    n_int8 = sum(1 for _, l in leaves_q if np.asarray(l).dtype == np.int8)
    assert n_int8 > 5
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(deq),
    ):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-6)
        assert np.max(np.abs(a - b)) / denom < 1 / 120, path


def test_quantized_outputs_close(model_and_params):
    cfg, model, params, (txt, tm, vid, vm) = model_and_params
    want = model.apply({"params": params}, txt, tm, vid, vm, train=False)
    q, scales = quantize_params(params)
    deq = dequantize_params(q, scales)
    got = model.apply({"params": deq}, txt, tm, vid, vm, train=False)
    # sigmoid probabilities shift by < 2% under int8 weights
    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), np.asarray(want["pred_logits"]), atol=0.02
    )


def test_quantized_checkpoint_file(model_and_params, tmp_path):
    _, model, params, (txt, tm, vid, vm) = model_and_params
    import os

    from flax import serialization

    f32_size = len(serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, params)
    ))
    path = str(tmp_path / "model_int8.ckpt")
    save_quantized(path, params)
    int8_size = os.path.getsize(path)
    assert int8_size < f32_size * 0.45  # ~4x on kernels, small f32 remainder
    restored = load_quantized(path)
    out = model.apply({"params": restored}, txt, tm, vid, vm, train=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_pallas_int8_matmul_interpret():
    from jax.experimental import pallas as pl

    import univtg_tpu.ops.pallas_int8 as pi

    rng = np.random.default_rng(0)
    M, K, N = 48, 72, 96
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    amax = np.abs(w).max(0, keepdims=True)
    scale = amax / 127.0
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = pi.int8_matmul.__wrapped__(
            x, jnp.asarray(w_q), jnp.asarray(scale), block_m=16, block_n=32
        )
    finally:
        pl.pallas_call = orig
    want = x @ (w_q * scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)


def test_restore_serving_params_detects_format(model_and_params, tmp_path):
    """restore_serving_params auto-detects int8 serving checkpoints vs float
    training checkpoints so the serve/ground CLI needs no format flag."""
    from flax import serialization

    from univtg_tpu.serve.quantize import restore_serving_params

    _, model, params, (txt, tm, vid, vm) = model_and_params
    host = jax.tree_util.tree_map(np.asarray, params)

    int8_path = str(tmp_path / "model_int8.ckpt")
    save_quantized(int8_path, params)
    got_q = restore_serving_params(int8_path, params)
    assert jax.tree_util.tree_structure(got_q) == jax.tree_util.tree_structure(params)
    out = model.apply({"params": got_q}, txt, tm, vid, vm, train=False)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]),
        np.asarray(model.apply({"params": params}, txt, tm, vid, vm, train=False)["pred_logits"]),
        atol=0.02,
    )

    # float training blob ({params: ...}) routes to checkpoint.restore_params
    float_path = str(tmp_path / "model_f32.ckpt")
    with open(float_path, "wb") as f:
        f.write(serialization.msgpack_serialize({"params": host, "epoch": 3}))
    got_f = restore_serving_params(float_path, params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(got_f),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_quantized_params_in_grounding_pipeline(model_and_params):
    """int8-dequantized params drive the serving pipeline to near-identical
    grounding outputs."""
    from univtg_tpu.serve import GroundingPipeline

    cfg, model, params, _ = model_and_params
    rng = np.random.default_rng(5)
    vid_feats = rng.standard_normal((12, cfg.vid_dim - 2)).astype(np.float32)
    txt_feats = rng.standard_normal((5, cfg.txt_dim)).astype(np.float32)

    pipe = GroundingPipeline(cfg, params, clip_len=2.0, buckets=[16])
    want = pipe.ground_features(vid_feats, txt_feats)

    q, scales = quantize_params(params)
    deq = dequantize_params(q, scales)
    pipe_q = GroundingPipeline(cfg, deq, clip_len=2.0, buckets=[16])
    got = pipe_q.ground_features(vid_feats, txt_feats)

    # same top-1 highlight and overlapping top-1 window under int8 weights
    assert got["top1_highlight"] == want["top1_highlight"]
    np.testing.assert_allclose(got["top1_window"], want["top1_window"], atol=1.0)
