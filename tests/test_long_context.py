"""Long-video configs: pallas attention falls back to XLA off-TPU and the
model scales past max_v_l=75 with bucketed lengths."""
import numpy as np
import jax
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.ops.attention import resolve_impl


def test_resolve_impl_cpu_fallback():
    assert resolve_impl("pallas") == "xla"  # tests run on CPU
    assert resolve_impl("xla") == "xla"


def test_long_video_forward():
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, max_v_l=1024, max_q_l=8, attention_impl="pallas",
    )
    model = UniVTG(cfg)
    rng = jax.random.PRNGKey(0)
    B, Lv, Lt = 2, 1024, 8
    txt = np.random.default_rng(0).standard_normal((B, Lt, 16)).astype(np.float32)
    vid = np.random.default_rng(1).standard_normal((B, Lv, 34)).astype(np.float32)
    tm = np.ones((B, Lt), np.float32)
    vm = np.ones((B, Lv), np.float32)
    vm[1, 700:] = 0
    params = model.init(rng, txt, tm, vid, vm, train=False)["params"]
    fwd = jax.jit(
        lambda p, v: model.apply({"params": p}, txt, tm, v, vm, train=False)
    )
    out = fwd(params, vid)
    assert out["pred_logits"].shape == (B, Lv, 1)
    assert np.isfinite(np.asarray(out["pred_spans"])).all()
    # masked positions are excluded from the saliency ranking: the additive
    # log-mask (model/univtg.py:147, layers.mask_log) contributes
    # log(1e-45) ~= -103.28, far below any cosine similarity in [-1, 1]
    assert (np.asarray(out["saliency_scores"])[1, 700:] < -100.0).all()
    # masking invariant: garbage in the padded region must not change ANY
    # output at valid positions (attention bias + per-conv-layer masking)
    vid_garbage = vid.copy()
    vid_garbage[1, 700:] = 1e3
    out2 = fwd(params, vid_garbage)
    for key in ("pred_logits", "pred_spans", "saliency_scores"):
        a = np.asarray(out[key])
        b = np.asarray(out2[key])
        np.testing.assert_allclose(a[1, :700], b[1, :700], atol=1e-5, err_msg=key)
        np.testing.assert_allclose(a[0], b[0], atol=1e-5, err_msg=key)


def test_remat_forward_and_grad_match():
    """jax.checkpoint layers: identical forward and gradients, less live
    memory in the backward pass."""
    import jax.numpy as jnp

    base = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=48, num_layers=2, num_heads=4,
        ffn_dim=64, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6,
    )
    remat_cfg = ModelConfig(**{**base.__dict__, "remat": True})
    rng = np.random.default_rng(0)
    B, Lv, Lt = 2, 16, 6
    txt = rng.standard_normal((B, Lt, 16)).astype(np.float32)
    vid = rng.standard_normal((B, Lv, 34)).astype(np.float32)
    tm, vm = np.ones((B, Lt), np.float32), np.ones((B, Lv), np.float32)

    m0, m1 = UniVTG(base), UniVTG(remat_cfg)
    params = m0.init(jax.random.PRNGKey(0), txt, tm, vid, vm, train=False)["params"]

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, txt, tm, vid, vm, train=True)
            return out["saliency_scores"].sum() + out["pred_spans"].sum()
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(params)
    l1, g1 = jax.value_and_grad(loss(m1))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
