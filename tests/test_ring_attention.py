"""Ring attention vs single-device SDPA on the virtual mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univtg_tpu.ops.attention import attention_scores_bias, sdpa_xla
from univtg_tpu.ops.ring_attention import ring_attention
from univtg_tpu.parallel import make_mesh


@pytest.mark.parametrize("n_ring", [2, 4, 8])
def test_ring_matches_sdpa(n_ring):
    mesh = make_mesh(dp=1, tp=n_ring)
    rng = np.random.default_rng(0)
    B, L, D, H = 2, 64, 32, 4
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, 40:] = 0
    mask = jnp.asarray(mask)

    want = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
    got = jax.jit(
        lambda q, k, v, m: ring_attention(q, k, v, m, num_heads=H, mesh=mesh, axis="tp")
    )(q, k, v, mask)
    # padded-query rows attend over fully-masked keys in sdpa too; compare
    # valid region
    np.testing.assert_allclose(
        np.asarray(got)[0], np.asarray(want)[0], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got)[1, :40], np.asarray(want)[1, :40], atol=2e-5
    )


def test_ring_no_mask():
    mesh = make_mesh(dp=1, tp=4)
    rng = np.random.default_rng(1)
    B, L, D, H = 1, 32, 16, 2
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    want = sdpa_xla(q, k, v, None, H)
    got = ring_attention(q, k, v, None, num_heads=H, mesh=mesh, axis="tp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_impl_in_encoder():
    """attention_impl='ring' through the full model under jax.set_mesh."""
    from univtg_tpu.models import ModelConfig, UniVTG

    base = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=1, num_heads=4,
        ffn_dim=48, max_v_l=28, max_q_l=4,
    )
    ring_cfg = ModelConfig(**{**base.__dict__, "attention_impl": "ring"})
    rng = np.random.default_rng(2)
    B, Lv, Lt = 2, 28, 4  # Lv+Lt = 32 tiles over tp=4
    txt = rng.standard_normal((B, Lt, 16)).astype(np.float32)
    vid = rng.standard_normal((B, Lv, 34)).astype(np.float32)
    tm, vm = np.ones((B, Lt), np.float32), np.ones((B, Lv), np.float32)

    m0 = UniVTG(base)
    params = m0.init(jax.random.PRNGKey(0), txt, tm, vid, vm, train=False)["params"]
    want = m0.apply({"params": params}, txt, tm, vid, vm, train=False)

    mesh = make_mesh(dp=2, tp=4)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p: UniVTG(ring_cfg).apply({"params": p}, txt, tm, vid, vm, train=False)
        )(params)
    for key in ("pred_logits", "saliency_scores"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), atol=3e-5, err_msg=key
        )


def test_ring_grads_match_sdpa():
    """Ring attention is a TRAINABLE path: dQ/dK/dV through shard_map +
    lax.scan + ppermute match autodiff through single-device SDPA."""
    mesh = make_mesh(dp=1, tp=4)
    rng = np.random.default_rng(3)
    B, L, D, H = 2, 64, 32, 4
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, 48:] = 0
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    # zero the cotangent at padded-query rows: their sdpa rows are uniform
    # over masked keys (degenerate) and not part of the contract
    w = w * mask[..., None]

    def loss_ring(q, k, v):
        out = ring_attention(q, k, v, mask, num_heads=H, mesh=mesh, axis="tp")
        return jnp.sum(out * w)

    def loss_sdpa(q, k, v):
        out = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
        return jnp.sum(out * w)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_sdpa = jax.jit(jax.grad(loss_sdpa, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_ring, g_sdpa):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_ring_train_step_with_seq_shard():
    """One full train step (fwd+losses+bwd+AdamW) with attention_impl='ring'
    + sequence-parallel activation sharding on a (dp=2, tp=4) mesh; the loss
    must equal the plain-xla train step on the same batch."""
    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.parallel import replicate_params, shard_batch
    from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step

    base = dict(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=2, num_heads=4,
        ffn_dim=48, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=28, max_q_l=4,
    )
    B, Lv, Lt = 4, 28, 4  # Lv+Lt = 32 tiles over tp=4
    rng = np.random.default_rng(5)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 3:8] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = 3 / Lv, 8 / Lv
    mi = {
        "src_txt": rng.standard_normal((B, Lt, 16)).astype(np.float32),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": rng.standard_normal((B, Lv, 34)).astype(np.float32),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    }
    tg = {
        "timestamp": ts,
        "timestamp_mask": np.ones((B, Lv), np.float32),
        "timestamp_window": window,
        "span_labels_nn": nn_sp,
        "saliency_scores": rng.uniform(0, 1, (B, Lv)).astype(np.float32),
        "saliency_pos_labels": np.full((B, 1), 4, np.int32),
    }

    def run(impl):
        cfg = ModelConfig(**base, attention_impl=impl,
                          seq_shard=(impl == "ring"))
        model = UniVTG(cfg)
        optimizer = make_optimizer(lambda s: 1e-4)
        state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer, LossWeights(), donate=False)
        if impl == "ring":
            mesh = make_mesh(dp=2, tp=4)
            state = state.replace(params=replicate_params(mesh, state.params))
            with jax.set_mesh(mesh):
                new_state, metrics = step(
                    state, shard_batch(mesh, mi), shard_batch(mesh, tg),
                    jax.random.PRNGKey(1),
                )
                jax.block_until_ready(new_state.params)
        else:
            new_state, metrics = step(state, mi, tg, jax.random.PRNGKey(1))
        return float(metrics["loss_overall"]), float(metrics["grad_norm"])

    loss_ring, gn_ring = run("ring")
    loss_xla, gn_xla = run("xla")
    assert np.isfinite(loss_ring)
    np.testing.assert_allclose(loss_ring, loss_xla, rtol=2e-5)
    np.testing.assert_allclose(gn_ring, gn_xla, rtol=2e-4)


def test_ring_dropout_matches_single_device_reference():
    """Ring dropout is keyed on GLOBAL (b, h, q, k) coordinates: the
    tp=4-sharded result must EXACTLY equal a single-device computation
    applying the same hash mask to the full probability tensor."""
    from univtg_tpu.ops.ring_attention import dropout_keep_mask

    mesh = make_mesh(dp=1, tp=4)
    rng = np.random.default_rng(6)
    B, L, D, H = 2, 32, 16, 2
    dh = D // H
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, 24:] = 0
    mask = jnp.asarray(mask)
    seed, rate = jnp.int32(21), 0.4

    got = ring_attention(
        q, k, v, mask, num_heads=H, mesh=mesh, axis="tp",
        dropout_rate=rate, dropout_seed=seed,
    )

    # single-device reference with the same global-coordinate mask
    qh = q.reshape(B, L, H, dh).transpose(0, 2, 1, 3) * dh**-0.5
    kh = k.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    s = s + (1.0 - mask)[:, None, None, :] * -1e30
    probs = jax.nn.softmax(s, axis=-1)
    d = dropout_keep_mask(seed, rate, probs.shape, 0, 0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs * d, vh)
    want = out.transpose(0, 2, 1, 3).reshape(B, L, D)

    np.testing.assert_allclose(
        np.asarray(got)[0], np.asarray(want)[0], atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(got)[1, :24], np.asarray(want)[1, :24], atol=3e-5
    )


def test_ring_dropout_grads_and_determinism():
    mesh = make_mesh(dp=1, tp=4)
    rng = np.random.default_rng(7)
    B, L, D, H = 1, 32, 16, 2
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def loss(q, k, v, seed):
        out = ring_attention(
            q, k, v, None, num_heads=H, mesh=mesh, axis="tp",
            dropout_rate=0.5, dropout_seed=seed,
        )
        return jnp.sum(out**2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, jnp.int32(1))
    g1b = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, jnp.int32(1))
    g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, jnp.int32(2))
    for a, b in zip(g1, g1b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
        for a, b in zip(g1, g2)
    )
    for a in g1:
        assert np.isfinite(np.asarray(a)).all()
    with pytest.raises(ValueError, match="dropout_seed"):
        ring_attention(q, k, v, None, num_heads=H, mesh=mesh, axis="tp",
                       dropout_rate=0.5)
