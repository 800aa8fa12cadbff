"""Flash-attention kernels vs the XLA einsum path (interpret mode on CPU):
forward parity, grad parity through the custom-vjp flash backward, and
encoder-level training equivalence with attention_impl='pallas'."""
import contextlib
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from univtg_tpu.ops.attention import attention_scores_bias, sdpa_xla


@contextlib.contextmanager
def pallas_interpret():
    os.environ["UNIVTG_PALLAS_INTERPRET"] = "1"
    try:
        yield
    finally:
        os.environ.pop("UNIVTG_PALLAS_INTERPRET", None)


def flash_interpret(q, k, v, mask, num_heads, block_q=16, block_k=16):
    import univtg_tpu.ops.pallas_attention as pa

    with pallas_interpret():
        fn = pa.flash_attention.__wrapped__  # un-jitted
        return fn(q, k, v, mask, num_heads=num_heads, block_q=block_q, block_k=block_k)


def _rand_qkv(seed, B, Lq, Lk, D):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Lk, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("Lq,Lk", [(16, 16), (24, 40), (33, 7)])
def test_flash_matches_xla(Lq, Lk):
    B, H, D = 2, 4, 32
    q, k, v = _rand_qkv(0, B, Lq, Lk, D)
    mask = np.ones((B, Lk), np.float32)
    mask[1, Lk // 2 :] = 0
    mask = jnp.asarray(mask)

    want = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
    got = flash_interpret(q, k, v, mask, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_no_mask():
    B, H, D, L = 1, 2, 16, 16
    q, k, v = _rand_qkv(1, B, L, L, D)
    want = sdpa_xla(q, k, v, None, H)
    got = flash_interpret(q, k, v, None, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("Lq,Lk", [(16, 16), (24, 40)])
def test_flash_grads_match_xla(Lq, Lk):
    """custom-vjp flash backward: dQ/dK/dV match autodiff through the XLA
    softmax attention for masked, non-square, padded shapes."""
    import univtg_tpu.ops.pallas_attention as pa

    B, H, D = 2, 4, 32
    q, k, v = _rand_qkv(2, B, Lq, Lk, D)
    mask = np.ones((B, Lk), np.float32)
    mask[1, max(1, Lk // 2) :] = 0
    mask = jnp.asarray(mask)
    w = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, Lq, D)), jnp.float32
    )  # cotangent seed: sum(out * w)

    def loss_xla(q, k, v):
        out = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
        return jnp.sum(out * w)

    def loss_flash(q, k, v):
        fn = pa.flash_attention.__wrapped__
        out = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16)
        return jnp.sum(out * w)

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pallas_interpret():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_grad_masked_keys_zero():
    """Keys masked out receive zero dK/dV (they never contribute to any
    valid row's softmax)."""
    import univtg_tpu.ops.pallas_attention as pa

    B, H, D, L = 1, 2, 16, 16
    q, k, v = _rand_qkv(4, B, L, L, D)
    mask = np.ones((B, L), np.float32)
    mask[0, 10:] = 0
    mask = jnp.asarray(mask)

    def loss(k, v):
        fn = pa.flash_attention.__wrapped__
        out = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16)
        return jnp.sum(out**2)

    with pallas_interpret():
        dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    assert np.abs(np.asarray(dk)[0, 10:]).max() == 0.0
    assert np.abs(np.asarray(dv)[0, 10:]).max() == 0.0
    assert np.abs(np.asarray(dk)[0, :10]).max() > 0.0


def test_encoder_training_equivalence_pallas_vs_xla():
    """A short coupled SGD run through the full UniVTG model must produce
    the same loss curve with attention_impl='pallas' (interpret) as with
    'xla' -- the trainable long-context path end to end."""
    import optax

    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.models.losses import LossWeights, compute_losses

    kw = dict(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=24, max_q_l=8,
    )
    B, Lv, Lt = 2, 24, 8
    rng = np.random.default_rng(11)
    ts = ((np.arange(Lv) + 0.5) / Lv).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 4:9] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = ts[4] - 0.02, ts[8] + 0.02
    vm = np.ones((B, Lv), np.float32)
    vm[1, 18:] = 0  # ragged batch: padded keys must stay excluded
    batches = []
    for i in range(3):
        r = np.random.default_rng(50 + i)
        batches.append(
            dict(
                mi={
                    "src_txt": r.standard_normal((B, Lt, 16)).astype(np.float32),
                    "src_txt_mask": np.ones((B, Lt), np.float32),
                    "src_vid": r.standard_normal((B, Lv, 34)).astype(np.float32),
                    "src_vid_mask": vm,
                },
                tg={
                    "timestamp": np.tile(ts[None, :, None], (B, 1, 2)).astype(np.float32),
                    "timestamp_mask": vm,
                    "timestamp_window": window * vm,
                    "span_labels_nn": nn_sp,
                    "saliency_scores": (r.uniform(0, 1, (B, Lv)) * vm).astype(np.float32),
                    "saliency_pos_labels": np.full((B, 1), 5, np.int32),
                },
            )
        )

    weights = LossWeights()

    def run(impl):
        cfg = ModelConfig(**kw, attention_impl=impl)
        model = UniVTG(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            batches[0]["mi"]["src_txt"], batches[0]["mi"]["src_txt_mask"],
            batches[0]["mi"]["src_vid"], batches[0]["mi"]["src_vid_mask"],
            train=False,
        )["params"]
        tx = optax.sgd(0.05)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, mi, tg):
            def loss_fn(p):
                out = model.apply(
                    {"params": p}, mi["src_txt"], mi["src_txt_mask"],
                    mi["src_vid"], mi["src_vid_mask"], train=True,
                )
                return compute_losses(out, tg, weights)["loss_overall"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for b in batches:
            params, opt_state, loss = step(params, opt_state, b["mi"], b["tg"])
            losses.append(float(loss))
        return losses

    base = run("xla")
    with pallas_interpret():
        got = run("pallas")
    np.testing.assert_allclose(got, base, rtol=2e-5)
    assert base[-1] < base[0]  # actually learning


def test_flash_dropout_forward_semantics():
    """In-kernel attention dropout: deterministic per seed, seed-dependent,
    unbiased (mean over seeds ~ no-dropout output), and masked keys stay
    excluded."""
    import univtg_tpu.ops.pallas_attention as pa

    B, H, D, L = 1, 2, 16, 32
    q, k, v = _rand_qkv(7, B, L, L, D)
    mask = np.ones((B, L), np.float32)
    mask[0, 24:] = 0
    mask = jnp.asarray(mask)
    fn = pa.flash_attention.__wrapped__

    with pallas_interpret():
        base = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16)
        o1 = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16,
                dropout_rate=0.5, dropout_seed=jnp.int32(3))
        o1b = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16,
                 dropout_rate=0.5, dropout_seed=jnp.int32(3))
        o2 = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16,
                dropout_rate=0.5, dropout_seed=jnp.int32(4))
        acc = np.zeros_like(np.asarray(base))
        n_seeds = 64
        for sd in range(n_seeds):
            acc += np.asarray(
                fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16,
                   dropout_rate=0.5, dropout_seed=jnp.int32(100 + sd))
            )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))  # deterministic
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-3  # seed matters
    assert np.abs(np.asarray(o1) - np.asarray(base)).max() > 1e-3  # drops happen
    # unbiased estimator of the undropped attention
    err = np.abs(acc / n_seeds - np.asarray(base))
    assert err.mean() < 0.15, err.mean()


def test_flash_dropout_grad_finite_difference():
    """The backward regenerates the forward's exact dropout mask: for a
    fixed seed the op is deterministic, so its custom-vjp gradient must
    match central finite differences along random directions."""
    import univtg_tpu.ops.pallas_attention as pa

    B, H, D, L = 1, 2, 16, 32
    q, k, v = _rand_qkv(8, B, L, L, D)
    mask = jnp.asarray(np.ones((B, L), np.float32))
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal((B, L, D)), jnp.float32
    )
    fn = pa.flash_attention.__wrapped__

    def loss(q, k, v):
        out = fn(q, k, v, mask, num_heads=H, block_q=16, block_k=16,
                 dropout_rate=0.3, dropout_seed=jnp.int32(11))
        return jnp.sum(out * w)

    with pallas_interpret():
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        rng = np.random.default_rng(10)
        eps = 1e-3
        for i, (name, x) in enumerate(zip("qkv", (q, k, v))):
            direction = jnp.asarray(
                rng.standard_normal(x.shape), jnp.float32
            )
            args_p = [q, k, v]
            args_m = [q, k, v]
            args_p[i] = x + eps * direction
            args_m[i] = x - eps * direction
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            analytic = float(jnp.sum(grads[i] * direction))
            assert abs(fd - analytic) <= 5e-3 * max(1.0, abs(fd)), (
                name, fd, analytic,
            )


def test_mha_pallas_dropout_uses_kernel_path():
    """multihead_attention with impl='pallas' + dropout stays on the fused
    path (no silent XLA fallback): outputs are rng-deterministic and differ
    from the no-dropout result."""
    from univtg_tpu.ops.attention import multihead_attention

    B, L, D, H = 2, 32, 16, 2
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    params = dict(
        in_proj_kernel=jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.1, jnp.float32),
        in_proj_bias=jnp.zeros((3 * D,), jnp.float32),
        out_kernel=jnp.asarray(np.eye(D), jnp.float32),
        out_bias=jnp.zeros((D,), jnp.float32),
    )
    mask = jnp.ones((B, L), jnp.float32)
    with pallas_interpret():
        base = multihead_attention(
            x, x, x, **params, num_heads=H, key_padding_mask=mask, impl="pallas"
        )
        d1 = multihead_attention(
            x, x, x, **params, num_heads=H, key_padding_mask=mask, impl="pallas",
            dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(0),
        )
        d1b = multihead_attention(
            x, x, x, **params, num_heads=H, key_padding_mask=mask, impl="pallas",
            dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(0),
        )
        d2 = multihead_attention(
            x, x, x, **params, num_heads=H, key_padding_mask=mask, impl="pallas",
            dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(1),
        )
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    assert np.abs(np.asarray(d1) - np.asarray(base)).max() > 1e-4
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-4


def test_flash_dropout_masks_differ_across_batch_heads():
    """Regression (review r3-2): the tile-seed mixing must not wrap -- with
    identical q/k/v tiled across a batch of 65, example 64 would get
    example 0's exact dropout mask under the old base-8192 packing (period
    64 in the batch-head index) and produce an identical output row."""
    import univtg_tpu.ops.pallas_attention as pa

    B, H, D, L = 65, 1, 8, 16
    rng = np.random.default_rng(13)
    one = rng.standard_normal((1, L, D)).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(one, (B, L, D)).copy())
    with pallas_interpret():
        out = pa.flash_attention.__wrapped__(
            x, x, x, None, num_heads=H, block_q=16, block_k=16,
            dropout_rate=0.5, dropout_seed=jnp.int32(7),
        )
    o = np.asarray(out)
    assert np.abs(o[64] - o[0]).max() > 1e-6
    assert np.abs(o[1] - o[0]).max() > 1e-6


def test_flash_dropout_requires_seed():
    import univtg_tpu.ops.pallas_attention as pa

    q = jnp.zeros((1, 16, 8), jnp.float32)
    with pallas_interpret():
        with pytest.raises(ValueError, match="dropout_seed"):
            pa.flash_attention.__wrapped__(
                q, q, q, None, num_heads=1, block_q=16, block_k=16,
                dropout_rate=0.5,
            )


def test_flash_fuzz_shapes_and_grads():
    """Randomized shape/mask/block fuzz (interpret): forward parity and
    grad parity vs XLA across ragged lengths, head widths, and blockings --
    the configurations a fixed-parameter test never visits."""
    import univtg_tpu.ops.pallas_attention as pa

    rng = np.random.default_rng(42)
    with pallas_interpret():
        for trial in range(6):
            B = int(rng.integers(1, 3))
            H = int(rng.choice([1, 2, 4]))
            dh = int(rng.choice([8, 16, 32]))
            D = H * dh
            Lq = int(rng.integers(3, 50))
            Lk = int(rng.integers(3, 50))
            bq = int(rng.choice([8, 16, 32]))
            bk = int(rng.choice([8, 16, 32]))
            q = jnp.asarray(rng.standard_normal((B, Lq, D)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((B, Lk, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, Lk, D)), jnp.float32)
            mask = (rng.uniform(size=(B, Lk)) < 0.8).astype(np.float32)
            mask[:, 0] = 1  # no fully-masked rows (degenerate contract)
            mask = jnp.asarray(mask)
            w = jnp.asarray(rng.standard_normal((B, Lq, D)), jnp.float32)

            fn = pa.flash_attention.__wrapped__
            got = fn(q, k, v, mask, num_heads=H, block_q=bq, block_k=bk)
            want = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=5e-5,
                err_msg=f"fwd trial {trial}: B{B} H{H} dh{dh} Lq{Lq} Lk{Lk} b({bq},{bk})",
            )

            def loss_flash(q, k, v):
                return jnp.sum(
                    fn(q, k, v, mask, num_heads=H, block_q=bq, block_k=bk) * w
                )

            def loss_xla(q, k, v):
                return jnp.sum(
                    sdpa_xla(q, k, v, attention_scores_bias(mask), H) * w
                )

            gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
            for name, a, b in zip("qkv", gf, gx):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4,
                    err_msg=f"d{name} trial {trial}",
                )
