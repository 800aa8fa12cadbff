"""Pallas RDMA ring attention (ops/ring_attention_pallas.py).

The kernel is validated in TPU interpret mode (pltpu.InterpretParams),
which simulates the inter-device DMAs + semaphores on the virtual CPU
mesh: parity against the XLA-collective ring AND against single-device
SDPA, masked and unmasked, for several ring sizes. The actual ICI-overlap
win needs a real pod to measure (docs/PERF.md); the real-chip degenerate
(n_dev=1) compile check runs in verification, not here (the suite is
pinned to the CPU platform)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univtg_tpu.ops.attention import attention_scores_bias, sdpa_xla
from univtg_tpu.ops.ring_attention import ring_attention
from univtg_tpu.ops.ring_attention_pallas import ring_attention_pallas
from univtg_tpu.parallel import make_mesh


def _qkvm(B, L, D, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    if masked and B > 1:
        mask[1, int(L * 0.6):] = 0
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("n_ring", [1, 2, 4, 8])
def test_pallas_ring_matches_sdpa(n_ring):
    mesh = make_mesh(dp=1, tp=n_ring)
    B, L, D, H = 2, 64, 32, 4
    q, k, v, mask = _qkvm(B, L, D)
    want = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
    got = ring_attention_pallas(
        q, k, v, mask, num_heads=H, mesh=mesh, axis="tp", interpret=True
    )
    valid = int(L * 0.6)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want)[0], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got)[1, :valid], np.asarray(want)[1, :valid], atol=2e-5
    )


def test_pallas_ring_matches_collective_ring_exactly():
    """Same online-softmax recurrence, same NEG_INF masking -> the RDMA
    kernel and the shard_map+ppermute ring agree to fp rounding."""
    n_ring = 4
    mesh = make_mesh(dp=1, tp=n_ring)
    B, L, D, H = 2, 32, 16, 2
    q, k, v, mask = _qkvm(B, L, D, seed=3)
    ref = ring_attention(q, k, v, mask, num_heads=H, mesh=mesh, axis="tp")
    got = ring_attention_pallas(
        q, k, v, mask, num_heads=H, mesh=mesh, axis="tp", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_ring_no_mask():
    mesh = make_mesh(dp=1, tp=4)
    B, L, D, H = 1, 32, 16, 2
    q, k, v, _ = _qkvm(B, L, D, seed=1, masked=False)
    want = sdpa_xla(q, k, v, None, H)
    got = ring_attention_pallas(
        q, k, v, None, num_heads=H, mesh=mesh, axis="tp", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_ring_on_dp_sp_mesh():
    """Ring axis composed with a dp axis: the device-id tuples must address
    the right neighbor WITHIN each dp row (mesh-axis-ordered logical
    coordinates)."""
    mesh = make_mesh(dp=2, tp=4)
    B, L, D, H = 2, 32, 16, 2
    q, k, v, mask = _qkvm(B, L, D, seed=5)
    want = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
    got = jax.jit(
        lambda q, k, v, m: ring_attention_pallas(
            q, k, v, m, num_heads=H, mesh=mesh, axis="tp", interpret=True
        )
    )(q, k, v, mask)
    valid = int(L * 0.6)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want)[0], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got)[1, :valid], np.asarray(want)[1, :valid], atol=2e-5
    )


def test_pallas_ring_rejects_ragged_shard():
    mesh = make_mesh(dp=1, tp=4)
    q, k, v, mask = _qkvm(1, 30, 16, seed=2, masked=False)
    with pytest.raises(ValueError, match="tile"):
        ring_attention_pallas(
            q, k, v, mask, num_heads=2, mesh=mesh, axis="tp", interpret=True
        )


def test_ring_pallas_impl_in_encoder_eval():
    """attention_impl='ring_pallas' through the full model under a tp mesh
    (eval path): outputs equal the 'xla' impl; with dropout active
    (training) the impl falls back to the differentiable XLA ring."""
    from univtg_tpu.models import ModelConfig, UniVTG

    base = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=1, num_heads=4,
        ffn_dim=48, max_v_l=28, max_q_l=4,
    )
    ring_cfg = ModelConfig(**{**base.__dict__, "attention_impl": "ring_pallas"})
    rng = np.random.default_rng(7)
    B, Lv, Lt = 2, 28, 4  # Lv+Lt = 32 tiles over tp=4
    args = (
        jnp.asarray(rng.standard_normal((B, Lt, 16)), jnp.float32),
        jnp.ones((B, Lt), jnp.float32),
        jnp.asarray(rng.standard_normal((B, Lv, 34)), jnp.float32),
        jnp.ones((B, Lv), jnp.float32),
    )
    params = UniVTG(base).init(jax.random.PRNGKey(0), *args, train=False)["params"]
    want = UniVTG(base).apply({"params": params}, *args, train=False)
    mesh = make_mesh(dp=1, tp=4)
    with jax.set_mesh(mesh):
        got = UniVTG(ring_cfg).apply({"params": params}, *args, train=False)
    for k in ("pred_logits", "pred_spans", "saliency_scores"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=3e-5, err_msg=k
        )


def test_pallas_ring_differentiable_via_xla_ring_backward():
    """The custom vjp (backward recomputes through the XLA-collective ring)
    makes the kernel trainable: gradients match single-device SDPA. Before
    this, jax.grad through the kernel crashed (review r5 finding)."""
    mesh = make_mesh(dp=1, tp=4)
    B, L, D, H = 2, 32, 16, 2
    q, k, v, mask = _qkvm(B, L, D, seed=9, masked=False)

    def loss_pallas(q, k, v):
        out = ring_attention_pallas(
            q, k, v, mask, num_heads=H, mesh=mesh, axis="tp", interpret=True
        )
        return jnp.sum(out**2)

    def loss_ref(q, k, v):
        from univtg_tpu.ops.attention import attention_scores_bias, sdpa_xla

        return jnp.sum(sdpa_xla(q, k, v, attention_scores_bias(mask), H) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_pallas_ring_rejects_oversized_bh():
    from univtg_tpu.ops.ring_attention_pallas import MAX_BH

    mesh = make_mesh(dp=1, tp=4)
    B, H = 16, 8  # B*H = 128 > MAX_BH
    assert B * H > MAX_BH
    q, k, v, mask = _qkvm(B, 32, 64, seed=4, masked=False)
    with pytest.raises(ValueError, match="MAX_BH|num_heads"):
        ring_attention_pallas(
            q, k, v, mask, num_heads=H, mesh=mesh, axis="tp", interpret=True
        )
