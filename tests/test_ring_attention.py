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
