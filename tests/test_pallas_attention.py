"""Flash-attention kernel vs the XLA einsum path (interpret mode on CPU)."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from univtg_tpu.ops.attention import attention_scores_bias, sdpa_xla


def flash_interpret(q, k, v, mask, num_heads, block_q=16, block_k=16):
    from jax.experimental import pallas as pl

    import univtg_tpu.ops.pallas_attention as pa

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        fn = pa.flash_attention.__wrapped__  # un-jitted
        return fn(q, k, v, mask, num_heads=num_heads, block_q=block_q, block_k=block_k)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("Lq,Lk", [(16, 16), (24, 40), (33, 7)])
def test_flash_matches_xla(Lq, Lk):
    rng = np.random.default_rng(0)
    B, H, D = 2, 4, 32
    q = jnp.asarray(rng.standard_normal((B, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Lk, D)), jnp.float32)
    mask = np.ones((B, Lk), np.float32)
    mask[1, Lk // 2 :] = 0
    mask = jnp.asarray(mask)

    want = sdpa_xla(q, k, v, attention_scores_bias(mask), H)
    got = flash_interpret(q, k, v, mask, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_no_mask():
    rng = np.random.default_rng(1)
    B, H, D, L = 1, 2, 16, 16
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    want = sdpa_xla(q, k, v, None, H)
    got = flash_interpret(q, k, v, None, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
