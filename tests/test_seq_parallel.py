"""Sequence-parallel activation sharding: identical outputs with/without the
constraints, and training under jax.set_mesh runs with sp active."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.parallel import make_mesh, replicate_params, shard_batch
from univtg_tpu.parallel.mesh import seq_constraint
from univtg_tpu.train.steps import init_state, make_train_step

from tests.test_spmd_equivalence import make_batch


def test_seq_constraint_noop_without_mesh():
    x = jnp.ones((2, 8, 4))
    np.testing.assert_array_equal(np.asarray(seq_constraint(x)), np.asarray(x))


def test_seq_constraint_warns_when_axis_does_not_tile():
    """A token axis that doesn't tile over tp silently disabled sp in round 1;
    now it must warn (once per shape) so the skip is visible."""
    import univtg_tpu.parallel.mesh as mesh_mod

    mesh = make_mesh(dp=2, tp=4)
    x = jnp.ones((2, 7, 4))  # 7 % 4 != 0
    mesh_mod._SEQ_SKIP_WARNED.clear()
    with jax.set_mesh(mesh):
        with pytest.warns(UserWarning, match="does not tile"):
            out = seq_constraint(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        # second call with the same shape: no duplicate warning
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            seq_constraint(x)


def test_make_mesh_actionable_error():
    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(dp=64, tp=2)


def test_seq_shard_outputs_match():
    base_cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, max_v_l=16, max_q_l=6,
    )
    sp_cfg = ModelConfig(**{**base_cfg.__dict__, "seq_shard": True})
    rng = np.random.default_rng(0)
    B, Lv, Lt = 4, 16, 6
    txt = rng.standard_normal((B, Lt, 16)).astype(np.float32)
    vid = rng.standard_normal((B, Lv, 34)).astype(np.float32)
    tm, vm = np.ones((B, Lt), np.float32), np.ones((B, Lv), np.float32)

    model = UniVTG(base_cfg)
    params = model.init(jax.random.PRNGKey(0), txt, tm, vid, vm, train=False)["params"]
    want = model.apply({"params": params}, txt, tm, vid, vm, train=False)

    mesh = make_mesh(dp=2, tp=4)
    sp_model = UniVTG(sp_cfg)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p: sp_model.apply({"params": p}, txt, tm, vid, vm, train=False)
        )(params)
    for k in ("pred_logits", "pred_spans", "saliency_scores"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5, err_msg=k
        )


def test_seq_shard_training_runs():
    import optax

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=16, seq_shard=True,
    )
    model = UniVTG(cfg)
    optimizer = optax.sgd(1e-2)
    mesh = make_mesh(dp=2, tp=4)
    with jax.set_mesh(mesh):
        state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
        state = state.replace(params=replicate_params(mesh, state.params))
        step = make_train_step(model, optimizer, LossWeights(), donate=False)
        # Lv + Lt = 32 tiles evenly over tp=4, so the constraint is active
        mi, tg = make_batch(B=8, Lt=16)
        mi = shard_batch(mesh, mi)
        tg = shard_batch(mesh, tg)
        state, metrics = step(state, mi, tg, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_overall"]))
