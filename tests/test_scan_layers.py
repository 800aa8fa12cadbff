"""scan_layers: lax.scan over stacked encoder layers (O(1) compile depth).

Eval-mode outputs must match the unrolled stack exactly after converting
params with stack_layer_params; training must work end-to-end (gradients
flow through the scan); the (dp, tp) mesh rules must cover the stacked
layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.config import replace
from univtg_tpu.models.encoder import stack_layer_params, unstack_layer_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=32, num_layers=3, num_heads=4,
        ffn_dim=48, max_v_l=12, max_q_l=6, droppath=0.1, input_dropout=0.2,
    )
    B, Lv, Lt = 4, 12, 6
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((B, Lt, cfg.txt_dim)), jnp.float32),
        jnp.ones((B, Lt), jnp.float32),
        jnp.asarray(rng.standard_normal((B, Lv, cfg.vid_dim)), jnp.float32),
        jnp.ones((B, Lv), jnp.float32),
    )
    model = UniVTG(cfg)
    params = model.init(jax.random.PRNGKey(0), *batch, train=False)["params"]
    return cfg, batch, params


def test_eval_outputs_match_unrolled_exactly(setup):
    cfg, batch, params = setup
    out_loop = UniVTG(cfg).apply({"params": params}, *batch, train=False)

    scan_params = dict(params)
    scan_params["encoder"] = stack_layer_params(params["encoder"], cfg.num_layers)
    cfg_scan = replace(cfg, scan_layers=True)
    out_scan = UniVTG(cfg_scan).apply({"params": scan_params}, *batch, train=False)

    assert set(out_loop) == set(out_scan)
    for k in out_loop:
        np.testing.assert_allclose(
            np.asarray(out_loop[k]), np.asarray(out_scan[k]), atol=1e-6, rtol=1e-6,
            err_msg=k,
        )


def test_stack_unstack_roundtrip(setup):
    cfg, _, params = setup
    enc = params["encoder"]
    back = unstack_layer_params(stack_layer_params(enc, cfg.num_layers))
    assert set(back) == set(enc)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        enc,
        back,
    )


def test_init_shapes_are_stacked(setup):
    cfg, batch, _ = setup
    cfg_scan = replace(cfg, scan_layers=True)
    params = UniVTG(cfg_scan).init(jax.random.PRNGKey(1), *batch, train=False)["params"]
    k = params["encoder"]["layers"]["layer"]["in_proj_kernel"]
    assert k.shape == (cfg.num_layers, cfg.hidden_dim, 3 * cfg.hidden_dim)


@pytest.mark.parametrize("remat", [False, True])
def test_training_step_through_scan(setup, remat):
    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step

    cfg, batch, _ = setup
    cfg_scan = replace(cfg, scan_layers=True, remat=remat)
    model = UniVTG(cfg_scan)
    optimizer = make_optimizer(lambda s: 1e-3)
    state = init_state(model, cfg_scan, optimizer, jax.random.PRNGKey(0))

    B, Lv, Lt = 4, cfg.max_v_l, cfg.max_q_l
    rng = np.random.default_rng(1)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 3:8] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = 3 / Lv, 8 / Lv
    mi = {
        "src_txt": rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32),
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
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    losses = []
    for i in range(4):
        state, m = step(state, mi, tg, jax.random.PRNGKey(2))
        losses.append(float(m["loss_overall"]))
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # it learns on the repeated batch


def test_tp_mesh_covers_scan_layout(setup):
    """Sharded train step on a (dp=2, tp=2) virtual mesh with scan_layers:
    stacked encoder matrices get tp shardings and the step runs."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from univtg_tpu.models.losses import LossWeights
    from univtg_tpu.parallel import make_mesh, replicate_params, shard_batch
    from univtg_tpu.parallel.mesh import param_shardings
    from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step

    cfg, batch, _ = setup
    cfg_scan = replace(cfg, scan_layers=True)
    model = UniVTG(cfg_scan)
    optimizer = make_optimizer(lambda s: 1e-3)
    state = init_state(model, cfg_scan, optimizer, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])

    sh = param_shardings(mesh, state.params)
    spec = sh["encoder"]["layers"]["layer"]["in_proj_kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, "tp"), spec

    state = state.replace(params=replicate_params(mesh, state.params))
    B, Lv, Lt = 4, cfg.max_v_l, cfg.max_q_l
    rng = np.random.default_rng(2)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 3:8] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = 3 / Lv, 8 / Lv
    mi = shard_batch(mesh, {
        "src_txt": rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    })
    tg = shard_batch(mesh, {
        "timestamp": ts,
        "timestamp_mask": np.ones((B, Lv), np.float32),
        "timestamp_window": window,
        "span_labels_nn": nn_sp,
        "saliency_scores": rng.uniform(0, 1, (B, Lv)).astype(np.float32),
        "saliency_pos_labels": np.full((B, 1), 4, np.int32),
    })
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    with jax.set_mesh(mesh):
        state, m = step(state, mi, tg, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss_overall"]))
