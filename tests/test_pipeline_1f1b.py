"""True 1F1B pipelined training (parallel/pipeline_1f1b.py).

The engine produces gradients with per-chunk jax.vjp inside a single scan
(no autodiff across ticks), so the tests pin it against plain autodiff of
the SAME loss definition: the mean of per-(microbatch x dp-shard) block
losses (the reference's DDP locality, main/train_vlp_ddp.py:272-275 --
each worker computes its criterion over local rows).

Beyond-parity capability: the reference has data parallelism only.
"""
import jax
import numpy as np
import optax
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights, compute_losses
from univtg_tpu.parallel import make_mesh, param_shardings, shard_batch
from univtg_tpu.parallel.pipeline_1f1b import (
    pipeline_1f1b_ticks,
    schedule_1f1b,
)
from univtg_tpu.train.steps import (
    TrainState,
    forward,
    init_state,
    make_optimizer,
)
from univtg_tpu.train.steps_1f1b import make_1f1b_train_step

# ---------------------------------------------------------------------------
# Pure schedule invariants (no mesh)


@pytest.mark.parametrize(
    "pp,v,n_micro",
    [
        (2, 1, 4), (2, 1, 1), (2, 1, 8), (4, 1, 4), (4, 1, 13), (3, 1, 7),
        (2, 2, 4), (2, 2, 3), (2, 2, 16), (2, 4, 8), (4, 2, 8), (3, 3, 7),
    ],
)
def test_schedule_invariants(pp, v, n_micro):
    """(a) every (microbatch, chunk) runs forward AND backward exactly
    once, on device chunk%pp; (b) forward rides chunk c->c+1 one tick
    apart, backward rides c->c-1 one tick apart (one ppermute each); (c)
    at most one F and one B per device per tick; (d) the per-(device,
    slot) saved-activation ring of size 2*pp never holds two live
    microbatches in the same position; (e) pipeline_1f1b_ticks is exactly
    the last active tick + 1; (f) at v=1 the last stage's F and B of a
    microbatch coincide (the fused tick)."""
    ticks = pipeline_1f1b_ticks(n_micro, pp, v)
    fwd_seen, bwd_seen = {}, {}  # (m, global chunk c) -> tick
    last_active = -1
    for t in range(ticks + 2 * pp * v):  # overshoot: nothing past `ticks`
        for s in range(pp):
            fwd, bwd = schedule_1f1b(t, s, pp=pp, n_micro=n_micro, interleave=v)
            if fwd is not None:
                j, m = fwd
                c = s + pp * j
                assert (m, c) not in fwd_seen
                fwd_seen[(m, c)] = t
                last_active = max(last_active, t)
            if bwd is not None:
                j, m = bwd
                c = s + pp * j
                assert (m, c) not in bwd_seen
                assert (m, c) in fwd_seen, "backward before forward"
                bwd_seen[(m, c)] = t
                last_active = max(last_active, t)
        # ring-collision check per (device, slot)
        for s in range(pp):
            for j in range(v):
                c = s + pp * j
                live = [
                    m for m in range(n_micro)
                    if (m, c) in fwd_seen and (m, c) not in bwd_seen
                ]
                slots = [m % (2 * pp) for m in live]
                assert len(set(slots)) == len(slots), (t, s, j, live)
    assert len(fwd_seen) == len(bwd_seen) == n_micro * pp * v
    for m in range(n_micro):
        for c in range(pp * v - 1):
            assert fwd_seen[(m, c + 1)] == fwd_seen[(m, c)] + 1
            assert bwd_seen[(m, c)] == bwd_seen[(m, c + 1)] + 1
        if v == 1:
            assert fwd_seen[(m, pp - 1)] == bwd_seen[(m, pp - 1)]
    assert last_active + 1 == ticks


# ---------------------------------------------------------------------------
# Gradient / trajectory equality vs plain autodiff of the microbatched loss


def _mr_batch(B, Lv, Lt, cfg):
    rng = np.random.default_rng(0)
    ts = np.tile(
        ((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)
    ).astype(np.float32)
    win = np.zeros((B, Lv), np.float32)
    win[:, 3:8] = 1
    nn_ = np.zeros((B, Lv, 2), np.float32)
    nn_[:, :, 0], nn_[:, :, 1] = 3 / Lv, 8 / Lv
    mi = {
        "src_txt": rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    }
    tg = {
        "timestamp": ts,
        "timestamp_mask": np.ones((B, Lv), np.float32),
        "timestamp_window": win,
        "span_labels_nn": nn_,
        "saliency_scores": rng.uniform(0, 1, (B, Lv)).astype(np.float32),
        "saliency_pos_labels": np.full((B, 1), 4, np.int32),
    }
    return mi, tg


_MODEL_KW = dict(
    vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=4, num_heads=4,
    ffn_dim=96, max_v_l=16, max_q_l=8, dropout=0.0, droppath=0.0,
    input_dropout=0.0, scan_layers=True,
)


def _make_ref_step(model, opt, weights, n_blocks):
    """Plain-autodiff step on the 1F1B loss definition: mean of the loss
    over each of `n_blocks` contiguous row blocks (microbatch x dp order
    matches the engine's (M, mb/dp) split)."""

    def step(state: TrainState, mi, tg, rng):
        B = mi["src_txt"].shape[0]
        bs = B // n_blocks

        def loss_fn(params):
            tot = 0.0
            for i in range(n_blocks):
                sl = slice(i * bs, (i + 1) * bs)
                mib = {k: v[sl] for k, v in mi.items()}
                tgb = jax.tree_util.tree_map(lambda a: a[sl], tg)
                out = forward(model, params, mib, train=False)
                tot = tot + compute_losses(out, tgb, weights)["loss_overall"]
            return tot / n_blocks

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
            grads,
        )

    return jax.jit(step)


@pytest.mark.parametrize(
    "pp,dp,tp,n_micro,B,kw",
    [
        (2, 2, 1, 4, 8, {}),                   # canonical
        (2, 1, 1, 8, 8, {}),                   # M=8 > 2*pp=4: ring slots reused
        (4, 1, 1, 4, 8, {"num_layers": 8}),    # 4 stages, deeper stack
        (2, 1, 1, 1, 4, {}),                   # M=1 degenerate
        (2, 2, 1, 4, 8, {"use_txt_pos": True}),  # trainable text pos cotangent
        # interleaved 1F1B (v>1): canonical-order params, engine gathers
        (2, 1, 1, 4, 8, {"num_layers": 8, "pipeline_interleave": 2}),
        (2, 2, 1, 6, 12, {"num_layers": 8, "pipeline_interleave": 4}),
        # 1F1B x tp: Megatron feature-sharded stacked matrices ride the
        # engine's AUTO tp axis (pp x tp specs, parallel/mesh.py)
        (2, 1, 2, 4, 8, {}),
        (2, 2, 2, 4, 8, {"num_layers": 8, "pipeline_interleave": 2}),
    ],
)
def test_1f1b_training_matches_microbatched_autodiff(pp, dp, tp, n_micro, B, kw):
    """Three coupled optimizer steps: the 1F1B trajectory (losses AND final
    params) equals plain autodiff of the microbatched-loss on one device."""
    cfg = ModelConfig(**{**_MODEL_KW, **kw})
    model = UniVTG(cfg)
    mi, tg = _mr_batch(B, 16, 8, cfg)
    opt = make_optimizer(lambda s: 1e-4)
    weights = LossWeights()

    state_ref = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    ref_step = _make_ref_step(model, opt, weights, n_micro * dp)
    ref_losses = []
    for _ in range(3):
        state_ref, loss, _ = ref_step(state_ref, mi, tg, jax.random.PRNGKey(1))
        ref_losses.append(float(loss))

    mesh = make_mesh(dp=dp, pp=pp, tp=tp, devices=jax.devices()[: dp * pp * tp])
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(model, opt, weights, n_micro=n_micro)
    smi, stg = shard_batch(mesh, mi), shard_batch(mesh, tg)
    losses = []
    with jax.set_mesh(mesh):
        for _ in range(3):
            state, m = step(state, smi, stg, jax.random.PRNGKey(1))
            losses.append(float(m["loss_overall"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
        ),
        jax.device_get(state.params),
        jax.device_get(state_ref.params),
    )


def test_1f1b_gradients_match_microbatched_autodiff():
    """Single-step gradient comparison (tighter than trajectories): every
    leaf of the 1F1B gradient tree equals the autodiff gradient of the
    microbatched loss."""
    cfg = ModelConfig(**_MODEL_KW)
    model = UniVTG(cfg)
    mi, tg = _mr_batch(8, 16, 8, cfg)
    weights = LossWeights()
    # sgd(1.0): params_before - params_after == the gradient tree exactly
    sgd = optax.sgd(1.0)

    state0 = init_state(model, cfg, sgd, jax.random.PRNGKey(0))
    _, _, g_ref = _make_ref_step(model, sgd, weights, 4)(
        state0, mi, tg, jax.random.PRNGKey(1)
    )

    mesh = make_mesh(dp=1, pp=2, tp=1, devices=jax.devices()[:2])
    state = init_state(model, cfg, sgd, jax.random.PRNGKey(0))
    params_before = jax.device_get(state.params)
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(model, sgd, weights, n_micro=4, donate=False)
    with jax.set_mesh(mesh):
        new_state, _ = step(
            state, shard_batch(mesh, mi), shard_batch(mesh, tg), jax.random.PRNGKey(1)
        )
    g_1f1b = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b),
        params_before,
        jax.device_get(new_state.params),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, np.asarray(b), atol=2e-5, rtol=2e-4),
        g_1f1b,
        jax.device_get(g_ref),
    )


def test_interleaved_1f1b_pre_permuted_matches_autodiff():
    """The production layout for v>1: device-major (pre-permuted) training
    state, permutation-free per step. The 3-step trajectory equals plain
    autodiff of the microbatched loss on canonical params, and the final
    device-major params convert back to the canonical trajectory's."""
    from univtg_tpu.parallel.pipeline import permute_pipeline_params

    L, v, M = 8, 2, 4
    cfg_ref = ModelConfig(**dict(_MODEL_KW, num_layers=L))
    cfg = ModelConfig(
        **dict(_MODEL_KW, num_layers=L),
        pipeline_stages=2, pipeline_microbatches=M,
        pipeline_interleave=v, pipeline_pre_permuted=True,
    )
    model_ref = UniVTG(cfg_ref)  # canonical twin: identical param tree
    model = UniVTG(cfg)
    mi, tg = _mr_batch(8, 16, 8, cfg)
    opt = make_optimizer(lambda s: 1e-4)
    weights = LossWeights()

    state_ref = init_state(model_ref, cfg_ref, opt, jax.random.PRNGKey(0))
    ref_step = _make_ref_step(model_ref, opt, weights, M)
    ref_losses = []
    for _ in range(3):
        state_ref, loss, _ = ref_step(state_ref, mi, tg, jax.random.PRNGKey(1))
        ref_losses.append(float(loss))

    mesh = make_mesh(dp=1, pp=2, tp=1, devices=jax.devices()[:2])
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    state = state.replace(
        params=permute_pipeline_params(state.params, L, 2, v),
        opt_state=permute_pipeline_params(state.opt_state, L, 2, v),
    )
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(model, opt, weights, n_micro=M)
    smi, stg = shard_batch(mesh, mi), shard_batch(mesh, tg)
    losses = []
    with jax.set_mesh(mesh):
        for _ in range(3):
            state, m = step(state, smi, stg, jax.random.PRNGKey(1))
            losses.append(float(m["loss_overall"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-6)
    params_back = permute_pipeline_params(
        jax.device_get(state.params), L, 2, v, inverse=True
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
        ),
        params_back,
        jax.device_get(state_ref.params),
    )


def test_1f1b_with_dropout_runs_and_learns():
    """Dropout/droppath active: RNG folds per (microbatch, global layer) so
    the backward recompute regenerates the forward masks; the loss must stay
    finite and decrease (exact equality to sequential is not expected --
    different fold order)."""
    kw = dict(_MODEL_KW, dropout=0.1, droppath=0.1, input_dropout=0.3)
    cfg = ModelConfig(**kw)
    model = UniVTG(cfg)
    mi, tg = _mr_batch(8, 16, 8, cfg)
    opt = make_optimizer(lambda s: 5e-4)
    mesh = make_mesh(dp=2, pp=2, tp=1, devices=jax.devices()[:4])
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(model, opt, LossWeights(), n_micro=4)
    smi, stg = shard_batch(mesh, mi), shard_batch(mesh, tg)
    losses = []
    with jax.set_mesh(mesh):
        for i in range(4):
            state, m = step(state, smi, stg, jax.random.PRNGKey(i))
            losses.append(float(m["loss_overall"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_1f1b_activation_memory_independent_of_microbatch_count():
    """THE point of 1F1B: compiled temp (activation) memory stays O(pp)
    saved microbatches while GPipe-autodiff's grows with the microbatch
    count M. Measured at fixed microbatch size mb=8 (B = 8*M), hidden 64,
    Lv=56, pp=2 on the virtual mesh (jax 0.9, CPU backend):

        M=4 :  gpipe  49.4 MB   1f1b 14.5 MB
        M=32:  gpipe 306.5 MB   1f1b 42.3 MB   (growth 6.2x vs 2.9x)

    1F1B's residual growth is the O(B) input/cotangent buffers (the
    (M, mb, ...) d_src/d_vid/d_txt accumulators), not saved activations.
    Assertions are kept directional with margin so compiler-version drift
    doesn't break them."""
    mb, Lv, Lt = 8, 56, 8
    kw = dict(_MODEL_KW, max_v_l=Lv, max_q_l=Lt)
    mesh = make_mesh(dp=1, pp=2, tp=1, devices=jax.devices()[:2])
    opt = make_optimizer(lambda s: 1e-4)

    def temp_bytes(schedule, M):
        B = mb * M
        if schedule == "gpipe":
            cfg = ModelConfig(**kw, pipeline_stages=2, pipeline_microbatches=M)
        else:
            cfg = ModelConfig(**kw)
        model = UniVTG(cfg)
        mi, tg = _mr_batch(B, Lv, Lt, cfg)
        state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
        state = state.replace(
            params=jax.device_put(state.params, param_shardings(mesh, state.params))
        )
        if schedule == "gpipe":
            from univtg_tpu.train.steps import make_train_step

            step = make_train_step(model, opt, LossWeights(), donate=False)
        else:
            step = make_1f1b_train_step(
                model, opt, LossWeights(), n_micro=M, donate=False
            )
        smi, stg = shard_batch(mesh, mi), shard_batch(mesh, tg)
        with jax.set_mesh(mesh):
            c = step.lower(state, smi, stg, jax.random.PRNGKey(1)).compile()
        return c.memory_analysis().temp_size_in_bytes

    g4, g32 = temp_bytes("gpipe", 4), temp_bytes("gpipe", 32)
    f4, f32 = temp_bytes("1f1b", 4), temp_bytes("1f1b", 32)
    # absolute: at large M the 1F1B step uses a small fraction of GPipe's
    assert f32 < g32 / 3, (f32, g32)
    # growth: GPipe scales with M, 1F1B's activation term does not
    assert g32 / g4 > 4.0, (g4, g32)
    assert f32 / f4 < 4.0, (f4, f32)


def test_validation_errors():
    opt = make_optimizer(lambda s: 1e-4)
    with pytest.raises(ValueError, match="scan_layers"):
        make_1f1b_train_step(
            UniVTG(ModelConfig(**dict(_MODEL_KW, scan_layers=False))),
            opt, LossWeights(), n_micro=4,
        )
    with pytest.raises(ValueError, match="post-norm"):
        make_1f1b_train_step(
            UniVTG(ModelConfig(**dict(_MODEL_KW, pre_norm=True))),
            opt, LossWeights(), n_micro=4,
        )
    with pytest.raises(ValueError, match="pre_permuted"):
        # device-major layout without interleaving is meaningless
        make_1f1b_train_step(
            UniVTG(ModelConfig(
                **_MODEL_KW, pipeline_stages=2, pipeline_pre_permuted=True,
            )),
            opt, LossWeights(), n_micro=4,
        )
    with pytest.raises(ValueError, match="microbatch"):
        make_1f1b_train_step(UniVTG(ModelConfig(**_MODEL_KW)), opt, LossWeights())

    # off-mesh execution must refuse (the engine needs a pp axis)
    cfg = ModelConfig(**_MODEL_KW)
    model = UniVTG(cfg)
    mi, tg = _mr_batch(4, 16, 8, cfg)
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    step = make_1f1b_train_step(model, opt, LossWeights(), n_micro=2, donate=False)
    with pytest.raises(ValueError, match="pp"):
        step(state, mi, tg, jax.random.PRNGKey(1))
