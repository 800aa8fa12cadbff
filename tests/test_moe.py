"""Mixture-of-Experts FFN (ops/moe.py) + expert parallelism ("ep" mesh axis).

Beyond-parity feature: the reference ships a dense FFN only
(model/transformer_encoder_droppath.py:95-101). Pins:
  * dispatch/combine einsum routing == a naive per-token top-k reference
    (values AND gradients),
  * capacity overflow drops tokens to zero (residual carries them),
  * padded tokens are excluded from routing, capacity, and the aux loss,
  * the Switch load-balance aux loss hits its analytic extremes,
  * ep-sharded training == single-device training (same seeds/data),
  * MoE + pipeline parallelism is rejected,
  * eval-mode forward needs no mutable collections.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.ops.moe import moe_capacity, moe_ffn, moe_routing
from univtg_tpu.parallel import make_mesh, replicate_params, shard_batch
from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step


def _rand_moe(seed=0, d=8, f=16, e=4):
    rng = np.random.default_rng(seed)
    return (
        (rng.standard_normal((d, e)) * 0.3).astype(np.float32),
        (rng.standard_normal((e, d, f)) * 0.2).astype(np.float32),
        (rng.standard_normal((e, f)) * 0.05).astype(np.float32),
        (rng.standard_normal((e, f, d)) * 0.2).astype(np.float32),
        (rng.standard_normal((e, d)) * 0.05).astype(np.float32),
    )


def naive_moe(x2d, rk, w1, b1, w2, b2, top_k):
    """Per-token gather reference (the torch-style implementation the
    einsum dispatch replaces). No capacity: callers use a capacity_factor
    large enough that nothing is dropped."""
    probs = jax.nn.softmax(x2d @ rk, axis=-1)
    idx = jnp.argsort(-probs, axis=-1)[:, :top_k]
    g = jnp.take_along_axis(probs, idx, axis=-1)
    if top_k > 1:  # top-1 keeps the RAW prob (Switch, differentiable router)
        g = g / jnp.sum(g, axis=-1, keepdims=True)
    out = jnp.zeros_like(x2d)
    for j in range(top_k):
        e = idx[:, j]
        h = jnp.einsum("nd,ndf->nf", x2d, w1[e]) + b1[e]
        h = jax.nn.gelu(h, approximate=False)
        out = out + g[:, j : j + 1] * (
            jnp.einsum("nf,nfd->nd", h, w2[e]) + b2[e]
        )
    return out


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_ffn_matches_naive_topk(top_k):
    rk, w1, b1, w2, b2 = _rand_moe()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 8)).astype(np.float32)
    y, _ = moe_ffn(
        jnp.asarray(x), rk, w1, b1, w2, b2, top_k=top_k, capacity_factor=8.0
    )
    yn = naive_moe(jnp.asarray(x).reshape(-1, 8), rk, w1, b1, w2, b2, top_k)
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, 8), np.asarray(yn), atol=1e-5
    )


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_grad_matches_naive(top_k):
    rk, w1, b1, w2, b2 = _rand_moe(seed=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32))

    def loss_einsum(params):
        y, _ = moe_ffn(
            x, params["rk"], params["w1"], b1, params["w2"], b2,
            top_k=top_k, capacity_factor=8.0,
        )
        return jnp.mean(y**2)

    def loss_naive(params):
        y = naive_moe(
            x.reshape(-1, 8), params["rk"], params["w1"], b1, params["w2"], b2,
            top_k,
        )
        return jnp.mean(y**2)

    params = {"rk": jnp.asarray(rk), "w1": jnp.asarray(w1), "w2": jnp.asarray(w2)}
    g_e = jax.grad(loss_einsum)(params)
    g_n = jax.grad(loss_naive)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_e[k]), np.asarray(g_n[k]), atol=1e-5, err_msg=k
        )


def test_moe_top1_router_gets_task_gradient():
    """Top-1 gating must keep the raw router probability as the combine
    weight (Switch): renormalizing would make the gate g/g == 1 and cut the
    router kernel off from the task-loss gradient entirely."""
    rk, w1, b1, w2, b2 = _rand_moe(seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 4, 8)).astype(np.float32))

    def task_loss(router_kernel):
        y, _ = moe_ffn(
            x, router_kernel, w1, b1, w2, b2, top_k=1, capacity_factor=8.0
        )
        return jnp.mean(y**2)

    g = jax.grad(task_loss)(jnp.asarray(rk))
    assert float(jnp.linalg.norm(g)) > 1e-4, float(jnp.linalg.norm(g))


def test_moe_topk_gt_experts_rejected():
    with pytest.raises(ValueError, match="top_k"):
        moe_routing(jnp.ones((4, 2), jnp.float32) * 0.5, 2, 3, 8)
    cfg = _moe_cfg(moe_experts=2, moe_top_k=3)
    mi, _ = _batch(B=2)
    with pytest.raises(ValueError, match="moe_top_k"):
        UniVTG(cfg).init(
            jax.random.PRNGKey(0),
            jnp.asarray(mi["src_txt"]),
            jnp.asarray(mi["src_txt_mask"]),
            jnp.asarray(mi["src_vid"]),
            jnp.asarray(mi["src_vid_mask"]),
            train=False,
        )


def test_ep_without_moe_rejected():
    """ep > 1 on a dense model would silently replicate compute over the ep
    axis; the driver must refuse (ADVICE r4)."""
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    cfg = TrainConfig(
        model=ModelConfig(vid_dim=34, txt_dim=16, hidden_dim=32,
                          num_layers=2, num_heads=4, ffn_dim=32),
        ep=2,
        results_dir="/tmp/ep_reject",
    )
    with pytest.raises(ValueError, match="moe_experts"):
        train_mr(cfg)


def test_moe_capacity_drops_overflow():
    """All 10 tokens route to expert 0; capacity 8 -> the LAST 2 rows of the
    dispatch/combine tensors are zero (tokens pass through on the residual),
    and counts saturate at capacity."""
    n, e = 10, 4
    probs = np.zeros((n, e), np.float32)
    probs[:, 0] = 1.0
    dispatch, combine, aux = moe_routing(jnp.asarray(probs), e, 1, 8)
    d = np.asarray(dispatch)
    assert d[:8].sum() == 8  # first 8 tokens each dispatched once
    assert d[8:].sum() == 0  # overflow dropped
    assert np.asarray(combine)[8:].sum() == 0
    # fully imbalanced top-1 -> aux = E * (1 * 1) = E
    np.testing.assert_allclose(float(aux), e, rtol=1e-6)


def test_moe_token_mask_excludes_padding():
    """Masked (padding) tokens must not be dispatched, must not consume
    capacity, and must not move the aux loss."""
    n, e = 8, 2
    probs = np.full((n, e), 0.5, np.float32)
    probs[:, 0] = 0.9
    probs[:, 1] = 0.1
    mask = np.ones((n,), np.float32)
    mask[4:] = 0.0
    cap = 4
    dispatch, _, aux = moe_routing(
        jnp.asarray(probs), e, 1, cap, token_mask=jnp.asarray(mask)
    )
    d = np.asarray(dispatch)
    assert d[4:].sum() == 0  # padding never dispatched
    assert d[:4].sum() == 4  # all 4 real tokens fit: pads took no capacity
    # all routed tokens pick expert 0 -> f=(1,0), p=(0.9,0.1): aux = 2*0.9
    np.testing.assert_allclose(float(aux), 2 * 0.9, rtol=1e-6)


def test_moe_aux_balanced_is_one():
    n, e = 16, 4
    rng = np.random.default_rng(4)
    probs = np.full((n, e), 1.0 / e, np.float32)
    # break argmax ties deterministically: token i prefers expert i%e by eps
    probs[np.arange(n), np.arange(n) % e] += 1e-4
    probs /= probs.sum(-1, keepdims=True)
    _, _, aux = moe_routing(jnp.asarray(probs), e, 1, moe_capacity(n, e, 1, 1.25))
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-3)


def _batch(B=8, Lv=16, Lt=6, vid_dim=34, txt_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.tile(
        ((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)
    ).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 3:8] = 1
    nn = np.zeros((B, Lv, 2), np.float32)
    nn[:, :, 0], nn[:, :, 1] = 3 / Lv, 8 / Lv
    mi = {
        "src_txt": rng.standard_normal((B, Lt, txt_dim)).astype(np.float32),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": rng.standard_normal((B, Lv, vid_dim)).astype(np.float32),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    }
    tg = {
        "timestamp": ts,
        "timestamp_mask": np.ones((B, Lv), np.float32),
        "timestamp_window": window,
        "span_labels_nn": nn,
        "saliency_scores": rng.uniform(0, 1, (B, Lv)).astype(np.float32),
        "saliency_pos_labels": np.full((B, 1), 4, np.int32),
    }
    return mi, tg


def _moe_cfg(**kw):
    base = dict(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6, moe_experts=4, moe_top_k=2, scan_layers=True,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_moe_ep_sharded_training_matches_single_device():
    """dp=2 x ep=2 x tp=2 MoE training == single-device training: identical
    loss trajectory (incl. the aux term) and final params."""
    cfg = _moe_cfg()
    model = UniVTG(cfg)
    optimizer = optax.sgd(1e-2)  # same rationale as test_spmd_equivalence
    weights = LossWeights()

    def run(dp, tp, ep, n_steps=3):
        mesh = make_mesh(dp=dp, tp=tp, ep=ep)
        state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
        state = state.replace(params=replicate_params(mesh, state.params))
        step = make_train_step(model, optimizer, weights, donate=False)
        losses, aux = [], []
        with jax.set_mesh(mesh):
            for i in range(n_steps):
                mi, tg = _batch(seed=i)
                mi, tg = shard_batch(mesh, mi), shard_batch(mesh, tg)
                state, metrics = step(state, mi, tg, jax.random.PRNGKey(1))
                losses.append(float(metrics["loss_overall"]))
                aux.append(float(metrics["loss_moe_aux"]))
            jax.block_until_ready(state.params)
        return losses, aux, state

    base_losses, base_aux, base_state = run(1, 1, 1)
    sh_losses, sh_aux, sh_state = run(2, 2, 2)
    np.testing.assert_allclose(sh_losses, base_losses, rtol=2e-5)
    np.testing.assert_allclose(sh_aux, base_aux, rtol=2e-5)
    # expert kernels really live on the ep axis
    spec = sh_state.params["encoder"]["layers"]["layer"]["moe_w1"].sharding.spec
    assert "ep" in spec, spec
    for a, b in zip(
        jax.tree_util.tree_leaves(base_state.params),
        jax.tree_util.tree_leaves(sh_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_moe_training_learns_and_reports_aux():
    cfg = _moe_cfg()
    model = UniVTG(cfg)
    optimizer = make_optimizer(lambda s: 5e-4)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    mi, tg = _batch(seed=0)
    losses = []
    for i in range(5):
        state, metrics = step(state, mi, tg, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss_overall"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(metrics["loss_moe_aux"]))


def _run_moe_steps(cfg, mesh=None, n_steps=3, ep=1):
    """Shared harness: 3 SGD steps; returns (losses, aux, final params)."""
    model = UniVTG(cfg)
    optimizer = optax.sgd(1e-2)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    losses, aux = [], []
    if mesh is None:
        for i in range(n_steps):
            mi, tg = _batch(seed=i)
            state, m = step(state, mi, tg, jax.random.PRNGKey(1))
            losses.append(float(m["loss_overall"]))
            aux.append(float(m["loss_moe_aux"]))
        return losses, aux, jax.device_get(state.params)
    from univtg_tpu.parallel import param_shardings

    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    with jax.set_mesh(mesh):
        for i in range(n_steps):
            mi, tg = _batch(seed=i)
            mi, tg = shard_batch(mesh, mi), shard_batch(mesh, tg)
            state, m = step(state, mi, tg, jax.random.PRNGKey(1))
            losses.append(float(m["loss_overall"]))
            aux.append(float(m["loss_moe_aux"]))
        jax.block_until_ready(state.params)
    return losses, aux, jax.device_get(state.params)


@pytest.mark.parametrize(
    "dp,pp,ep,tp",
    [
        (1, 2, 1, 1),  # plain pp x MoE
        (1, 2, 2, 1),  # pp x ep: expert axis sharded under the pipeline
        (1, 2, 1, 2),  # pp x tp: feature axes sharded under the pipeline
    ],
)
def test_moe_pipeline_matches_sequential_at_m1(dp, pp, ep, tp):
    """MoE x pipeline (VERDICT r4 item 5): with ONE microbatch and dp=1,
    pipelined MoE routing sees the same token set as the sequential scan,
    so the 3-step trajectory (losses, aux, final params) must match the
    single-device run exactly. The aux loss is threaded through the GPipe
    tick carry (pipeline_layers collect_aux) so it stays differentiable.

    dp > 1 is deliberately NOT in this exact-equality list: under the
    pipeline's shard_map each dp shard routes over its OWN rows (capacity
    and aux are per (microbatch x dp-shard) -- pipeline_layers docstring),
    whereas the non-pipelined SPMD path computes routing globally; the
    dp=2 composition is covered by
    test_moe_pipeline_microbatched_learns_and_routes."""
    n_dev = dp * pp * ep * tp
    cfg_seq = _moe_cfg(num_layers=4)
    cfg_pipe = _moe_cfg(
        num_layers=4, pipeline_stages=pp, pipeline_microbatches=1
    )
    ref_losses, ref_aux, ref_params = _run_moe_steps(cfg_seq)
    mesh = make_mesh(dp=dp, tp=tp, pp=pp, ep=ep, devices=jax.devices()[:n_dev])
    losses, aux, params = _run_moe_steps(cfg_pipe, mesh=mesh)
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5)
    np.testing.assert_allclose(aux, ref_aux, rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_moe_pipeline_microbatched_learns_and_routes():
    """M>1: routing is per microbatch (documented locality change), so no
    exact sequential equality -- pin that training runs, learns, reports a
    finite aux, and the ROUTER receives task gradient through the pipeline
    (the collect_aux carry keeps the aux differentiable)."""
    cfg = _moe_cfg(num_layers=4, pipeline_stages=2, pipeline_microbatches=2)
    model = UniVTG(cfg)
    optimizer = make_optimizer(lambda s: 5e-4)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    p0_router = np.asarray(
        state.params["encoder"]["layers"]["layer"]["moe_router"]
    ).copy()
    step = make_train_step(model, optimizer, LossWeights(), donate=False)
    mesh = make_mesh(dp=2, tp=1, pp=2, devices=jax.devices()[:4])
    from univtg_tpu.parallel import param_shardings

    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    losses = []
    with jax.set_mesh(mesh):
        mi, tg = _batch(seed=0)
        mi, tg = shard_batch(mesh, mi), shard_batch(mesh, tg)
        for i in range(5):
            state, m = step(state, mi, tg, jax.random.PRNGKey(2))
            losses.append(float(m["loss_overall"]))
        assert np.isfinite(float(m["loss_moe_aux"]))
        jax.block_until_ready(state.params)
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    # router moved: task gradient reached it through the pipeline
    p_router = np.asarray(
        jax.device_get(state.params["encoder"]["layers"]["layer"]["moe_router"])
    )
    assert np.abs(p_router - p0_router).max() > 0


@pytest.mark.parametrize(
    "pp,dp,tp,ep,n_micro,extra",
    [
        (2, 1, 1, 1, 4, {}),  # cond-branch path
        (2, 2, 1, 1, 2, {}),  # + dp: per-(microbatch x dp-shard) routing
        (2, 1, 2, 1, 4, {}),  # collective-uniform path (tp AUTO axis)
        # ep > 1: the expert all-to-alls are AUTO-axis collectives too, so
        # the tick body must go collective-uniform exactly like tp
        (2, 1, 1, 2, 4, {}),
        # interleaved 1F1B (v=2): aux still counted once per (m, chunk)
        (2, 1, 1, 1, 4, {"num_layers": 8, "pipeline_interleave": 2}),
    ],
)
def test_moe_1f1b_matches_microbatched_autodiff(pp, dp, tp, ep, n_micro, extra):
    """1F1B x MoE (round 5): every chunk's backward recomputes its sown
    load-balance aux and seeds the constant cotangent
    w/(layers x M x dp) through the SAME per-chunk vjp that produces the
    task gradients. The 3-step trajectory (losses AND final params) equals
    plain autodiff of the microbatched loss where each block's
    compute_losses includes its own aux term -- identical routing locality,
    so the match is exact."""
    import optax as _optax

    from univtg_tpu.models.losses import compute_losses
    from univtg_tpu.parallel import param_shardings
    from univtg_tpu.train.steps import forward
    from univtg_tpu.train.steps_1f1b import make_1f1b_train_step

    B = 8
    kw = {"num_layers": 4, **extra}
    cfg_pipe = _moe_cfg(pipeline_stages=pp, **kw)
    cfg_seq = _moe_cfg(num_layers=kw["num_layers"])
    model_seq = UniVTG(cfg_seq)
    mi, tg = _batch(B=B)
    mi = {k: jnp.asarray(v) for k, v in mi.items()}
    tg = {k: jnp.asarray(v) for k, v in tg.items()}
    weights = LossWeights()
    opt = _optax.sgd(1e-2)

    n_blocks = n_micro * dp
    bs = B // n_blocks

    def ref_step(state, mi, tg):
        def loss_fn(params):
            tot = 0.0
            for i in range(n_blocks):
                sl = slice(i * bs, (i + 1) * bs)
                mib = {k: v[sl] for k, v in mi.items()}
                tgb = jax.tree_util.tree_map(lambda a: a[sl], tg)
                out = forward(
                    model_seq, params, mib, train=True,
                    rngs={
                        "dropout": jax.random.PRNGKey(0),
                        "droppath": jax.random.PRNGKey(0),
                    },
                )
                tot = tot + compute_losses(out, tgb, weights)["loss_overall"]
            return tot / n_blocks

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    state_ref = init_state(model_seq, cfg_seq, opt, jax.random.PRNGKey(0))
    ref_losses = []
    for _ in range(3):
        state_ref, loss = jax.jit(ref_step)(state_ref, mi, tg)
        ref_losses.append(float(loss))

    model = UniVTG(cfg_pipe)
    mesh = make_mesh(
        dp=dp, tp=tp, pp=pp, ep=ep, devices=jax.devices()[: dp * pp * tp * ep]
    )
    state = init_state(model, cfg_pipe, opt, jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(model, opt, weights, n_micro=n_micro)
    smi, stg = shard_batch(mesh, mi), shard_batch(mesh, tg)
    losses, auxes = [], []
    with jax.set_mesh(mesh):
        for _ in range(3):
            state, m = step(state, smi, stg, jax.random.PRNGKey(1))
            losses.append(float(m["loss_overall"]))
            auxes.append(float(m["loss_moe_aux"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-6)
    assert all(np.isfinite(a) for a in auxes), auxes
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
        ),
        jax.device_get(state.params),
        jax.device_get(state_ref.params),
    )
    # the ROUTER moved: aux gradient reached mid-stage chunks through the
    # constant cotangent (it cannot arrive via the ring cotangent)
    r0 = init_state(model_seq, cfg_seq, opt, jax.random.PRNGKey(0)).params
    r0 = np.asarray(r0["encoder"]["layers"]["layer"]["moe_router"])
    r1 = np.asarray(
        jax.device_get(state.params["encoder"]["layers"]["layer"]["moe_router"])
    )
    assert np.abs(r1 - r0).max() > 0


def test_moe_eval_forward_no_mutable():
    """Eval-mode apply works without mutable collections (sow is a no-op)
    and both layer layouts produce identical outputs from the same params
    (scan <-> unrolled interchange via stack_layer_params, incl. the MoE
    leaves)."""
    from univtg_tpu.models.encoder import stack_layer_params

    mi, _ = _batch(B=2)
    args = (
        jnp.asarray(mi["src_txt"]),
        jnp.asarray(mi["src_txt_mask"]),
        jnp.asarray(mi["src_vid"]),
        jnp.asarray(mi["src_vid_mask"]),
    )
    cfg_u = _moe_cfg(scan_layers=False)
    params = UniVTG(cfg_u).init(jax.random.PRNGKey(0), *args, train=False)[
        "params"
    ]
    out_u = UniVTG(cfg_u).apply({"params": params}, *args, train=False)
    scan_params = dict(params)
    scan_params["encoder"] = stack_layer_params(
        params["encoder"], cfg_u.num_layers
    )
    out_s = UniVTG(_moe_cfg(scan_layers=True)).apply(
        {"params": scan_params}, *args, train=False
    )
    for k in ("saliency_scores", "pred_logits", "pred_spans"):
        np.testing.assert_allclose(
            np.asarray(out_u[k]), np.asarray(out_s[k]), atol=1e-5, err_msg=k
        )
    assert np.isfinite(np.asarray(out_u["saliency_scores"])).all()
