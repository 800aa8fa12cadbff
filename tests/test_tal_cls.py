"""TAL-style class-feature pretraining path: src_cls through the model,
saliency_cls loss with cls_idx targets, and the train step's static-input
plumbing. (The reference's driver references an undefined
train_dataset.src_cls -- main/train_vlp.py:118 -- so this path only
*works* here.)"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights, compute_losses, loss_saliency_cls
from univtg_tpu.train.steps import init_state, make_train_step

from tests.test_spmd_equivalence import make_batch


CFG = ModelConfig(
    vid_dim=34, txt_dim=16, hidden_dim=48, num_layers=1, num_heads=4,
    ffn_dim=64, dropout=0.0, droppath=0.0, input_dropout=0.0,
    max_v_l=16, max_q_l=6,
)


def make_cls_bank(C=5, Lc=3, D=16, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((C, Lc, D)).astype(np.float32),
        np.ones((C, Lc), np.float32),
    )


def test_model_emits_cls_mem_proj():
    model = UniVTG(CFG)
    mi, tg = make_batch(B=4)
    cls, cls_mask = make_cls_bank()
    params = model.init(
        jax.random.PRNGKey(0), mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
        mi["src_vid_mask"], cls, cls_mask, train=False,
    )["params"]
    out = model.apply(
        {"params": params}, mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
        mi["src_vid_mask"], cls, cls_mask, train=False,
    )
    assert out["cls_mem_proj"].shape == (5, CFG.hidden_dim)


def test_saliency_cls_loss_and_grads():
    model = UniVTG(CFG)
    mi, tg = make_batch(B=4)
    cls, cls_mask = make_cls_bank()
    params = model.init(
        jax.random.PRNGKey(0), mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
        mi["src_vid_mask"], cls, cls_mask, train=False,
    )["params"]
    # one-hot class per sample over the 5-concept bank
    cls_idx = np.zeros((4, 5), np.float32)
    cls_idx[np.arange(4), [0, 2, 1, 4]] = 1
    tg = dict(tg, cls_idx=cls_idx)

    def total(p):
        out = model.apply(
            {"params": p}, mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
            mi["src_vid_mask"], cls, cls_mask, train=True,
        )
        ld = compute_losses(
            out, {k: jnp.asarray(v) for k, v in tg.items()}, LossWeights(),
            losses=("spans", "labels", "saliency_cls"),
        )
        return ld["loss_overall"], ld

    (loss, ld), grads = jax.value_and_grad(total, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "loss_s_intra" in ld  # the class-contrastive term
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_step_static_cls_inputs():
    model = UniVTG(CFG)
    optimizer = optax.sgd(1e-2)
    cls, cls_mask = make_cls_bank()
    state = init_state(model, CFG, optimizer, jax.random.PRNGKey(0))
    # init with cls so weighted_pool params exist... shared pool: same params
    step = make_train_step(
        model, optimizer, LossWeights(),
        losses=("spans", "labels", "saliency_cls"), donate=False,
        static_inputs={"src_cls": jnp.asarray(cls), "src_cls_mask": jnp.asarray(cls_mask)},
    )
    mi, tg = make_batch(B=4)
    cls_idx = np.zeros((4, 5), np.float32)
    cls_idx[np.arange(4), [0, 2, 1, 4]] = 1
    tg = dict(tg, cls_idx=cls_idx)
    state, metrics = step(state, mi, tg, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_overall"]))
    assert float(metrics["loss_s_intra"]) != 0.0


def test_1f1b_train_step_with_cls_matches_microbatched_autodiff():
    """The TAL class bank through the 1F1B engine (VERDICT r4 item 4): the
    projected cls tokens ride the heads bundle, their cotangent flows back
    through `pre`. 3-step trajectory (losses AND final params) equals plain
    autodiff of the microbatched saliency_cls loss on one device."""
    from univtg_tpu.parallel import make_mesh, param_shardings, shard_batch
    from univtg_tpu.train.steps import forward, make_optimizer
    from univtg_tpu.train.steps_1f1b import make_1f1b_train_step

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=4, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6, scan_layers=True,
    )
    model = UniVTG(cfg)
    B, n_micro, pp, dp = 8, 4, 2, 2
    mi, tg = make_batch(B=B)
    cls, cls_mask = make_cls_bank(D=16)
    cls_idx = np.zeros((B, 5), np.float32)
    cls_idx[np.arange(B), np.arange(B) % 5] = 1
    tg = dict(tg, cls_idx=cls_idx)
    losses_sel = ("spans", "labels", "saliency_cls")
    static = {
        "src_cls": jnp.asarray(cls),
        "src_cls_mask": jnp.asarray(cls_mask),
    }
    opt = make_optimizer(lambda s: 1e-3)
    weights = LossWeights()

    n_blocks = n_micro * dp
    bs = B // n_blocks

    def ref_step(state, mi, tg):
        def loss_fn(params):
            tot = 0.0
            for i in range(n_blocks):
                sl = slice(i * bs, (i + 1) * bs)
                mib = {k: v[sl] for k, v in mi.items()}
                mib.update(static)  # the bank is NOT microbatched
                tgb = jax.tree_util.tree_map(lambda a: a[sl], tg)
                out = forward(model, params, mib, train=False)
                tot = tot + compute_losses(
                    out, tgb, weights, losses=losses_sel
                )["loss_overall"]
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

    tg_j = {k: jnp.asarray(v) for k, v in tg.items()}
    mi_j = {k: jnp.asarray(v) for k, v in mi.items()}
    state_ref = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    ref_losses = []
    for _ in range(3):
        state_ref, loss = jax.jit(ref_step)(state_ref, mi_j, tg_j)
        ref_losses.append(float(loss))

    mesh = make_mesh(dp=dp, pp=pp, devices=jax.devices()[: dp * pp])
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(
        model, opt, weights, losses_sel, n_micro=n_micro, static_inputs=static
    )
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


def test_1f1b_cls_and_moe_composed_matches_autodiff():
    """The two 1F1B side channels TOGETHER: the TAL class bank on the heads
    bundle AND the MoE aux cotangent seeded per chunk vjp. 2-step
    trajectory equals plain autodiff of the microbatched
    saliency_cls-plus-aux loss."""
    from univtg_tpu.parallel import make_mesh, param_shardings, shard_batch
    from univtg_tpu.train.steps import forward, make_optimizer
    from univtg_tpu.train.steps_1f1b import make_1f1b_train_step

    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=4, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6, scan_layers=True,
        moe_experts=4, moe_top_k=2,
    )
    model = UniVTG(cfg)
    B, n_micro, pp = 8, 4, 2
    mi, tg = make_batch(B=B)
    cls, cls_mask = make_cls_bank(D=16)
    cls_idx = np.zeros((B, 5), np.float32)
    cls_idx[np.arange(B), np.arange(B) % 5] = 1
    tg = dict(tg, cls_idx=cls_idx)
    losses_sel = ("spans", "labels", "saliency_cls")
    static = {
        "src_cls": jnp.asarray(cls),
        "src_cls_mask": jnp.asarray(cls_mask),
    }
    opt = make_optimizer(lambda s: 1e-3)
    weights = LossWeights()
    n_blocks = n_micro
    bs = B // n_blocks

    def ref_step(state, mi, tg):
        def loss_fn(params):
            tot = 0.0
            for i in range(n_blocks):
                sl = slice(i * bs, (i + 1) * bs)
                mib = {k: v[sl] for k, v in mi.items()}
                mib.update(static)
                tgb = jax.tree_util.tree_map(lambda a: a[sl], tg)
                # train=True so forward collects the per-block MoE aux
                # into the block's weighted loss_overall
                out = forward(
                    model, params, mib, train=True,
                    rngs={
                        "dropout": jax.random.PRNGKey(0),
                        "droppath": jax.random.PRNGKey(0),
                    },
                )
                tot = tot + compute_losses(
                    out, tgb, weights, losses=losses_sel
                )["loss_overall"]
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

    tg_j = {k: jnp.asarray(v) for k, v in tg.items()}
    mi_j = {k: jnp.asarray(v) for k, v in mi.items()}
    state_ref = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    ref_losses = []
    for _ in range(2):
        state_ref, loss = jax.jit(ref_step)(state_ref, mi_j, tg_j)
        ref_losses.append(float(loss))

    mesh = make_mesh(dp=1, pp=pp, devices=jax.devices()[:pp])
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    step = make_1f1b_train_step(
        model, opt, weights, losses_sel, n_micro=n_micro, static_inputs=static
    )
    smi, stg = shard_batch(mesh, mi), shard_batch(mesh, tg)
    losses = []
    with jax.set_mesh(mesh):
        for _ in range(2):
            state, m = step(state, smi, stg, jax.random.PRNGKey(1))
            losses.append(float(m["loss_overall"]))
            assert np.isfinite(float(m["loss_moe_aux"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
        ),
        jax.device_get(state.params),
        jax.device_get(state_ref.params),
    )
