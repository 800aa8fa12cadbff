"""Training-dynamics parity: with identical (mapped) initialization, data,
and SGD updates, our jitted train step must track the reference PyTorch
model+criterion loss curve step-for-step."""
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from model.univtg import SetCriterion  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests.test_losses_parity import make_batch  # noqa: E402
from tests.test_model_parity import CFG as PARITY_CFG, build_ref_model  # noqa: E402
from univtg_tpu.interop import params_from_torch_state_dict  # noqa: E402
from univtg_tpu.models import ModelConfig, UniVTG  # noqa: E402
from univtg_tpu.models.losses import LossWeights, compute_losses  # noqa: E402


def test_sgd_loss_curves_match():
    # deterministic config: no dropout/droppath
    cfg = ModelConfig(
        **{
            **PARITY_CFG.__dict__,
            "dropout": 0.0,
            "droppath": 0.0,
            "input_dropout": 0.0,
        }
    )
    ref = build_ref_model(cfg)
    ref.train()
    params = params_from_torch_state_dict(ref.state_dict(), cfg)["params"]
    model = UniVTG(cfg)
    weights = LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1)
    wd = weights.as_dict()

    crit = SetCriterion(
        matcher=None,
        weight_dict=wd,
        eos_coef=0.1,
        losses=["spans", "labels", "saliency"],
        temperature=0.07,
        span_loss_type="l1",
        max_v_l=cfg.max_v_l,
        saliency_margin=1,
    )
    lr = 0.05
    opt_t = torch.optim.SGD(ref.parameters(), lr=lr)
    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        mi, tg = batch

        def loss_fn(p):
            out = model.apply(
                {"params": p},
                mi["src_txt"], mi["src_txt_mask"], mi["src_vid"], mi["src_vid_mask"],
                train=True,
            )
            return compute_losses(out, tg, weights)["loss_overall"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    torch_losses, jax_losses = [], []
    for i in range(4):
        outputs, targets = make_batch(seed=i, B=3, Lv=cfg.max_v_l, D=8)
        # full-length videos: the reference's unmasked conv heads read padded
        # tokens on ragged batches (the divergence we deliberately fixed), so
        # dynamics parity is defined on exact-length batches
        targets["timestamp_mask"] = np.ones((3, cfg.max_v_l), np.float32)
        ts = ((np.arange(cfg.max_v_l) + 0.5) / cfg.max_v_l).astype(np.float32)
        targets["timestamp"] = np.tile(ts[None, :, None], (3, 1, 2))
        rng = np.random.default_rng(100 + i)
        vid = rng.standard_normal((3, cfg.max_v_l, cfg.vid_dim)).astype(np.float32)
        txt = rng.standard_normal((3, 8, cfg.txt_dim)).astype(np.float32)
        vm = targets["timestamp_mask"]
        tm = np.ones((3, 8), np.float32)

        # torch step
        opt_t.zero_grad()
        t_out = ref(
            src_txt=torch.from_numpy(txt),
            src_txt_mask=torch.from_numpy(tm),
            src_vid=torch.from_numpy(vid),
            src_vid_mask=torch.from_numpy(vm),
        )
        t_tgt = {k: torch.from_numpy(np.asarray(v)) for k, v in targets.items()}
        ld = crit(t_out, t_tgt)
        t_loss = sum(ld[k] * wd[k] for k in ld if k in wd)
        t_loss.backward()
        opt_t.step()
        torch_losses.append(float(t_loss))

        # jax step
        mi = {
            "src_txt": jnp.asarray(txt),
            "src_txt_mask": jnp.asarray(tm),
            "src_vid": jnp.asarray(vid),
            "src_vid_mask": jnp.asarray(vm),
        }
        tg = {k: jnp.asarray(np.asarray(v)) for k, v in targets.items()}
        params, opt_state, j_loss = step(params, opt_state, (mi, tg))
        jax_losses.append(float(j_loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)
    # parameters still aligned after 4 coupled SGD steps
    sd = ref.state_dict()
    mapped = params_from_torch_state_dict(sd, cfg)["params"]
    a = np.asarray(params["encoder"]["layers_0"]["linear1"]["kernel"])
    b = np.asarray(mapped["encoder"]["layers_0"]["linear1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_moment_detr_sgd_loss_curves_match():
    """Coupled SGD for the DETR baseline: matched losses (Hungarian
    assignment included) must track the reference step-for-step."""
    from model.moment_detr import SetCriterion as MDCrit
    from model.matcher import HungarianMatcher

    from tests.test_moment_detr import CFG as MD_CFG, build_ref
    from univtg_tpu.interop.torch_ckpt import md_params_from_torch_state_dict
    from univtg_tpu.models.moment_detr import (
        MomentDETR,
        MomentDETRConfig,
        moment_detr_losses,
    )

    cfg = MomentDETRConfig(
        **{**MD_CFG.__dict__, "dropout": 0.0, "input_dropout": 0.0, "aux_loss": True}
    )
    ref = build_ref(cfg)
    ref.train()
    params = md_params_from_torch_state_dict(ref.state_dict(), cfg)["params"]
    model = MomentDETR(cfg)

    wd = {"loss_b": 10.0, "loss_g": 1.0, "loss_f": 4.0, "loss_s_intra": 1.0}
    for i in range(cfg.num_decoder_layers - 1):
        wd.update({f"loss_b_{i}": 10.0, f"loss_g_{i}": 1.0, f"loss_f_{i}": 4.0})
    matcher = HungarianMatcher(
        cost_class=4, cost_span=10, cost_giou=1, span_loss_type="l1", max_v_l=75
    )
    crit = MDCrit(
        matcher=matcher, weight_dict=wd, eos_coef=0.1,
        losses=["spans", "labels", "saliency"], temperature=0.07,
        span_loss_type="l1", max_v_l=75, saliency_margin=0.2,
    )
    lr = 0.05
    opt_t = torch.optim.SGD(ref.parameters(), lr=lr)
    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    import re

    @jax.jit
    def step(params, opt_state, mi, tg):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, mi["src_txt"], mi["src_txt_mask"], mi["src_vid"],
                mi["src_vid_mask"], train=True,
            )
            ld = moment_detr_losses(out, tg, eos_coef=0.1, saliency_margin=0.2)
            return sum(wd.get(re.sub(r"_\d+$", "", k) if k[-1].isdigit() else k, 0.0)
                       * v for k, v in ld.items())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    B, Lv, Lt = 3, cfg.max_v_l, 8
    t_losses, j_losses = [], []
    for i in range(4):
        rng = np.random.default_rng(200 + i)
        vid = rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32)
        txt = rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32)
        vm = np.ones((B, Lv), np.float32)
        tm = np.ones((B, Lt), np.float32)
        n_windows = rng.integers(1, 3, B)
        spans_cxw = np.zeros((B, 2, 2), np.float32)
        for b in range(B):
            for w in range(n_windows[b]):
                c = rng.uniform(0.2, 0.8)
                width = rng.uniform(0.1, 0.3)
                spans_cxw[b, w] = [c, width]
        pos = rng.integers(0, Lv, (B, 1)).astype(np.int64)
        neg = rng.integers(0, Lv, (B, 1)).astype(np.int64)

        # torch step
        opt_t.zero_grad()
        t_out = ref(
            src_txt=torch.from_numpy(txt), src_txt_mask=torch.from_numpy(tm),
            src_vid=torch.from_numpy(vid), src_vid_mask=torch.from_numpy(vm),
        )
        t_tgt = {
            "span_labels": [
                {"spans": torch.from_numpy(spans_cxw[b, : n_windows[b]])}
                for b in range(B)
            ],
            "saliency_pos_labels": torch.from_numpy(pos),
            "saliency_neg_labels": torch.from_numpy(neg),
        }
        ld = crit(t_out, t_tgt)
        t_loss = sum(ld[k] * wd[k] for k in ld if k in wd)
        t_loss.backward()
        opt_t.step()
        t_losses.append(float(t_loss))

        # jax step
        mi = {
            "src_txt": jnp.asarray(txt), "src_txt_mask": jnp.asarray(tm),
            "src_vid": jnp.asarray(vid), "src_vid_mask": jnp.asarray(vm),
        }
        tg = {
            "span_labels": jnp.asarray(spans_cxw),
            "n_windows": jnp.asarray(n_windows, jnp.int32),
            "saliency_pos_labels": jnp.asarray(pos, jnp.int32),
            "saliency_neg_labels": jnp.asarray(neg, jnp.int32),
        }
        params, opt_state, j_loss = step(params, opt_state, mi, tg)
        j_losses.append(float(j_loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4)


def test_sub_as_query_sgd_loss_curves_match():
    """Sub-as-query corpora (no annotator scores, PARITY.md divergence note
    #11): saliency_scores is the binary timestamp_window and the positive is
    drawn from its nonzeros (main/dataset.py:553-557). Coupled SGD on batches
    built exactly that way pins the branch's training dynamics."""
    cfg = ModelConfig(
        **{
            **PARITY_CFG.__dict__,
            "dropout": 0.0,
            "droppath": 0.0,
            "input_dropout": 0.0,
        }
    )
    ref = build_ref_model(cfg)
    ref.train()
    params = params_from_torch_state_dict(ref.state_dict(), cfg)["params"]
    model = UniVTG(cfg)
    weights = LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1)
    wd = weights.as_dict()
    crit = SetCriterion(
        matcher=None, weight_dict=wd, eos_coef=0.1,
        losses=["spans", "labels", "saliency"], temperature=0.07,
        span_loss_type="l1", max_v_l=cfg.max_v_l, saliency_margin=1,
    )
    lr = 0.05
    opt_t = torch.optim.SGD(ref.parameters(), lr=lr)
    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        mi, tg = batch

        def loss_fn(p):
            out = model.apply(
                {"params": p},
                mi["src_txt"], mi["src_txt_mask"], mi["src_vid"], mi["src_vid_mask"],
                train=True,
            )
            return compute_losses(out, tg, weights)["loss_overall"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    B, Lv, Lt = 3, cfg.max_v_l, 8
    ts = ((np.arange(Lv) + 0.5) / Lv).astype(np.float32)
    torch_losses, jax_losses = [], []
    for i in range(3):
        rng = np.random.default_rng(300 + i)
        # sub-as-query supervision: one GT window, binary saliency
        window = np.zeros((B, Lv), np.float32)
        span_nn = np.zeros((B, Lv, 2), np.float32)
        pos = np.zeros((B, 1), np.int64)
        neg = np.zeros((B, 1), np.int64)
        for b in range(B):
            st = int(rng.integers(0, Lv - 5))
            ed = int(rng.integers(st + 2, min(st + 8, Lv)))
            window[b, st : ed + 1] = 1
            span_nn[b, st : ed + 1] = [ts[st] - 0.4 / Lv, ts[ed] + 0.4 / Lv]
            # positive re-drawn uniformly from window nonzeros (the override)
            pos[b, 0] = int(rng.choice(np.flatnonzero(window[b])))
            pool = np.flatnonzero(window[b] == 0)
            neg[b, 0] = int(rng.choice(pool))
        targets = {
            "timestamp": np.tile(ts[None, :, None], (B, 1, 2)).astype(np.float32),
            "timestamp_mask": np.ones((B, Lv), np.float32),
            "timestamp_window": window,
            "span_labels_nn": span_nn,
            "saliency_scores": window.copy(),  # binary, = timestamp_window
            "saliency_pos_labels": pos,
            "saliency_neg_labels": neg,
        }
        vid = rng.standard_normal((B, Lv, cfg.vid_dim)).astype(np.float32)
        txt = rng.standard_normal((B, Lt, cfg.txt_dim)).astype(np.float32)
        vm = np.ones((B, Lv), np.float32)
        tm = np.ones((B, Lt), np.float32)

        opt_t.zero_grad()
        t_out = ref(
            src_txt=torch.from_numpy(txt), src_txt_mask=torch.from_numpy(tm),
            src_vid=torch.from_numpy(vid), src_vid_mask=torch.from_numpy(vm),
        )
        t_tgt = {k: torch.from_numpy(np.asarray(v)) for k, v in targets.items()}
        ld = crit(t_out, t_tgt)
        t_loss = sum(ld[k] * wd[k] for k in ld if k in wd)
        t_loss.backward()
        opt_t.step()
        torch_losses.append(float(t_loss))

        mi = {
            "src_txt": jnp.asarray(txt), "src_txt_mask": jnp.asarray(tm),
            "src_vid": jnp.asarray(vid), "src_vid_mask": jnp.asarray(vm),
        }
        tg = {k: jnp.asarray(np.asarray(v)) for k, v in targets.items()}
        params, opt_state, j_loss = step(params, opt_state, (mi, tg))
        jax_losses.append(float(j_loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)
