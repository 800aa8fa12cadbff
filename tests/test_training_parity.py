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
