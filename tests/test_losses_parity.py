"""Loss parity vs the reference SetCriterion (model/univtg.py:157-351) on
randomized dense-supervision batches."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from model.univtg import SetCriterion  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from univtg_tpu.models.losses import LossWeights, compute_losses  # noqa: E402


def make_batch(seed, B=4, Lv=20, D=16):
    rng = np.random.default_rng(seed)
    timestamp_mask = np.zeros((B, Lv), np.float32)
    lengths = rng.integers(8, Lv + 1, B)
    for i, l in enumerate(lengths):
        timestamp_mask[i, :l] = 1
    ts = ((np.arange(Lv) + 0.5) / Lv).astype(np.float32)
    timestamp = np.stack([ts, ts], -1)[None].repeat(B, 0) * timestamp_mask[..., None]

    # one GT window per sample, containing >= 1 clip center
    span_labels_nn = np.zeros((B, Lv, 2), np.float32)
    timestamp_window = np.zeros((B, Lv), np.float32)
    for i, l in enumerate(lengths):
        st = rng.integers(0, l - 4)
        ed = rng.integers(st + 3, l)
        w = np.array([ts[st] - 0.4 / Lv, ts[ed] + 0.4 / Lv], np.float32)
        inside = (ts >= w[0]) & (ts <= w[1]) & (timestamp_mask[i] > 0)
        timestamp_window[i] = inside
        span_labels_nn[i, inside] = w

    sal = rng.uniform(0, 1, (B, Lv)).astype(np.float32) * timestamp_mask
    pos_idx = np.array(
        [rng.integers(0, l) for l in lengths], np.int64
    )

    pred_spans = np.stack(
        [-rng.uniform(0, 1, (B, Lv)), rng.uniform(0, 1, (B, Lv))], -1
    ).astype(np.float32)
    pred_logits = rng.uniform(0.01, 0.99, (B, Lv, 1)).astype(np.float32)
    vid_mem = rng.standard_normal((B, Lv, D)).astype(np.float32)
    txt_mem = rng.standard_normal((B, 1, D)).astype(np.float32)

    outputs = {
        "pred_spans": pred_spans,
        "pred_logits": pred_logits,
        "vid_mem_proj": vid_mem,
        "txt_mem_proj": txt_mem,
        "saliency_scores": np.zeros((B, Lv), np.float32),
    }
    targets = {
        "timestamp": timestamp,
        "timestamp_mask": timestamp_mask,
        "timestamp_window": timestamp_window,
        "span_labels_nn": span_labels_nn,
        "saliency_scores": sal,
        "saliency_pos_labels": pos_idx[:, None],
    }
    return outputs, targets


@pytest.mark.parametrize("seed", range(5))
def test_loss_parity(seed):
    outputs, targets = make_batch(seed)
    crit = SetCriterion(
        matcher=None,
        weight_dict={},
        eos_coef=0.1,
        losses=["spans", "labels", "saliency"],
        temperature=0.07,
        span_loss_type="l1",
        max_v_l=20,
        saliency_margin=1,
    )
    t_out = {k: torch.from_numpy(np.asarray(v)) for k, v in outputs.items()}
    t_tgt = {k: torch.from_numpy(np.asarray(v)) for k, v in targets.items()}
    with torch.no_grad():
        ref = crit(t_out, t_tgt)

    j_out = {k: jnp.asarray(v) for k, v in outputs.items()}
    j_tgt = {k: jnp.asarray(v) for k, v in targets.items()}
    got = compute_losses(j_out, j_tgt, LossWeights())

    for k in ("loss_b", "loss_g", "loss_f", "loss_s_inter", "loss_s_intra"):
        assert float(got[k]) == pytest.approx(float(ref[k]), abs=2e-5), k


def test_zero_saliency_disables_contrastive():
    outputs, targets = make_batch(0)
    targets["saliency_scores"] = np.zeros_like(targets["saliency_scores"])
    got = compute_losses(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
        LossWeights(),
    )
    assert float(got["loss_s_inter"]) == 0.0
    assert float(got["loss_s_intra"]) == 0.0


def test_gates_zero_out_losses():
    outputs, targets = make_batch(1)
    j_out = {k: jnp.asarray(v) for k, v in outputs.items()}
    j_tgt = {k: jnp.asarray(v) for k, v in targets.items()}
    gates = jnp.zeros((4, 5))
    got = compute_losses(j_out, j_tgt, LossWeights(), gates=gates)
    for k in ("loss_b", "loss_g", "loss_f"):
        assert float(got[k]) == 0.0


def test_losses_are_jittable_and_differentiable():
    import jax

    outputs, targets = make_batch(2)
    j_tgt = {k: jnp.asarray(v) for k, v in targets.items()}

    def total(outs):
        return compute_losses(outs, j_tgt, LossWeights())["loss_overall"]

    g = jax.jit(jax.grad(total))({k: jnp.asarray(v) for k, v in outputs.items()})
    for k in ("pred_spans", "pred_logits", "vid_mem_proj", "txt_mem_proj"):
        assert np.isfinite(np.asarray(g[k])).all(), k


def test_saturated_probs_have_finite_grads():
    """sigmoid saturation to exactly 0/1 must not NaN the backward pass
    (caught at flagship scale on TPU: losses finite, grad_norm NaN)."""
    import jax

    outputs, targets = make_batch(0)
    j_tgt = {k: jnp.asarray(v) for k, v in targets.items()}

    probs = np.asarray(outputs["pred_logits"]).copy()
    probs[0, :5] = 0.0  # exact saturation
    probs[1, :5] = 1.0
    outputs = dict(outputs, pred_logits=probs)

    def total(outs):
        return compute_losses(outs, j_tgt, LossWeights())["loss_overall"]

    loss = total({k: jnp.asarray(v) for k, v in outputs.items()})
    assert np.isfinite(float(loss))
    g = jax.grad(total)({k: jnp.asarray(v) for k, v in outputs.items()})
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
