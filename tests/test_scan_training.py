"""Scan-based multi-step training: one dispatch for K steps must match K
individual dispatches exactly."""
import numpy as np
import jax
import optax

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.train.steps import (
    init_state,
    make_scan_train_step,
    make_train_step,
    stack_batches,
)

from tests.test_spmd_equivalence import make_batch


def test_scan_matches_sequential():
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=48, num_layers=1, num_heads=4,
        ffn_dim=64, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6,
    )
    model = UniVTG(cfg)
    optimizer = optax.sgd(1e-2)
    weights = LossWeights()
    rng = jax.random.PRNGKey(1)

    batches = []
    for i in range(4):
        mi, tg = make_batch(B=4, seed=i)
        batches.append({"model_inputs": mi, "targets": tg, "meta": []})

    # sequential
    state_a = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, weights, donate=False)
    seq_losses = []
    for b in batches:
        state_a, m = step(state_a, b["model_inputs"], b["targets"], rng)
        seq_losses.append(float(m["loss_overall"]))

    # scanned
    state_b = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    scan_step = make_scan_train_step(model, optimizer, weights)
    smi, stg = stack_batches(batches)
    state_b, metrics = scan_step(state_b, smi, stg, rng)
    scan_losses = np.asarray(metrics["loss_overall"]).tolist()

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
