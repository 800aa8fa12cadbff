"""Shared micro-benchmark harness for the flagship training step.

One definition of the anti-memoization measurement chain, used by both
bench.py and scripts/roofline.py so the two cannot drift:

  * iterations chain inside ONE fori_loop program through a data-dependent
    carry (seed perturbs the inputs; each step consumes the previous step's
    params), so a memoizing runtime cannot dedupe or overlap them;
  * the loss folds into the fetched scalar, so no branch is dead code;
  * state/inputs/targets pass through jit as ARGUMENTS -- captured
    constants are embedded in remote-compile requests, which tunnels
    reject past ~256 MB (HTTP 413).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.models.losses import LossWeights, compute_losses
from univtg_tpu.train.steps import forward


def flagship_train_batch(B: int, cfg, Lv: int = 75, Lt: int = 32):
    """Synthetic device-resident (model_inputs, targets) at a given shape."""
    rng = np.random.default_rng(0)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2))
    window = np.zeros((B, Lv), np.float32)
    window[:, Lv // 8 : Lv // 2] = 1
    nn_sp = np.zeros((B, Lv, 2), np.float32)
    nn_sp[:, :, 0], nn_sp[:, :, 1] = 1 / 8, 1 / 2
    mi = {
        "src_txt": jnp.asarray(rng.standard_normal((B, Lt, cfg.txt_dim)), jnp.float32),
        "src_txt_mask": jnp.ones((B, Lt), jnp.float32),
        "src_vid": jnp.asarray(rng.standard_normal((B, Lv, cfg.vid_dim)), jnp.float32),
        "src_vid_mask": jnp.ones((B, Lv), jnp.float32),
    }
    tg = {
        "timestamp": jnp.asarray(ts, jnp.float32),
        "timestamp_mask": jnp.ones((B, Lv), jnp.float32),
        "timestamp_window": jnp.asarray(window),
        "span_labels_nn": jnp.asarray(nn_sp),
        "saliency_scores": jnp.asarray(rng.uniform(0, 1, (B, Lv)), jnp.float32),
        "saliency_pos_labels": np.full((B, 1), Lv // 4, np.int32),
    }
    return mi, tg


def make_chained_train(model, optimizer, weights: LossWeights | None = None):
    """Jitted (state, mi, tg, seed, n[static]) -> carry scalar running n
    chained full training steps (fwd + losses + bwd + AdamW + clip)."""
    import optax

    weights = weights or LossWeights()

    def one_step(state, mi, tg, seedlike):
        mi2 = dict(mi)
        mi2["src_vid"] = mi["src_vid"] + seedlike * 1e-6
        from univtg_tpu.train.steps import step_dropout_rngs

        drop_rng, path_rng = step_dropout_rngs(
            jax.random.PRNGKey(7), state.step
        )

        def loss_fn(params):
            outputs = forward(
                model, params, mi2, train=True,
                rngs={"dropout": drop_rng, "droppath": path_rng},
            )
            ld = compute_losses(outputs, tg, weights, ("spans", "labels", "saliency"))
            return ld["loss_overall"], ld

        (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            ld,
        )

    def chained(state, mi, tg, seed, n):
        def body(i, carry):
            st, s = carry
            st, ld = one_step(st, mi, tg, s)
            return (st, ld["loss_overall"].astype(jnp.float32) * 1e-9 + s)

        return jax.lax.fori_loop(0, n, body, (state, seed))[1]

    return jax.jit(chained, static_argnums=4)


def time_chained_train(model, cfg, optimizer, B: int, n_iters: int,
                       Lv: int = 75, Lt: int = 32, trials: int = 3):
    """Compile + warm + time n_iters chained steps; returns
    (clips_per_sec, ms_per_step) from the BEST of ``trials`` timed windows.

    Best-of-N because the timed window is only ~1 s of device work behind a
    shared tunnel: a transient stall in one window under-reports by 20%+
    (observed: 74.7 vs the true 61.3 ms/step in back-to-back runs), and
    the driver's recorded number must not inherit that noise. Each trial
    gets a distinct seed so a memoizing runtime cannot replay."""
    import time

    from univtg_tpu.train.steps import init_state

    state0 = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    mi, tg = flagship_train_batch(B, cfg, Lv=Lv, Lt=Lt)
    run = make_chained_train(model, optimizer)
    float(np.asarray(run(state0, mi, tg, jnp.float32(-1.0), n_iters)))  # warm
    best_dt = np.inf
    for trial in range(max(1, trials)):
        t0 = time.perf_counter()
        r = float(np.asarray(run(state0, mi, tg, jnp.float32(trial), n_iters)))
        best_dt = min(best_dt, time.perf_counter() - t0)
        assert np.isfinite(r)
    return B * Lv * n_iters / best_dt, best_dt / n_iters * 1e3
