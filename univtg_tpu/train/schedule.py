"""Learning-rate schedules (epoch-granular, matching the reference).

The reference steps its scheduler once per epoch (main/train_mr.py loop);
optax schedules are per-step, so every schedule takes `steps_per_epoch` and
quantizes. `warmup_step_lr` reproduces WarmupStepLR (main/config.py:309-335):
linear per-epoch warmup to base, then gamma decay at every multiple of
`lr_drop` epochs past warmup.
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_step_lr(base_lr, warmup_epochs, lr_drop, gamma, steps_per_epoch):
    warmup_epochs = int(warmup_epochs)

    def sched(step):
        epoch = step // steps_per_epoch
        warm = base_lr * (epoch + 1) / max(warmup_epochs, 1)
        decays = jnp.maximum(0, epoch // lr_drop - warmup_epochs // lr_drop)
        decayed = base_lr * gamma**decays
        return jnp.where(epoch < warmup_epochs, warm, decayed)

    return sched


def constant_with_warmup(base_lr, warmup_epochs, steps_per_epoch):
    def sched(step):
        epoch = step // steps_per_epoch
        return base_lr * jnp.minimum(1.0, (epoch + 1) / max(int(warmup_epochs), 1))

    return sched


def step_lr(base_lr, lr_drop, gamma, steps_per_epoch):
    def sched(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** (epoch // lr_drop)

    return sched


def build_schedule(lr, lr_warmup, lr_drop, lr_gamma, steps_per_epoch):
    """Scheduler selection mirroring setup_model (main/config.py:352-360)."""
    if lr_warmup > 0 and lr_drop > 0:
        return warmup_step_lr(lr, lr_warmup, lr_drop, lr_gamma, steps_per_epoch)
    if lr_warmup > 0:
        return constant_with_warmup(lr, lr_warmup, steps_per_epoch)
    if lr_drop > 0:
        return step_lr(lr, lr_drop, lr_gamma, steps_per_epoch)
    return lambda step: lr
