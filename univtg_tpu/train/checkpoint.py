"""Checkpointing: best/latest/periodic triple + config json round-trip.

Mirrors the reference's artifact contract (main/train_mr.py:149-187: a dict
checkpoint {model, optimizer, epoch, opt} as model_best.ckpt /
model_latest.ckpt / model_eNNNN.ckpt, opt.json alongside) using flax
msgpack serialization of the param/optimizer pytrees.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epoch: int, config_json: Optional[str] = None):
    blob = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(blob))
    if config_json is not None:
        with open(os.path.join(os.path.dirname(path) or ".", "opt.json"), "w") as f:
            f.write(config_json)


def restore_checkpoint(path: str, state):
    """Full restore (the reference's --resume_all: weights + optimizer +
    epoch, main/config.py:370-374)."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(_to_host(state.params), raw["params"])
    opt_state = serialization.from_state_dict(_to_host(state.opt_state), raw["opt_state"])
    new_state = state.replace(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(raw["step"], jnp.int32),
    )
    return new_state, int(raw["epoch"])


def restore_params(path: str, params_template):
    """Weights-only restore (the reference's --resume without --resume_all)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "params" in raw:
        raw = raw["params"]
    return serialization.from_state_dict(_to_host(params_template), raw)
