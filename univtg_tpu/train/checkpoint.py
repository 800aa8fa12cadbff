"""Checkpointing: best/latest/periodic triple + config json round-trip.

Mirrors the reference's artifact contract (main/train_mr.py:149-187: a dict
checkpoint {model, optimizer, epoch, opt} as model_best.ckpt /
model_latest.ckpt / model_eNNNN.ckpt, opt.json alongside) using flax
msgpack serialization of the param/optimizer pytrees.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _host_blob(state, epoch: int) -> dict:
    """Synchronous device->host fetch. Must complete before a donating train
    step reuses the parameter buffers."""
    return {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }


def _write_blob(path: str, blob: dict, config_json: Optional[str]):
    """Serialize + write-to-temp + atomic rename: a crash mid-write (or a
    killed gang member, tests/test_multiprocess.py fault injection) can
    never leave a truncated model_latest.ckpt for resume='auto' to trip
    over."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(blob))
    os.replace(tmp, path)
    if config_json is not None:
        with open(os.path.join(os.path.dirname(path) or ".", "opt.json"), "w") as f:
            f.write(config_json)


def save_checkpoint(path: str, state, epoch: int, config_json: Optional[str] = None):
    _write_blob(path, _host_blob(state, epoch), config_json)


class AsyncCheckpointer:
    """Overlap checkpoint serialization + disk IO with training.

    ``save()`` fetches the state to host numpy synchronously (the part that
    must finish before the next donated train step reuses the buffers), then
    hands the msgpack serialization and file write to a background thread —
    the device keeps training while ~4x-model-size bytes hit the disk. At
    most one write is in flight: a new save joins the previous one first, so
    the latest -> best write order within an epoch is preserved. Call
    ``wait()`` before reading the files back or returning to the caller;
    writer errors re-raise on the next save()/wait().
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, state, epoch: int, config_json: Optional[str] = None):
        self.wait()
        blob = _host_blob(state, epoch)
        def _write():
            try:
                _write_blob(path, blob, config_json)
            except BaseException as e:  # surfaced by the next save()/wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err


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
