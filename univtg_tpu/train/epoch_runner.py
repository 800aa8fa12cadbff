"""Shared training-epoch runtime for all task drivers.

One implementation of the hot-loop machinery that was previously exclusive
to the MR/VLP driver (VERDICT r4 item 8: the HL/QFVS loops were
second-class):

  * ``strip_meta`` -- host-side transfer casting: int8 quantization
    (data/collate.quantize_for_transfer, dequantized inside the jitted
    step) or bf16 casts of the feature tensors, cutting host->device
    transfer bytes 4x/2x on the tunnel-limited hosts this runs on;
  * ``run_train_epoch`` -- the plain per-batch loop with optional
    background prefetch double-buffering (data/prefetch.device_prefetch:
    batch N+1 is cast + device_put while the device runs step N);
  * ``StepProfiler`` -- the profile_dir/profile_steps XProf window with
    the async-dispatch barrier (stopping the trace without blocking on the
    in-flight steps would record dispatch gaps instead of device work).

The MR driver's scan_steps path (K steps per dispatch) stays in
driver_mr.py -- it needs batch stacking and bucket-aware flushing that no
other driver uses.
"""
from __future__ import annotations

import logging

import jax
import numpy as np

from univtg_tpu.parallel import shard_batch

logger = logging.getLogger(__name__)


def strip_meta(batch, transfer_dtype: str = "float32"):
    """(model_inputs, targets) with the feature tensors cast for transfer.

    transfer_dtype='int8' swaps src_txt/src_vid for (q, scale) int8 pairs
    (the jitted step dequantizes on device, train/steps.dequantize_inputs);
    any other non-float32 value casts them via ml_dtypes (e.g. 'bfloat16')."""
    mi = batch["model_inputs"]
    if transfer_dtype == "int8":
        from univtg_tpu.data.collate import quantize_for_transfer

        mi = quantize_for_transfer(mi)
    elif transfer_dtype != "float32":
        import ml_dtypes

        dt = np.dtype(getattr(ml_dtypes, transfer_dtype, transfer_dtype))
        mi = {
            k: (v.astype(dt) if k in ("src_txt", "src_vid") else v)
            for k, v in mi.items()
        }
    return mi, batch["targets"]


class StepProfiler:
    """XProf device-trace window over the first ``profile_steps`` steps.

    start() opens the trace (no-op when profile_dir is empty or enabled is
    False -- e.g. non-zero ranks); after_step() closes it once enough steps
    have been DISPATCHED, first blocking on the last metrics so the trace
    captures the device actually executing them; stop() force-closes at
    epoch end for short epochs."""

    def __init__(self, profile_dir: str, profile_steps: int = 5,
                 enabled: bool = True):
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self.enabled = bool(profile_dir) and profile_steps > 0 and enabled
        self._active = False

    def start(self):
        if self.enabled and not self._active:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True

    def after_step(self, n_steps: int, metrics):
        if self._active and n_steps >= self.profile_steps:
            jax.block_until_ready(metrics)
            self.stop()

    def stop(self):
        if self._active:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {self.profile_dir}")
            self._active = False
            self.enabled = False  # one window per run


def run_train_epoch(loader, train_step, state, rng, mesh, *,
                    transfer_dtype: str = "float32", prefetch_depth: int = 0,
                    record=None):
    """One epoch of the plain (one-batch-per-dispatch) hot loop.

    Args:
      loader: iterable of {"model_inputs", "targets", ...} batches.
      train_step: jitted (state, mi, tg, rng) -> (state, metrics).
      record: optional callback(metrics) per step (metric aggregation,
        profiler hooks -- whatever the driver wants).
      prefetch_depth > 0: cast + shard + device_put of batch N+1 runs in a
        background thread while the device executes step N.
    Returns (state, n_steps).
    """
    n_steps = 0
    if prefetch_depth > 0:
        from univtg_tpu.data.prefetch import device_prefetch

        def _prep(batch):
            mi, tg = strip_meta(batch, transfer_dtype)
            return shard_batch(mesh, mi), shard_batch(mesh, tg)

        for mi, tg in device_prefetch(loader, _prep, prefetch_depth):
            state, metrics = train_step(state, mi, tg, rng)
            n_steps += 1
            if record is not None:
                record(metrics)
    else:
        for batch in loader:
            mi, tg = strip_meta(batch, transfer_dtype)
            state, metrics = train_step(
                state, shard_batch(mesh, mi), shard_batch(mesh, tg), rng
            )
            n_steps += 1
            if record is not None:
                record(metrics)
    return state, n_steps
