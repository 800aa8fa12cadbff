"""Device prefetch: overlap host batch prep + host->device transfer with
device compute.

The training loop's per-step critical path is
    collate -> (cast/quantize) -> device_put -> train_step
and on bandwidth-limited hosts the first three dominate (docs/PERF.md
"Training throughput"). JAX dispatch is async, so the device_put of batch
N+1 can proceed while the device executes step N -- but only if the host
issues it early. This wrapper runs the prep+put pipeline in a background
thread with a small bounded queue, the standard TPU input pipeline shape
(flax's prefetch_to_device, but host-transform aware and exception-safe).

Single worker thread => batch order is preserved. Exceptions in the
transform are re-raised at the consumption point.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_SENTINEL = object()


def device_prefetch(
    iterable: Iterable,
    transform: Optional[Callable] = None,
    depth: int = 2,
) -> Iterator:
    """Yield `transform(item)` for each item, computed `depth` items ahead
    in a background thread.

    Args:
      iterable: source batches (e.g. a data Loader).
      transform: host prep + device placement, e.g.
          lambda b: (shard_batch(mesh, mi), shard_batch(mesh, tg)).
          None = identity.
      depth: max batches in flight (2 = classic double buffering).
    """
    if depth <= 0:
        for item in iterable:
            yield transform(item) if transform else item
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that aborts if the consumer went away -- otherwise an
        # abandoned generator (exception in the training step, early break)
        # would leave the worker blocked in q.put forever, pinning `depth`
        # device-resident batches in HBM for the life of the process
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                if not _put(transform(item) if transform else item):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # propagate to the consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True, name="device-prefetch")
    t.start()
    try:
        while True:
            out = q.get()
            if out is _SENTINEL:
                break
            if isinstance(out, BaseException):
                raise out
            yield out
    finally:
        stop.set()
        while not q.empty():  # release buffered batches promptly
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
