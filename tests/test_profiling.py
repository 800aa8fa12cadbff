"""Profiling/observability utilities."""
import time

from univtg_tpu.utils.profiling import Meter, PhaseTimers, device_trace
from univtg_tpu.utils.tb import TBWriter


def test_meter():
    m = Meter()
    for v in (1.0, 3.0, 2.0):
        m.update(v)
    assert m.avg == 2.0 and m.min == 1.0 and m.max == 3.0 and m.count == 3
    assert m.summary()["n"] == 3


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["n"] == 2 and s["b"]["n"] == 1
    assert s["a"]["max"] >= 0.01


def test_device_trace_noop():
    with device_trace(None):
        pass  # no-op path


def test_device_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found  # some trace artifact exists


def test_tb_writer_disabled():
    w = TBWriter(None)
    assert not w.active
    w.scalars({"x": 1.0}, 0)  # no-op
    w.close()
