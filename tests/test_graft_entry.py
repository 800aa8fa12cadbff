"""Driver entry points: entry() compiles and dryrun_multichip bootstraps a
virtual mesh even when the parent process sees too few devices (the exact
environment the driver runs it in: JAX_PLATFORMS=axon, one real chip).

Reference capability mirrored: multi-GPU DDP pretraining
(/root/reference/main/train_vlp_ddp.py:215-275).
"""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert set(out) >= {"pred_logits", "pred_spans", "saliency_scores"}
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))


def test_dryrun_multichip_inline():
    # conftest pins an 8-device virtual CPU mesh, so this runs in-process
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_one_device():
    """Simulate the driver: a parent that sees ONE device must re-exec the
    dryrun on a virtual CPU mesh and succeed (round-1 MULTICHIP failure)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("_UNIVTG_DRYRUN_CHILD", None)
    # the bootstrap re-exec is what's under test; phase 1 alone proves it
    # (the flagship/pipeline/moe phases run in the inline test above and
    # would push this subprocess past its timeout on a contended host)
    env["UNIVTG_DRYRUN_PHASES"] = "1"
    code = (
        "import os, sys; sys.path.insert(0, sys.argv[1]); "
        "os.environ['JAX_PLATFORMS'] = 'cpu'; "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, REPO],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
