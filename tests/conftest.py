"""Test harness: force a deterministic 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual devices; the driver separately
dry-runs the real multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override harness presets (e.g. axon TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# persistent compile cache: the suite re-jits many small programs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def qvhl_fixtures():
    """Reference-shipped QVHighlights val predictions + GT (plot/qvhl/)."""
    import json

    def load(path):
        with open(path) as f:
            return [json.loads(line) for line in f]

    gt = load(os.path.join(REFERENCE, "plot/qvhl/gt.jsonl"))
    pred = load(os.path.join(REFERENCE, "plot/qvhl/univtg.jsonl"))
    return pred, gt
