"""pin_platform_from_env precedence (utils/compile_cache.py).

On hosts with an interpreter-start PJRT plugin (tunneled TPU pools), the
plugin overwrites jax's platform config (observed: 'axon,cpu') for ANY
JAX_PLATFORMS env value. The helper's contract, pinned here in fresh
subprocesses:

  1. env var beats the plugin's ambient multi-platform pin,
  2. an explicit single-platform in-process pin beats the env var,
  3. unset env var is a no-op.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(body: str, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", body],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


BODY = """
import jax
{pre}
from univtg_tpu.utils.compile_cache import pin_platform_from_env
pin_platform_from_env()
print("RESULT:", jax.config.jax_platforms)
"""


def test_env_var_beats_ambient_plugin_pin():
    line = _run(BODY.format(pre=""), {"JAX_PLATFORMS": "cpu"})
    assert line == "RESULT: cpu"


def test_explicit_inprocess_pin_beats_env_var():
    line = _run(
        BODY.format(pre="jax.config.update('jax_platforms', 'cpu')"),
        {"JAX_PLATFORMS": "definitely_not_cpu"},
    )
    assert line == "RESULT: cpu"


def test_unset_env_is_noop():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c",
         BODY.format(pre="jax.config.update('jax_platforms', 'cpu')")],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "RESULT: cpu"
