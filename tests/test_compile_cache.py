"""Persistent XLA compilation cache (univtg_tpu/utils/compile_cache.py)."""
import os
import subprocess
import sys

CHILD = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from univtg_tpu.utils.compile_cache import enable_compilation_cache
path = enable_compilation_cache(sys.argv[2])
assert path == sys.argv[2], path
# force even fast compiles into the cache so the test is cheap
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np
f = jax.jit(lambda x: jnp.sin(x) @ x.T + float(sys.argv[3]))
out = f(jnp.ones((64, 64)))
assert np.isfinite(float(out.sum()))
print("CHILD_OK")
"""


def _run_child(repo, cache_dir, salt):
    return subprocess.run(
        [sys.executable, "-c", CHILD, repo, cache_dir, salt],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def test_cache_entries_written_and_reused(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = str(tmp_path / "xla_cache")

    r1 = _run_child(repo, cache_dir, "7.5")
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "CHILD_OK" in r1.stdout
    entries = os.listdir(cache_dir)
    assert entries, "no cache entries written"

    # second process, same program -> same entry set (hit, no new writes)
    r2 = _run_child(repo, cache_dir, "7.5")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert sorted(os.listdir(cache_dir)) == sorted(entries)

    # different constant -> different HLO -> new entry (key really covers HLO)
    r3 = _run_child(repo, cache_dir, "8.5")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert len(os.listdir(cache_dir)) > len(entries)


def test_disabled_on_tunneled_backend(tmp_path):
    """On the axon remote-compile tunnel the cache never reloads (measured);
    enable_compilation_cache must no-op there."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import os, sys; sys.path.insert(0, sys.argv[1]);"
        "os.environ['PALLAS_AXON_POOL_IPS'] = '10.0.0.1';"
        "os.environ['JAX_PLATFORMS'] = 'axon';"
        "from univtg_tpu.utils.compile_cache import enable_compilation_cache;"
        "assert enable_compilation_cache(sys.argv[2]) is None;"
        "print('GUARD_OK')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, repo, str(tmp_path / "nocache")],
        capture_output=True,
        text=True,
        timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "GUARD_OK" in r.stdout
    assert not os.path.exists(str(tmp_path / "nocache"))


def test_explicit_dir_wins_and_is_idempotent(tmp_path):
    # in-process: explicit argument must override and report back
    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        from univtg_tpu.utils.compile_cache import enable_compilation_cache

        d1 = str(tmp_path / "a")
        assert enable_compilation_cache(d1) == d1
        # no-arg call now keeps the configured dir
        assert enable_compilation_cache() == d1
        # explicit new dir still wins
        d2 = str(tmp_path / "b")
        assert enable_compilation_cache(d2) == d2
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
