"""Persistent XLA compilation cache.

Every univtg_tpu entry point (CLI, bench, driver hooks) compiles the same
handful of large programs -- the flagship train step alone takes minutes to
build on small hosts, and the reference pays the equivalent CUDA warmup on
every process start. XLA can serialize compiled executables to disk and
reload them across processes; this module turns that on with sane defaults.

The cache key covers the HLO, compile options, and backend version, so
stale entries are never reused after a jax/libtpu upgrade -- the directory
is safe to keep around indefinitely (entries are content-addressed files;
delete the directory to reclaim space).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/univtg_tpu/xla")


def pin_platform_from_env() -> None:
    """Honor JAX_PLATFORMS in-process. On hosts where a PJRT plugin
    registers itself at interpreter start (tunneled TPU pools), the plugin
    overwrites jax's platform config (e.g. to "axon,cpu") so the env var
    alone never sticks — re-applying it via jax.config does. Precedence:
    an explicit single-platform pin made in-process (a caller did
    jax.config.update('jax_platforms', 'cpu') before invoking us) wins
    over the env var; the plugin's ambient multi-platform selection does
    not. No-op when the env var is unset. Call before first device use."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    cur = jax.config.jax_platforms or ""
    cur_list = [p.strip() for p in cur.split(",") if p.strip()]
    if len(cur_list) == 1 and cur_list != [env]:
        return  # deliberate in-process pin — don't clobber it
    if cur != env:
        jax.config.update("jax_platforms", env)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache (idempotent).

    Precedence: an explicit `cache_dir` argument > whatever is already
    configured (the JAX_COMPILATION_CACHE_DIR env var or an earlier call) >
    the default ~/.cache/univtg_tpu/xla. Returns the active directory, or
    None if jax is too old to support the flags (the call is then a no-op,
    never an error -- caching is an optimization, not a requirement).
    """
    import jax

    # Tunneled/remote-compile PJRT backends (axon) compile through a relay
    # service that cannot reload serialized executables -- entries get
    # written but never hit (measured: identical cold-compile time with and
    # without the cache). Skip there; CPU and directly-attached TPU reload
    # fine.
    platforms = {
        p.strip().lower()
        for p in os.environ.get("JAX_PLATFORMS", "").split(",")
        if p.strip()
    }
    if os.environ.get("PALLAS_AXON_POOL_IPS") and platforms != {"cpu"}:
        return None

    try:
        current = jax.config.jax_compilation_cache_dir
        if cache_dir is None and current:
            return current  # env var or earlier call already configured it
        path = cache_dir or _DEFAULT_DIR
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min compile time is 1s; programs here are either trivial
        # (not worth caching) or minutes-long (absolutely worth it)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:  # pragma: no cover - jax without cache support
        return None
