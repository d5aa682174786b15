"""Persistent XLA compilation cache.

The humanoid mega-kernel replan costs minutes to compile cold (BENCH_r01:
603.8 s on a v5e chip through the axon tunnel); the reference has no
equivalent cost because MuJoCo is precompiled C. JAX can persist compiled
executables keyed by HLO fingerprint, making every warm start ~free — but
nothing enables it by default. Call enable_persistent_cache() before the
first jit in every entry point (bench.py, cli.main, __graft_entry__).

Env overrides:
  HUMANOID_MPPI_CACHE_DIR   cache location (default ~/.cache/humanoid_mppi_xla)
  HUMANOID_MPPI_NO_CACHE=1  disable entirely
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "humanoid_mppi_xla")

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently point jax at an on-disk compilation cache.

    Returns the cache dir, or None if disabled. Safe to call before or after
    jax initialization (the config keys take effect at the next compile)."""
    global _enabled
    if os.environ.get("HUMANOID_MPPI_NO_CACHE") == "1":
        return None
    cache_dir = (path or os.environ.get("HUMANOID_MPPI_CACHE_DIR")
                 or _DEFAULT_DIR)
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default min compile time is 1s; keep it but cache every entry size
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:  # older jax: names absent, defaults are fine
        pass
    _enabled = True
    return cache_dir
