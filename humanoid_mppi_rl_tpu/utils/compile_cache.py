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


def schema_fingerprint() -> str:
    """Stable fingerprint of the program-shaping dataclass schemas.

    The XLA persistent cache is keyed by HLO, so ANY field added to
    PhysicsModel / PhysicsState / MPPIState changes the traced program and
    silently invalidates every cached executable — round 4 observed this as
    an unexplained 332.8 s "regression" after a model-schema commit
    (PERF.md, VERDICT r4 weak-7). This fingerprint makes the invalidation
    *visible*: bench.py records it in the cache dir and reports
    `schema_changed` whenever the current schema differs from the one the
    cache was last warmed for."""
    import hashlib

    parts = []
    try:
        import dataclasses as _dc

        from ..physics.engine import PhysicsState
        from ..physics.model import PhysicsModel
        from ..solver.mppi import MPPIConfig, MPPIState

        for cls in (PhysicsModel, PhysicsState, MPPIConfig, MPPIState):
            names = [f.name for f in _dc.fields(cls)]
            parts.append(f"{cls.__name__}:{','.join(names)}")
    except Exception as e:  # never break a bench over fingerprinting
        parts.append(f"error:{type(e).__name__}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def check_schema_marker(cache_dir: str | None) -> dict:
    """Compare the current schema fingerprint with the cache's marker file,
    update the marker, and report {schema_fingerprint, schema_changed}.
    schema_changed=True means the next compile of any program touching these
    dataclasses is expected to be a cold (cache-miss) compile."""
    fp = schema_fingerprint()
    out = {"schema_fingerprint": fp, "schema_changed": False}
    if not cache_dir:
        return out
    marker = os.path.join(cache_dir, "SCHEMA_FINGERPRINT")
    try:
        old = open(marker).read().strip() if os.path.exists(marker) else None
        out["schema_changed"] = old is not None and old != fp
        if old is None:
            out["schema_changed"] = True  # cold cache dir: expect a miss
        with open(marker, "w") as f:
            f.write(fp)
    except OSError:
        pass
    return out


def count_cache_entries(cache_dir: str | None) -> int:
    """Number of cached executables (files) under the cache dir; used by
    bench.py to detect whether a compile actually hit the persistent cache
    (entry count unchanged) or missed (new entries written)."""
    if not cache_dir or not os.path.isdir(cache_dir):
        return 0
    n = 0
    for _root, _dirs, files in os.walk(cache_dir):
        n += sum(1 for f in files if f != "SCHEMA_FINGERPRINT")
    return n
