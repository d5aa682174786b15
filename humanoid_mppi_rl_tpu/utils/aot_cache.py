"""Persistent AOT trace cache via jax.export — kills the warm-start TRACE
floor.

The persistent XLA compile cache (compile_cache.py) eliminates
recompilation, but every new process still pays Python tracing + lowering
of the rollout mega-kernel (~115-168 s on the 2-core host: the scalar
physics step is a fully unrolled per-dof graph, BENCH_r02). jax.export
serializes the lowered StableHLO (including Mosaic TPU kernels, which ride
along as custom calls); deserialization is proto parsing (~ms), and the
XLA compile of the restored module hits the persistent compile cache. Net:
warm start ~= deserialize + cache-hit compile, no tracing.

Cache entries are keyed by a caller-supplied config string plus the jax
version, platform set, and x64 flag; anything that changes the traced
graph (model file, K/H/T, block_k, cost variant, dtype) must be in the
caller's key — make_key() hashes it all.

Usage:
    plan = aot_cached(make_kernel_mppi(...), make_key(model=..., K=K, ...),
                      ms_example, state_example)
    action, ms, diag = plan(ms, state)

Falls back to plain jax.jit on any export/deserialize failure (the cache
is an optimization, never a correctness dependency).

PERFORMANCE CAVEAT (measured, r3): restoring through jax.export costs
steady-state throughput on the TPU backend — the mega-kernel replan ran
at 102 ms via exported.call vs 4.2 ms directly jitted (the deserialized
module recompiles without the original trace's donation/layout
structure). Use this cache for cold-start latency of NON-hot-path
tooling only; benchmarked/production paths should pay the trace
(bench.py does).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "humanoid_mppi_aot")


def _cache_dir() -> str:
    return os.environ.get("HUMANOID_MPPI_AOT_DIR", _DEFAULT_DIR)


def make_key(**parts) -> str:
    """Stable hash of everything that shapes the traced graph."""
    import jax

    payload = [f"jax={jax.__version__}"]
    for k in sorted(parts):
        v = parts[k]
        if isinstance(v, (bytes, bytearray)):
            v = hashlib.sha256(v).hexdigest()
        payload.append(f"{k}={v!r}")
    try:
        payload.append(f"x64={jax.config.jax_enable_x64}")
        payload.append(f"plat={jax.default_backend()}")
    except Exception:
        pass
    return hashlib.sha256("|".join(payload).encode()).hexdigest()[:32]


def file_fingerprint(path: str) -> str:
    """Content hash of a file (e.g. the MJCF asset) for make_key."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read())
    return h.hexdigest()[:16]


_registered = False


def _register_pytree_serialization():
    """jax.export refuses custom pytree node types unless they are
    registered for serialization; register every struct that crosses an
    exported function boundary (plan signature: (MPPIState, PhysicsState /
    GaitFDState) -> (action, MPPIState, MPPIDiagnostics)). Aux data is
    pickled verbatim (it is () for these flax structs)."""
    global _registered
    if _registered:
        return
    import pickle

    import jax

    from ..costs.humanoid import GaitFDState
    from ..physics.engine import PhysicsState
    from ..solver.mppi import MPPIDiagnostics, MPPIState

    for cls in (MPPIState, MPPIDiagnostics, PhysicsState, GaitFDState):
        try:
            jax.export.register_pytree_node_serialization(
                cls,
                serialized_name=f"humanoid_mppi_rl_tpu::{cls.__name__}",
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads,
            )
        except Exception:
            pass  # already registered (idempotent across aot_cached calls)
    _registered = True


def aot_cached(fn, key: str, *example_args, enabled: bool | None = None):
    """jit(fn), with the traced+lowered artifact persisted under `key`.

    On a warm start the function is restored from disk without tracing.
    Returns a callable with the same signature as fn."""
    import jax

    if enabled is None:
        enabled = os.environ.get("HUMANOID_MPPI_NO_CACHE") != "1"
    if not enabled:
        return jax.jit(fn)
    _register_pytree_serialization()

    path = os.path.join(_cache_dir(), key + ".jaxexport")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            return jax.jit(exported.call)
        except Exception:
            pass  # stale/corrupt entry: fall through to re-export

    jitted = jax.jit(fn)
    try:
        exported = jax.export.export(jitted)(*example_args)
        data = exported.serialize()
        os.makedirs(_cache_dir(), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=_cache_dir(), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic under concurrent writers
        return jax.jit(exported.call)
    except Exception:
        return jitted
