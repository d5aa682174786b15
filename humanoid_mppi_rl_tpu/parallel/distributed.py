"""Multi-host runtime entry: jax.distributed wiring for pod slices.

The reference has no distributed backend at all (SURVEY.md §2.4: its only
parallelism is CPU threads on one machine; run.sh is 150 *sequential*
processes). The TPU-native scale-out story is:

- **one process per host**, all chips of the slice visible after
  `jax.distributed.initialize` — then the SAME `parallel.mesh` code paths
  (shard_map over the `k` axis, psum/pmin reductions riding ICI within a
  slice and DCN across slices) span hosts with zero code changes;
- **episode sharding across hosts** for data collection
  (`collect.runner shard_index/num_shards`) — embarrassingly parallel,
  no collectives.

`maybe_initialize()` is called from every entry point (CLI, bench); it is a
no-op unless the standard launcher environment is present, so single-host
runs (and the CI virtual-device mesh) are untouched.

Env contract (set by the launcher, e.g. GKE/xpk or a manual mpirun):
  HUMANOID_MPPI_COORDINATOR   "host:port" of process 0
  HUMANOID_MPPI_NUM_PROCESSES total process count
  HUMANOID_MPPI_PROCESS_ID    this process's rank
On TPU pods created through standard tooling, `jax.distributed.initialize()`
can also auto-detect everything; setting HUMANOID_MPPI_AUTO_DISTRIBUTED=1
opts into that path.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed from env vars if configured; else no-op.

    Returns True when running multi-process after this call."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1

    coord = os.environ.get("HUMANOID_MPPI_COORDINATOR")
    auto = os.environ.get("HUMANOID_MPPI_AUTO_DISTRIBUTED") == "1"
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["HUMANOID_MPPI_NUM_PROCESSES"]),
            process_id=int(os.environ["HUMANOID_MPPI_PROCESS_ID"]),
        )
        _initialized = True
    elif auto:
        jax.distributed.initialize()  # TPU-pod metadata auto-detection
        _initialized = True
    return _initialized and jax.process_count() > 1


def process_info() -> dict:
    """Rank/topology snapshot for logs and episode sharding."""
    import jax

    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def episode_shard(n_episodes: int,
                  shard_index: Optional[int] = None,
                  num_shards: Optional[int] = None) -> range:
    """Which episodes this process owns: the multi-host replacement for the
    reference's 150-sequential-runs run.sh (src/run.sh:6-19). Defaults to
    the jax.distributed rank/size; explicit args override (single-host CLI
    sharding keeps working unchanged)."""
    import jax

    idx = jax.process_index() if shard_index is None else shard_index
    n = jax.process_count() if num_shards is None else num_shards
    return range(idx, n_episodes, n)
