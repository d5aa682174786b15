"""Test config: force CPU with a virtual 8-device mesh (the standard JAX trick
substituting for multi-chip TPU hardware in CI — SURVEY.md §4) and enable f64
so the engine can be validated against MuJoCo's double-precision oracle."""

import os

# hard-set (the container's sitecustomize exports JAX_PLATFORMS=axon — the
# real-TPU tunnel — which would make every eager test op a network round-trip)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# the sitecustomize may have imported jax and registered the axon backend
# BEFORE this conftest ran, in which case the env var above is too late —
# the config update still wins as long as no computation has run yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeat suite runs skip recompiles
from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
