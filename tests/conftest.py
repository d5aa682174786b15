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

# NO persistent compilation cache in tests: XLA:CPU AOT cache entries can
# load with mismatched machine-feature sets (cpu_aot_loader warnings) and
# produce instruction mixes with different float rounding — enough to flip
# the 1e-9 matched-noise parity assertions. CPU test compiles are
# tracing-dominated anyway (~15% cache win measured). The cache stays on
# for the TPU entry points (bench/CLI/graft).
os.environ["HUMANOID_MPPI_NO_CACHE"] = "1"
