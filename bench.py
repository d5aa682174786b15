"""Benchmark: humanoid MPPI replan throughput on real TPU hardware.

Primary metric (BASELINE.json): MPPI rollouts/sec/chip at K=8192, H=64 on
the humanoid model, with replan latency against the real-time budget of one
action per 5 ms sim step (reference src/humanoid.xml timestep; the reference
CPU implementation performs K*T = 5,000 sequential mj_steps per control step
and runs far slower than real time, unmeasured — SURVEY.md §6).

vs_baseline = real-time factor = (5 ms sim step) / (replan wall-clock):
> 1.0 means the controller replans faster than the plant advances.

Prints exactly one JSON line at the end.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    K = int(os.environ.get("BENCH_K", "8192"))
    H = int(os.environ.get("BENCH_H", "64"))
    task = os.environ.get("BENCH_TASK", "humanoid_collect")
    iters = int(os.environ.get("BENCH_ITERS", "30"))

    import jax
    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    cache_dir = enable_persistent_cache()

    from humanoid_mppi_rl_tpu.envs.tasks import load_task
    from humanoid_mppi_rl_tpu.ops.kernel_costs import KERNEL_COSTS
    from humanoid_mppi_rl_tpu.solver.kernel_mppi import make_kernel_mppi
    from humanoid_mppi_rl_tpu.solver.mppi import MPPIState, make_mppi

    spec, model, dynamics, running, terminal, init_state, cfg = load_task(task)
    cfg = dataclasses.replace(cfg, n_samples=K, horizon=H)
    # f32 on device
    init_state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), init_state)

    use_kernel = (os.environ.get("BENCH_KERNEL", "1") == "1"
                  and spec.kernel_cost is not None)
    ms = MPPIState.seeded(0, cfg.T, model.nu)

    # NOTE: the jax.export AOT trace cache (utils/aot_cache.py) is
    # deliberately NOT used here. It does eliminate the ~100-170 s warm
    # trace, but the round-trip costs runtime performance: the restored
    # exported.call measured 102 ms/replan vs 4.2 ms for the directly
    # jitted kernel on the same chip (24x — the deserialized StableHLO
    # recompiles without the donation/layout structure of the original
    # trace). Benchmarked paths take the trace hit and keep the 4 ms
    # replan; see PERF.md "warm-start anatomy".
    if use_kernel:
        fn = make_kernel_mppi(
            model, KERNEL_COSTS[spec.kernel_cost], cfg,
            cost_kwargs=spec.cost_kwargs, block_k=min(1024, K))
    else:
        fn = make_mppi(dynamics, running, cfg, terminal_fn=terminal)
    import jax

    plan = jax.jit(fn)

    t0 = time.perf_counter()
    action, ms, diag = plan(ms, init_state)
    _ = np.asarray(action)  # host fetch: block_until_ready does not reliably
    # block through remote-device tunnels
    compile_s = time.perf_counter() - t0

    # chained timing: each replan consumes the previous MPPIState, so the
    # sequence is serialized on device; one host fetch at the end
    t0 = time.perf_counter()
    for _ in range(iters):
        action, ms, diag = plan(ms, init_state)
    _ = np.asarray(action)
    lat_med = (time.perf_counter() - t0) / iters

    sim_dt = model.timestep  # 0.005 humanoid
    rollouts_per_sec = K / lat_med
    realtime_factor = sim_dt / lat_med

    result = {
        "metric": f"humanoid MPPI rollouts/sec/chip (K={K}, H={H})",
        "value": round(rollouts_per_sec, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(realtime_factor, 4),
        "extra": {
            "replan_latency_ms": round(lat_med * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "compile_cache": cache_dir,
            "device": str(jax.devices()[0]),
            "K": K, "H": H, "task": task,
            "steps_per_sec": round(rollouts_per_sec * H, 1),
            "realtime_budget_ms": sim_dt * 1e3,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
