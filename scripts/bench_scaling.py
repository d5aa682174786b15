"""Weak/strong-scaling measurement for the mesh-sharded MPPI replan.

BASELINE target: ">=80% weak-scaling efficiency at 2+ hosts; solves/s at
1 chip / 1 host / N hosts". This harness measures replan latency for the
sharded solver across mesh sizes and prints one JSON line per point plus a
summary table.

Modes:
  weak    K = k_per_device * N   (constant work per device; efficiency =
          t(1) / t(N) — flat latency is 100%)
  strong  K = k_total            (fixed problem; efficiency = t(1)/(N*t(N)))

Runs anywhere:
  * a real multi-chip/multi-host platform (jax.distributed auto-wired via
    parallel.distributed.maybe_initialize) — true efficiency numbers;
  * one real TPU chip (mesh sizes capped at 1) — the 1-chip anchor;
  * the CI virtual CPU mesh (--cpu N) — validates mechanics and measures
    the collective/overhead path; virtual devices TIME-SHARE the host's
    cores, so reported "efficiency" there is an honest lower bound, not a
    hardware number (the JSON carries "virtual": true).

Example:
  python scripts/bench_scaling.py --cpu 8 --devices 1 2 4 8 \
      --task cartpole --engine array --k-per-device 512 --horizon 30
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--task", default="humanoid_collect")
    ap.add_argument("--engine", choices=["kernel", "array"], default=None,
                    help="fused Pallas mega-kernel or vmapped array engine "
                         "(default: kernel on TPU, array on CPU)")
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--k-per-device", type=int, default=1024)
    ap.add_argument("--k-total", type=int, default=8192)
    ap.add_argument("--horizon", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--block-k", type=int, default=1024)
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force CPU with N virtual devices")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from humanoid_mppi_rl_tpu.parallel.distributed import (maybe_initialize,
                                                           process_info)
    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache

    maybe_initialize()
    enable_persistent_cache()

    from humanoid_mppi_rl_tpu.envs.tasks import load_task
    from humanoid_mppi_rl_tpu.ops.kernel_costs import KERNEL_COSTS
    from humanoid_mppi_rl_tpu.parallel.mesh import (make_mesh,
                                                    make_sharded_kernel_mppi,
                                                    make_sharded_mppi)
    from humanoid_mppi_rl_tpu.solver.mppi import MPPIState

    virtual = jax.devices()[0].platform == "cpu"
    engine = args.engine or ("array" if virtual else "kernel")
    spec, model, dynamics, running, terminal, init_state, cfg0 = load_task(args.task)
    if args.horizon:
        cfg0 = dataclasses.replace(cfg0, horizon=args.horizon)
    init_state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), init_state)
    avail = len(jax.devices())
    sizes = [n for n in sorted(set(args.devices)) if n <= avail]
    print(json.dumps({"event": "setup", "engine": engine, "task": args.task,
                      "mode": args.mode, "virtual": virtual,
                      **process_info()}), flush=True)

    results = []
    for n in sizes:
        K = args.k_per_device * n if args.mode == "weak" else args.k_total
        if K % n:
            continue
        cfg = dataclasses.replace(cfg0, n_samples=K)
        mesh = make_mesh(n)
        if engine == "kernel":
            plan = make_sharded_kernel_mppi(
                model, KERNEL_COSTS[spec.kernel_cost], cfg, mesh,
                cost_kwargs=spec.cost_kwargs,
                block_k=min(args.block_k, K // n))
        else:
            plan = make_sharded_mppi(dynamics, running, cfg, mesh,
                                     terminal_fn=terminal)
        plan = jax.jit(plan)
        ms = MPPIState.seeded(0, cfg.T, model.nu)
        t0 = time.perf_counter()
        a, ms, _ = plan(ms, init_state)
        np.asarray(a)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            a, ms, _ = plan(ms, init_state)
        np.asarray(a)
        lat = (time.perf_counter() - t0) / args.iters
        results.append((n, K, lat, compile_s))
        print(json.dumps({"event": "point", "devices": n, "K": K,
                          "replan_ms": round(lat * 1e3, 3),
                          "rollouts_per_s": round(K / lat, 1),
                          "compile_s": round(compile_s, 1),
                          "virtual": virtual}), flush=True)

    if results:
        n_ref, _, t_ref, _ = results[0]  # smallest measured mesh = reference
        summary = []
        for n, K, lat, _ in results:
            # weak: constant per-device work -> flat latency is 100%
            # strong: fixed total work -> ideal latency is t_ref*n_ref/n
            eff = (t_ref * n_ref / (lat * n)) if args.mode == "strong" \
                else (t_ref / lat)
            summary.append({"devices": n, "K": K,
                            "replan_ms": round(lat * 1e3, 3),
                            "rollouts_per_s": round(K / lat, 1),
                            "efficiency": round(eff, 4)})
        print(json.dumps({"event": "summary", "mode": args.mode,
                          "engine": engine, "task": args.task,
                          "virtual": virtual, "points": summary}), flush=True)


if __name__ == "__main__":
    main()
