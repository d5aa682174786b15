"""Estimator-MPPI replan benchmark: flax apply vs the fused fast path.

BASELINE config 5's operating point is K=65536 surrogate rollouts of the
reference's deployed quadruped FeatureAttention(37,12,512,4,2). The replan
is ~2.05 PFLOP at T=50, so one 197 TFLOP/s (bf16) v5e chip has a hard
~10.4 s floor — report measured latency AND the fraction of that roofline.

  python scripts/bench_estimator.py --preset quadruped --k 16384 65536
  python scripts/bench_estimator.py --preset cartpole --k 2048 16384
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flops_per_replan(module, K, T, F):
    """MAC-exact matmul count for FeatureAttention (x2 for FLOPs)."""
    H, L = module.hidden_dim, module.attn_layers
    per_token = 3 * H * H + H * H + 2 * H * (4 * H)     # qkv + out + ffn
    attn = 2 * F * H                                     # scores + weighted V
    macs = F * (per_token + attn) * L
    return 2.0 * macs * K * T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="quadruped",
                    choices=["quadruped", "cartpole", "humanoid"])
    ap.add_argument("--k", type=int, nargs="+", default=[16384])
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--paths", nargs="+", default=["fast", "flax"],
                    help="flax | fast (restructured XLA) | flash "
                         "(fused Pallas kernel, ops/estimator_kernel)")
    ap.add_argument("--block-b", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from humanoid_mppi_rl_tpu.dynamics.learned import make_learned_dynamics
    from humanoid_mppi_rl_tpu.models.fast_apply import make_fast_feature_attention
    from humanoid_mppi_rl_tpu.models.predictors import make_model
    from humanoid_mppi_rl_tpu.solver.mppi import MPPIConfig, MPPIState, make_mppi

    cd = getattr(jnp, args.dtype)
    net = make_model(f"{args.preset}_attention", compute_dtype=cd)
    F = net.state_dim + net.action_dim
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, F)),
                      deterministic=True)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=net.state_dim),
                     jnp.float32)

    def running(x, u, t):
        return jnp.sum(x * x) + 0.1 * jnp.sum(u * u)

    peak_tflops = 197e12  # v5e bf16
    for K in args.k:
        cfg = MPPIConfig(n_samples=K, horizon=args.horizon, temperature=10.0,
                         sigma=0.5, update_mode="replace")
        fl = flops_per_replan(net, K, args.horizon, F)
        for path in args.paths:
            if path == "flash":
                from humanoid_mppi_rl_tpu.ops.estimator_kernel import (
                    make_flash_feature_attention)
                apply_fn = make_flash_feature_attention(
                    net, params, cd, block_b=args.block_b)
            elif path == "fast":
                apply_fn = make_fast_feature_attention(net, params, cd)
            else:
                apply_fn = net.apply
            dyn = make_learned_dynamics(apply_fn, params)
            plan = jax.jit(make_mppi(dyn, running, cfg,
                                     batched_dynamics=(path == "flash")))
            ms = MPPIState.seeded(0, cfg.T, net.action_dim)
            t0 = time.perf_counter()
            a, ms, _ = plan(ms, x0)
            np.asarray(a)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                a, ms, _ = plan(ms, x0)
            np.asarray(a)
            lat = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "preset": args.preset, "path": path, "K": K,
                "T": args.horizon, "dtype": args.dtype,
                "replan_s": round(lat, 3),
                "compile_s": round(compile_s, 1),
                "pflop_per_replan": round(fl / 1e15, 3),
                "tflops": round(fl / lat / 1e12, 1),
                "frac_of_v5e_bf16_roofline": round(fl / lat / peak_tflops, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
