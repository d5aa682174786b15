"""Quad control experiment (round-5, mirroring
scripts/dev_estimator_cost_truth.py): plan with the Go1 ESTIMATOR's gait
cost but on the TRUE dynamics at the estimator operating point
(K=2048, T=25, replace-mode, sigma=0.4).

The r4/r5 Go1 estimator loops drift backward under every surrogate; this
isolates whether the surrogate cost
(collect/estimator.quadruped_gait_estimator_costs) can trot at all with a
perfect model. If truth walks forward here, the surrogate is the blocker;
if truth also drifts, the cost is.

  python scripts/dev_quad_cost_truth.py --steps 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=25)
    args = ap.parse_args()

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import math

    import jax
    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.dynamics.physics import make_physics_dynamics
    from humanoid_mppi_rl_tpu.envs.tasks import TASKS
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
    from humanoid_mppi_rl_tpu.solver.mppi import (MPPIConfig, MPPIState,
                                                  make_mppi)

    spec = TASKS["go1_collect"]
    pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
    pm_plan = build_from_mjcf(spec.asset_path())
    home12 = jnp.asarray(dict(pm.keyframes)["home"][7:19])
    gx, gy = 2.0, 0.0
    target_vel, w_home = 0.45, 3000.0

    # quadruped_gait_estimator_costs semantics over the TRUE PhysicsState
    # (q from st.qpos, v from st.qvel, clock from st.time)
    def running(st, u, t):
        q, v, tau = st.qpos, st.qvel, st.time
        phase = (tau % 0.5) / 0.5 * 2 * math.pi
        trot = jnp.sin(phase)
        tv = target_vel + 0.1 * jnp.sin(phase)
        c = 10000.0 * (q[2] - 0.4) ** 2
        c += 30000.0 * (v[0] - tv) ** 2
        c += 500.0 * (q[6] ** 2 + q[7] ** 2)
        c += 20.0 * jnp.sum(v[6:9] ** 2)
        c += 50000.0 * (q[1] ** 2 + v[1] ** 2)
        c += 0.01 * jnp.sum(u ** 2)
        c += 3000.0 * ((q[0] - gx) ** 2 + (q[1] - gy) ** 2)
        f1 = (q[2] - q[11]) * trot
        f2 = (q[5] - q[8]) * (-trot)
        c += 34000.0 * (f1 * f1 + f2 * f2)
        c += w_home * jnp.sum((q[7:19] - home12) ** 2)
        nk = 0.5
        c += 2000.0 * ((q[2] - nk) ** 2 + (q[5] - nk) ** 2
                       + (q[8] - nk) ** 2 + (q[11] - nk) ** 2)
        c += 5.0 * jnp.sum(q[0:12] ** 2)
        return c

    def terminal(st, t):
        return 10.0 * 3000.0 * ((st.qpos[0] - gx) ** 2
                                + (st.qpos[1] - gy) ** 2)

    cfg = MPPIConfig(n_samples=args.k, horizon=args.horizon,
                     temperature=10.0, sigma=0.4, update_mode="replace",
                     tail_decay=0.1)
    dyn = make_physics_dynamics(pm_plan)
    plan = make_mppi(dyn, running, cfg, terminal_fn=terminal)

    def control_step(ms, plant):
        x = forward(pm_plan, plant.qpos, plant.qvel, plant.time)
        action, ms, diag = plan(ms, x)
        return action, ms, step(pm, plant, action)

    cstep = jax.jit(control_step)
    home = dict(pm.keyframes)["home"]
    plant = forward(pm, jnp.asarray(home), jnp.zeros(pm.nv))
    ms = MPPIState.seeded(0, cfg.T, pm.nu)
    xs = []
    t0 = time.time()
    for _ in range(args.steps):
        a, ms, plant = cstep(ms, plant)
        xs.append(np.asarray(plant.qpos[:3]))
    xs = np.stack(xs)
    print(json.dumps({
        "steps": args.steps, "K": args.k, "T": args.horizon,
        "x_progress_m": round(float(xs[-1, 0] - xs[0, 0]), 3),
        "z_min": round(float(xs[:, 2].min()), 3),
        "z_final": round(float(xs[-1, 2]), 3),
        "replan_s": round((time.time() - t0) / args.steps, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
