"""Control experiment (round-5 VERDICT item 1): plan with the ESTIMATOR's
gait cost but on the TRUE dynamics.

Round 4/5 estimator loops stand still under every gait weight setting, on
both the one-step and the rollout_k surrogates. Two hypotheses:
  (a) surrogate error: MPPI exploits model error before finding gait;
  (b) the estimator COST itself (v1-style time-phased foot-lift clock over
      [qpos; foot-z] with FD velocities) cannot produce walking at the
      estimator operating point even with a perfect model.
This driver isolates (b): the same cost semantics evaluated on full
PhysicsState rollouts of the real engine (vx from qvel, foot z from xpos,
absolute clock from state.time), planned at the estimator operating point
(K=2048, replace-mode, sigma=0.4). If this walks, the surrogate is the
blocker; if it stands, the cost is.

  python scripts/dev_estimator_cost_truth.py --steps 240 --horizon 25
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
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--target-vel", type=float, default=0.35)
    ap.add_argument("--w-gait", type=float, default=60.0)
    ap.add_argument("--gait-period", type=float, default=0.9)
    ap.add_argument("--foot-lift", type=float, default=0.10)
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

    spec = TASKS["humanoid_collect"]
    pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
    pm_plan = build_from_mjcf(spec.asset_path())
    id_l, id_r = pm.body_id("foot_left"), pm.body_id("foot_right")

    goal = jnp.asarray([3.0, 0.0, 1.28])
    om = 2.0 * math.pi / args.gait_period
    w_vel, w_height, w_orient, w_lat, w_goal = 10.0, 22.0, 17.0, 2.0, 1.0
    w_gait, w_ctrl = args.w_gait, 0.1
    tv, fl_amp = args.target_vel, args.foot_lift

    # the estimator cost's semantics over full PhysicsState (see
    # collect/estimator.humanoid_gait_estimator_costs — vx/vy from qvel
    # instead of FD, foot z from xpos, absolute clock from state.time)
    def running(st, u, t):
        vx, vy = st.qvel[0], st.qvel[1]
        qw, qx, qy, qz = st.qpos[3], st.qpos[4], st.qpos[5], st.qpos[6]
        roll = jnp.arctan2(2 * (qw * qx + qy * qz),
                           1 - 2 * (qx * qx + qy * qy))
        pitch = jnp.arcsin(jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
        fl = st.xpos[id_l, 2]
        fr = st.xpos[id_r, 2]
        s = jnp.sin(om * st.time)
        tl = 0.07 + fl_amp * jnp.maximum(s, 0.0)
        tr = 0.07 + fl_amp * jnp.maximum(-s, 0.0)
        c = w_vel * (vx - tv) ** 2 + w_vel * vy ** 2
        c += w_height * (st.qpos[2] - goal[2]) ** 2
        c += w_orient * (roll ** 2 + pitch ** 2)
        c += w_lat * st.qpos[1] ** 2
        c += w_goal * jnp.sum((st.qpos[:2] - goal[:2]) ** 2)
        c += w_gait * ((fl - tl) ** 2 + (fr - tr) ** 2)
        c += w_ctrl * jnp.sum(u ** 2)
        return c

    def terminal(st, t):
        return 10.0 * (w_goal * jnp.sum((st.qpos[:2] - goal[:2]) ** 2)
                       + w_height * (st.qpos[2] - goal[2]) ** 2)

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
    plant = forward(pm, jnp.asarray(pm.qpos0), jnp.zeros(pm.nv))
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
        "y_drift": round(float(xs[-1, 1] - xs[0, 1]), 3),
        "replan_s": round((time.time() - t0) / args.steps, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
