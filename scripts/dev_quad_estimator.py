"""Go1 estimator closed loop with the gait-shaped surrogate cost.

The reference's estimator cost is bare goal distance
(src/quadruped_mppi_estimator.py:48-55); planning on it, the surrogate-
driven Go1 stands (or drifts). This driver runs the estimator MPPI under
quadruped_gait_estimator_costs — the tuned trot cost that demonstrably
works on the true plant, evaluated on the surrogate's predictions — using
the self-trained checkpoint from artifacts/quad_pipeline.

  python scripts/dev_quad_estimator.py --steps 300 [--flash]
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
    ap.add_argument("--ckpt", default="artifacts/quad_pipeline/ckpt/model_best")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--goal-x", type=float, default=2.0)
    ap.add_argument("--save", default="")
    ap.add_argument("--configs", nargs="+", default=None)
    args = ap.parse_args()

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.collect.estimator import (
        ESTIMATOR_CONFIGS, EstimatorRunner, quadruped_estimator_costs,
        quadruped_gait_estimator_costs)
    from humanoid_mppi_rl_tpu.envs.tasks import TASKS
    from humanoid_mppi_rl_tpu.learning.train import load_checkpoint
    from humanoid_mppi_rl_tpu.models.predictors import make_model
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf

    net = make_model("quadruped_attention")
    F = net.state_dim + net.action_dim
    params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, F)),
                       deterministic=True)
    params = load_checkpoint(os.path.abspath(args.ckpt), params0)

    spec = TASKS["go1_collect"]
    pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
    home = np.asarray(dict(pm.keyframes)["home"])
    home12 = home[7:19]

    if args.flash:
        from humanoid_mppi_rl_tpu.ops.estimator_kernel import (
            make_flash_feature_attention)
        apply_fn = make_flash_feature_attention(net, params)
    else:
        apply_fn = net.apply

    cfg = dataclasses.replace(ESTIMATOR_CONFIGS["quadruped"],
                              n_samples=args.k, horizon=args.horizon)

    sweeps = {
        "ref_goal_only": None,   # reference cost, no augmentation
        "gait_v045": dict(target_vel=0.45),
        "gait_v035": dict(target_vel=0.35),
        "gait_v045_home1k": dict(target_vel=0.45, w_home=1000.0),
    }
    names = args.configs or list(sweeps)
    for name in names:
        kw = sweeps[name]
        if kw is None:
            running, terminal = quadruped_estimator_costs(
                goal_pos=(args.goal_x, 0.0, 0.35))
            aug = None
        else:
            running, terminal = quadruped_gait_estimator_costs(
                home12, goal_xy=(args.goal_x, 0.0), **kw)
            aug = 37
        est = EstimatorRunner(spec.asset_path(), apply_fn, params, cfg,
                              running, terminal,
                              batched_dynamics=args.flash,
                              fd_time_augment=aug)
        t0 = time.time()
        log = est.run(n_steps=args.steps, seed=args.seed,
                      init_qpos=home)
        wall = time.time() - t0
        s, a, t = log.arrays()
        x, z = s[:, 0], s[:, 2]
        out = {
            "name": name, "steps": int(s.shape[0]),
            "finite": bool(np.isfinite(s).all()),
            "x_progress_m": round(float(x[-1] - x[0]), 3),
            "trunk_z_min": round(float(z.min()), 3),
            "trunk_z_final": round(float(z[-1]), 3),
            "mean_vx": round(float((x[-1] - x[0])
                                   / max(t[-1] - t[0], 1e-9)), 3),
            "replan_s": round(wall / max(1, s.shape[0]), 3),
        }
        print(json.dumps(out), flush=True)
        if args.save:
            os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
            np.savez_compressed(args.save.replace(".npz", f"_{name}.npz"),
                                states=s, actions=a, times=t)


if __name__ == "__main__":
    main()
