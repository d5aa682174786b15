"""Make the self-trained humanoid surrogate WALK (round-3 VERDICT weak-3).

Round 3's estimator loop planned on a bare goal-distance cost and the
surrogate-planned humanoid just stood (0.105 m / 100 steps). On the true
dynamics the humanoid also only walks under gait-shaped costs, so this
driver runs the estimator MPPI with collect/estimator.py's
humanoid_gait_estimator_costs over the FD/time-augmented surrogate state,
sweeping the gait weights — planning entirely on the round-3 self-trained
checkpoint (artifacts/full_pipeline/ckpt/model_best), plant = coupled tier.

  python scripts/dev_estimator_walk.py --steps 120 --k 2048 [--flash]
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
    ap.add_argument("--ckpt", default="artifacts/full_pipeline/ckpt/model_best")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--replans", type=int, default=1)
    ap.add_argument("--save", default="")
    ap.add_argument("--configs", nargs="+", default=None,
                    help="subset of sweep config names to run")
    args = ap.parse_args()

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.collect.estimator import (
        ESTIMATOR_CONFIGS, EstimatorRunner, humanoid_fk_estimator_costs,
        humanoid_gait_estimator_costs)
    from humanoid_mppi_rl_tpu.envs.tasks import TASKS
    from humanoid_mppi_rl_tpu.learning.train import load_checkpoint
    from humanoid_mppi_rl_tpu.models.predictors import make_model
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf

    net = make_model("humanoid_attention")
    F = net.state_dim + net.action_dim
    params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, F)),
                       deterministic=True)
    params = load_checkpoint(os.path.abspath(args.ckpt), params0)

    spec = TASKS["humanoid_collect"]
    pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
    id_l, id_r = pm.body_id("foot_left"), pm.body_id("foot_right")

    def state_fn(plant):
        return jnp.concatenate([plant.qpos, plant.xpos[id_l, 2][None],
                                plant.xpos[id_r, 2][None]])

    if args.flash:
        from humanoid_mppi_rl_tpu.ops.estimator_kernel import (
            make_flash_feature_attention)
        apply_fn = make_flash_feature_attention(net, params)
    else:
        apply_fn = net.apply

    cfg = dataclasses.replace(ESTIMATOR_CONFIGS["humanoid"],
                              n_samples=args.k, horizon=args.horizon,
                              replans_per_step=args.replans)

    sweeps = {
        "gait60_v035": dict(w_gait=60.0, target_vel=0.35),
        "gait120_v035": dict(w_gait=120.0, target_vel=0.35),
        "gait60_v025_lift08": dict(w_gait=60.0, target_vel=0.25,
                                   foot_lift=0.08),
        "gait30_v035": dict(w_gait=30.0, target_vel=0.35),
        "gait60_v035_p07": dict(w_gait=60.0, target_vel=0.35,
                                gait_period=0.7),
    }
    names = args.configs or list(sweeps)
    for name in names:
        if name.startswith("fk"):
            # round-5: the proven humanoid_walk task cost evaluated on
            # FK-reconstructed kinematics of the predicted qpos (the r5
            # truth-control experiment showed the position-only gait cost
            # crouches even on true dynamics — dev_estimator_cost_truth.py)
            ckw = {"fk_tv03": dict(target_vel=(0.3, 0.0)),
                   "fk": {}, "fk_goal25": dict(w_goal_xy=2.5)}[name]
            running, terminal = humanoid_fk_estimator_costs(
                pm, cost_kwargs=ckw)
        else:
            kw = sweeps[name]
            running, terminal = humanoid_gait_estimator_costs(**kw)
        est = EstimatorRunner(spec.asset_path(), apply_fn, params, cfg,
                              running, terminal, state_fn=state_fn,
                              batched_dynamics=args.flash,
                              fd_time_augment=30)
        t0 = time.time()
        log = est.run(n_steps=args.steps, seed=args.seed)
        wall = time.time() - t0
        s, a, t = log.arrays()
        x, z = s[:, 0], s[:, 2]
        out = {
            "name": name, "steps": int(s.shape[0]),
            "finite": bool(np.isfinite(s).all()),
            "x_progress_m": round(float(x[-1] - x[0]), 3),
            "torso_z_min": round(float(z.min()), 3),
            "torso_z_final": round(float(z[-1]), 3),
            "y_drift": round(float(s[-1, 1] - s[0, 1]), 3),
            "replan_s": round(wall / max(1, s.shape[0]), 3),
        }
        print(json.dumps(out), flush=True)
        if args.save:
            os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
            np.savez_compressed(args.save.replace(".npz", f"_{name}.npz"),
                                states=s, actions=a, times=t)


if __name__ == "__main__":
    main()
