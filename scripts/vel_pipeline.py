"""Velocity-supervised surrogate pipeline — the round-5 "named next
training contract" (PERF.md "Estimator closed loop round 5"), executed.

The measured binding constraint on both learned-dynamics loops was
FD-velocity SNR: the surrogate predicts positions only (the reference's
training contract, /root/reference/learning/train.py:36-45), so every
velocity the walking cost consumes is a finite difference of compounding
position error. This pipeline trains the surrogate to predict the FULL
57-col logged state [qpos(28); qvel(27); foot_l_z; foot_r_z] with the
multi-step rollout loss (TrainConfig.rollout_k) + egocentric root x/y,
then closes the estimator loop with a cost that reads the PREDICTED
velocities directly (collect/estimator.humanoid_predvel_estimator_costs)
— no FD anywhere in the cost.

Stages (resumable via .done_* markers, same pattern as full_pipeline.py):
  1. collect   goal-gated kernel-path humanoid_walk episodes (+ the
               committed artifacts/full_pipeline/data_sample trajectories
               merged in)
  2. train     FeatureAttention(57,21,512,8,7), rollout_k=8, ego-x/y,
               grad_clip=1.0
  3. estimator closed loop at K=2048/T=25 (flash Pallas forward), scored
               against the r5 FK-cost baseline (0.159 m / 120 steps) and
               the truth ceiling (0.63 m / 240 steps at this operating
               point)

  python scripts/vel_pipeline.py --episodes 24 --epochs 150 --flash
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def marker(out, stage):
    return os.path.join(out, f".done_{stage}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/vel_surrogate")
    ap.add_argument("--episodes", type=int, default=24)
    ap.add_argument("--max-steps", type=int, default=2500)
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="peak LR; 1e-3 (the 30-dim rollout_k recipe) is "
                         "unstable on the 57-dim velocity-supervised "
                         "composition (measured: eval oscillates 1e3-5e3)")
    ap.add_argument("--rollout-k", type=int, default=8)
    ap.add_argument("--estimator-steps", type=int, default=120)
    ap.add_argument("--estimator-k", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    out = args.out
    os.makedirs(out, exist_ok=True)
    summary_path = os.path.join(out, "summary.json")
    summary = (json.load(open(summary_path))
               if os.path.exists(summary_path) else {})

    # ---- 1. collect -------------------------------------------------------
    data_dir = os.path.join(out, "data")
    if args.force or not os.path.exists(marker(out, "collect")):
        from humanoid_mppi_rl_tpu.collect.runner import collect_humanoid

        t0 = time.time()
        results = collect_humanoid(
            n_episodes=args.episodes, out_dir=data_dir, seed=args.seed,
            max_steps=args.max_steps, task_name="humanoid_walk",
            use_kernel=True, retries=args.retries,
            metrics_path=os.path.join(out, "collect_metrics.jsonl"))
        wall = time.time() - t0
        # merge the committed round-4 sample trajectories (same task and
        # collection settings — artifacts/full_pipeline/data_sample)
        sample = os.path.join("artifacts", "full_pipeline", "data_sample")
        merged = 0
        if os.path.isdir(sample):
            for sub in ("states_ft", "actions_ft", "times_ft"):
                dst = os.path.join(data_dir, sub)
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(os.path.join(sample, sub)):
                    shutil.copy(os.path.join(sample, sub, f),
                                os.path.join(dst, f))
                    merged += sub == "states_ft"
        n_ok = sum(1 for r in results if r["goal"])
        steps = sum(r["steps_executed"] for r in results)
        summary["collect"] = {
            "episodes_attempted": len(results), "episodes_goal": n_ok,
            "goal_rate": round(n_ok / max(len(results), 1), 3),
            "control_steps_executed": steps, "wall_s": round(wall, 1),
            "steps_per_s_strict": round(steps / wall, 2),
            "merged_sample_trajectories": merged,
        }
        json.dump(summary, open(summary_path, "w"), indent=1)
        open(marker(out, "collect"), "w").write("ok")
        print(json.dumps({"stage": "collect", **summary["collect"]}),
              flush=True)

    # ---- 2. train ---------------------------------------------------------
    ckpt_dir = os.path.join(out, "ckpt")
    if args.force or not os.path.exists(marker(out, "train")):
        import dataclasses

        from humanoid_mppi_rl_tpu.learning.train import (
            PRESET_CONFIGS, train_model)

        cfg = dataclasses.replace(
            PRESET_CONFIGS["humanoid"], epochs=args.epochs, lr=args.lr,
            ckpt_dir=os.path.abspath(ckpt_dir), scan_epochs=True,
            rollout_k=args.rollout_k, grad_clip=1.0,
            state_idxes=None,                      # full 57-col state
            model_overrides={"state_dim": 57},
            ego_xy_cols=(0, 1),
            plot_path=os.path.join(out, "loss_curve.png"),
            log_path=os.path.join(out, "train_metrics.jsonl"))
        t0 = time.time()
        res = train_model(os.path.join(data_dir, "states_ft"),
                          os.path.join(data_dir, "actions_ft"), cfg)
        wall = time.time() - t0
        summary["train"] = {
            "epochs": args.epochs, "n_pairs": res["n_pairs"],
            "rollout_k": args.rollout_k,
            "best_eval_loss": res["best_eval_loss"],
            "final_train_loss": res["final_train_loss"],
            "best_checkpoint": res["best_checkpoint"],
            "wall_s": round(wall, 1),
        }
        json.dump(summary, open(summary_path, "w"), indent=1)
        open(marker(out, "train"), "w").write("ok")
        print(json.dumps({"stage": "train", **summary["train"]}), flush=True)

    # ---- 3. estimator closed loop ----------------------------------------
    if args.force or not os.path.exists(marker(out, "estimator")):
        import dataclasses

        from humanoid_mppi_rl_tpu.collect.estimator import (
            ESTIMATOR_CONFIGS, EstimatorRunner,
            humanoid_predvel_estimator_costs)
        from humanoid_mppi_rl_tpu.envs.tasks import TASKS
        from humanoid_mppi_rl_tpu.learning.train import load_checkpoint
        from humanoid_mppi_rl_tpu.models.predictors import make_model
        from humanoid_mppi_rl_tpu.physics import build_from_mjcf

        net = make_model("humanoid_attention", state_dim=57)
        F = net.state_dim + net.action_dim
        params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, F)),
                           deterministic=True)
        params = load_checkpoint(
            os.path.abspath(os.path.join(ckpt_dir, "model_best")), params0)

        spec = TASKS["humanoid_collect"]
        pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
        id_l, id_r = pm.body_id("foot_left"), pm.body_id("foot_right")

        def state_fn(plant):
            return jnp.concatenate([plant.qpos, plant.qvel,
                                    plant.xpos[id_l, 2][None],
                                    plant.xpos[id_r, 2][None]])

        if args.flash:
            from humanoid_mppi_rl_tpu.ops.estimator_kernel import (
                make_flash_feature_attention)
            apply_fn = make_flash_feature_attention(net, params)
        else:
            apply_fn = net.apply

        cfg = dataclasses.replace(ESTIMATOR_CONFIGS["humanoid"],
                                  n_samples=args.estimator_k,
                                  horizon=args.horizon)
        running, terminal = humanoid_predvel_estimator_costs(pm)
        est = EstimatorRunner(spec.asset_path(), apply_fn, params, cfg,
                              running, terminal, state_fn=state_fn,
                              batched_dynamics=args.flash,
                              fd_time_augment=57,
                              ego_cols=(0, 1))
        t0 = time.time()
        log = est.run(n_steps=args.estimator_steps, seed=args.seed)
        wall = time.time() - t0
        s, a, t = log.arrays()
        np.savez_compressed(os.path.join(out, "estimator_closedloop.npz"),
                            states=s, actions=a, times=t)
        x, z = s[:, 0], s[:, 2]
        summary["estimator"] = {
            "K": args.estimator_k, "T": args.horizon,
            "steps": int(s.shape[0]),
            "finite": bool(np.isfinite(s).all()),
            "x_progress_m": round(float(x[-1] - x[0]), 3),
            "torso_z_min": round(float(z.min()), 3),
            "torso_z_final": round(float(z[-1]), 3),
            "y_drift": round(float(s[-1, 1] - s[0, 1]), 3),
            "replan_s": round(wall / max(1, s.shape[0]), 3),
            "r5_fk_fd_baseline_m_120steps": 0.159,
            "truth_ceiling_m_240steps": 0.634,
        }
        json.dump(summary, open(summary_path, "w"), indent=1)
        open(marker(out, "estimator"), "w").write("ok")
        print(json.dumps({"stage": "estimator", **summary["estimator"]}),
              flush=True)


if __name__ == "__main__":
    main()
