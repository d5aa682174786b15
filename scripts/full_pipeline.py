"""Full-scale reference pipeline on one command (round-2 VERDICT missing-3):

  1. collect   — kernel-path, goal-gated humanoid episode collection at
                 reference scale (the src/run.sh equivalent: N randomized
                 goal episodes, only successes saved, 57-col states)
  2. train     — humanoid preset FeatureAttention(30,21,512,8,7) for the
                 full reference budget (200 epochs, Adam 1e-3 cosine->1e-6,
                 batch 64; reference learning/train.py:36-77), epochs run
                 as single device programs (TrainConfig.scan_epochs)
  3. estimator — closed-loop estimator MPPI on the SELF-TRAINED surrogate
                 against the coupled-tier physics plant

Stages are resumable: each writes a completion marker under --out and is
skipped when the marker exists (delete the marker or pass --force to
re-run). Everything observable lands under --out: collected CSVs,
metrics JSONL per stage, orbax checkpoints, the estimator trajectory, and
summary.json with throughput numbers for PERF.md.

  python scripts/full_pipeline.py --out artifacts/full_pipeline \
      --episodes 50 --epochs 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def marker(out, stage):
    return os.path.join(out, f".done_{stage}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/full_pipeline")
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--max-steps", type=int, default=2500)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--task", default="humanoid_walk")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--rollout-k", type=int, default=1,
                    help="multi-step rollout loss window (8 reproduces "
                         "the rollout_k surrogate that is open-loop sane "
                         "— artifacts/rollout_k_surrogate; 1 = the "
                         "reference one-step contract)")
    ap.add_argument("--grad-clip", type=float, default=0.0)
    ap.add_argument("--estimator-steps", type=int, default=100)
    ap.add_argument("--estimator-k", type=int, default=2048)
    ap.add_argument("--flash", action="store_true",
                    help="plan estimator rollouts through the fused Pallas "
                         "forward (ops/estimator_kernel)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
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
            max_steps=args.max_steps, task_name=args.task, use_kernel=True,
            retries=args.retries, shard_index=args.shard_index,
            num_shards=args.num_shards,
            metrics_path=os.path.join(out, "collect_metrics.jsonl"))
        wall = time.time() - t0
        n_ok = sum(1 for r in results if r["goal"])
        # strict accounting (r4 VERDICT weak-3): every executed control
        # step across retries, wall clock including the one-time compile
        steps = sum(r["steps_executed"] for r in results)
        summary["collect"] = {
            "episodes_attempted": len(results), "episodes_goal": n_ok,
            "goal_rate": round(n_ok / max(len(results), 1), 3),
            "control_steps_executed": steps, "wall_s": round(wall, 1),
            "steps_per_s_strict": round(steps / wall, 2),
            "task": args.task, "results": results,
        }
        json.dump(summary, open(summary_path, "w"), indent=1)
        open(marker(out, "collect"), "w").write("ok")
        print(json.dumps({"stage": "collect", **summary["collect"]},
                         default=str), flush=True)

    # ---- 2. train ---------------------------------------------------------
    ckpt_dir = os.path.join(out, "ckpt")
    if args.force or not os.path.exists(marker(out, "train")):
        import dataclasses

        from humanoid_mppi_rl_tpu.learning.train import (
            PRESET_CONFIGS, train_model)

        cfg = dataclasses.replace(
            PRESET_CONFIGS["humanoid"], epochs=args.epochs,
            ckpt_dir=os.path.abspath(ckpt_dir), scan_epochs=True,
            rollout_k=args.rollout_k,
            grad_clip=(args.grad_clip or (1.0 if args.rollout_k > 1
                                          else 0.0)),
            plot_path=os.path.join(out, "loss_curve.png"),
            log_path=os.path.join(out, "train_metrics.jsonl"))
        t0 = time.time()
        # reference humanoid-v2 layout: data/{states,actions}_ft/ (the
        # goal-gated collector's save_split_dirs)
        res = train_model(os.path.join(data_dir, "states_ft"),
                          os.path.join(data_dir, "actions_ft"), cfg)
        wall = time.time() - t0
        n_steps = args.epochs * max(1, res["n_pairs"] // cfg.batch_size)
        summary["train"] = {
            "epochs": args.epochs, "n_pairs": res["n_pairs"],
            "best_eval_loss": res["best_eval_loss"],
            "final_train_loss": res["final_train_loss"],
            "best_checkpoint": res["best_checkpoint"],
            "final_checkpoint": res["final_checkpoint"],
            "wall_s": round(wall, 1),
            "train_steps_per_s": round(n_steps / wall, 1),
            "samples_per_s": round(n_steps * cfg.batch_size / wall, 1),
        }
        json.dump(summary, open(summary_path, "w"), indent=1)
        open(marker(out, "train"), "w").write("ok")
        print(json.dumps({"stage": "train", **summary["train"]}), flush=True)

    # ---- 3. estimator closed loop ----------------------------------------
    if args.force or not os.path.exists(marker(out, "estimator")):
        import dataclasses

        from humanoid_mppi_rl_tpu.collect.estimator import (
            ESTIMATOR_CONFIGS, EstimatorRunner, humanoid_estimator_costs)
        from humanoid_mppi_rl_tpu.learning.train import (
            PRESET_CONFIGS, create_train_state, load_checkpoint)
        from humanoid_mppi_rl_tpu.models.predictors import make_model
        from humanoid_mppi_rl_tpu.envs.tasks import TASKS

        net = make_model("humanoid_attention")
        F = net.state_dim + net.action_dim
        params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, F)),
                           deterministic=True)
        best = summary.get("train", {}).get(
            "best_checkpoint", os.path.abspath(os.path.join(ckpt_dir, "model_best")))
        params = load_checkpoint(best, params0)

        spec = TASKS["humanoid_collect"]
        cfg = dataclasses.replace(ESTIMATOR_CONFIGS["humanoid"],
                                  n_samples=args.estimator_k)
        running, terminal = humanoid_estimator_costs()

        from humanoid_mppi_rl_tpu.physics import build_from_mjcf

        pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
        id_l = pm.body_id("foot_left")
        id_r = pm.body_id("foot_right")

        def state_fn(plant):
            # the 30 columns the surrogate was trained on:
            # [qpos(28); foot_l_z; foot_r_z] (train state_idxes [0..27,55,56])
            return jnp.concatenate([
                plant.qpos, plant.xpos[id_l, 2][None], plant.xpos[id_r, 2][None]])

        if args.flash:
            from humanoid_mppi_rl_tpu.ops.estimator_kernel import (
                make_flash_feature_attention)
            apply_fn = make_flash_feature_attention(net, params)
        else:
            apply_fn = net.apply
        est = EstimatorRunner(spec.asset_path(), apply_fn, params, cfg,
                              running, terminal, state_fn=state_fn,
                              batched_dynamics=args.flash)
        t0 = time.time()
        log = est.run(n_steps=args.estimator_steps, seed=args.seed)
        wall = time.time() - t0
        s, a, t = log.arrays()
        np.savez_compressed(os.path.join(out, "estimator_closedloop.npz"),
                            states=s, actions=a, times=t)
        summary["estimator"] = {
            "steps": int(s.shape[0]), "K": args.estimator_k,
            "finite": bool(np.isfinite(s).all()),
            "final_root_xyz": [round(float(v), 4) for v in s[-1, :3]],
            "min_torso_z": round(float(s[:, 2].min()), 4),
            "wall_s": round(wall, 1),
            "replan_s": round(wall / max(1, s.shape[0]), 3),
            "checkpoint": best,
        }
        json.dump(summary, open(summary_path, "w"), indent=1)
        open(marker(out, "estimator"), "w").write("ok")
        print(json.dumps({"stage": "estimator", **summary["estimator"]}),
              flush=True)

    print(json.dumps({"stage": "done", "summary": summary_path}), flush=True)


if __name__ == "__main__":
    main()
