"""Gait-shaping sweep: run several PARAM_SLOTS delta settings through ONE
compiled controller (EpisodeRunner reuses the jitted chunk across episodes —
runtime params mean no recompile between settings; see scripts/dev_gait.py
for the single-episode version and the metric definitions)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dev_gait import SLOT_FLAGS, gait_metrics  # noqa: E402

SWEEP = {
    # zero deltas == reference v3 cost, per-sample gait terms active
    "baseline": {},
    # "reference-effective": gait shaping OFF — what the reference's MPPI
    # actually optimized per-sample, since its gait terms were evaluated on
    # the global sim state and were sample-constant (SURVEY.md §3.1)
    "gait_off": {"d_swing_x_w": -8.0, "d_knee_x_w": -3.0,
                 "d_swing_vel_w": -0.15, "d_clearance_w": -2.0},
    "gait_quarter": {"d_swing_x_w": -6.0, "d_knee_x_w": -2.25,
                     "d_swing_vel_w": -0.1125, "d_clearance_w": -1.5},
    "gait_off_lowsig": {"d_swing_x_w": -8.0, "d_knee_x_w": -3.0,
                        "d_swing_vel_w": -0.15, "d_clearance_w": -2.0,
                        "d_log_sigma": -0.7},
    "gait_off_slow": {"d_swing_x_w": -8.0, "d_knee_x_w": -3.0,
                      "d_swing_vel_w": -0.15, "d_clearance_w": -2.0,
                      "d_target_vel": -0.1, "d_log_sigma": -0.35},
    # round-5 per-seed speed ratchet (VERDICT item 6): deltas ON TOP of the
    # humanoid_walk task preset (use --task humanoid_walk) pushing the slow
    # seeds toward the reference 0.5 m/s target
    "walk_tv05": {"d_target_vel": 0.1},
    "walk_tv05_sv025": {"d_target_vel": 0.1, "d_swing_vel_w": 0.05},
    "walk_tv06_sv025": {"d_target_vel": 0.2, "d_swing_vel_w": 0.05},
    "walk_sv030": {"d_swing_vel_w": 0.10},
    "walk_tv05_goal": {"d_target_vel": 0.1, "d_goal_xy_w": 1.0},
    "walk_tv05_losig": {"d_target_vel": 0.1, "d_log_sigma": -0.15},
    "walk_tv05_stride": {"d_target_vel": 0.1, "d_foot_offset": 0.1,
                         "d_swing_vel_w": 0.03},
}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="humanoid_collect")
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="*", default=None,
                    help="run every setting over these seeds (one compile "
                         "for the whole settings x seeds grid)")
    ap.add_argument("--goal", type=float, nargs=3, default=[10.0, 0.0, 1.28])
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--save-dir", default="")
    ap.add_argument("--spec", default="",
                    help='JSON {"name": {flag: delta, ...}, ...} replacing '
                         "the built-in SWEEP table")
    args = ap.parse_args()
    if args.spec:
        SWEEP.clear()
        SWEEP.update(json.loads(args.spec))

    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.collect.runner import (
        EpisodeRunner, _humanoid_state_row)

    runner = EpisodeRunner(
        args.task, seed=args.seed, use_kernel=True,
        cost_kwargs_override={"param_target": True, "param_gait": True},
        mppi_override={"n_samples": args.k, "horizon": args.horizon},
    )
    model = runner.model
    row_fn = _humanoid_state_row(model.body_id("foot_left"),
                                 model.body_id("foot_right"))

    def fall_fn(qpos, p):
        return (qpos[2] < 0.7) | ~jnp.isfinite(qpos[2])

    names = args.only if args.only else list(SWEEP)
    unknown = [n for n in names if n not in SWEEP]
    if unknown:
        ap.error(f"unknown --only setting(s) {unknown}; "
                 f"valid: {sorted(SWEEP)}")
    seeds = args.seeds if args.seeds else [args.seed]
    for name in names:
        deltas = SWEEP[name]
        params = np.zeros(16, np.float32)
        params[0:3] = args.goal
        for flag, v in deltas.items():
            params[SLOT_FLAGS[flag]] = v
        for seed in seeds:
            res = runner.run(max_steps=args.steps, seed=seed,
                             state_row_fn=row_fn, fall_fn=fall_fn,
                             params=params, chunk=args.chunk)
            rows = np.asarray(res.logger.states)
            times = np.asarray(res.logger.times)
            if args.save_dir:
                os.makedirs(args.save_dir, exist_ok=True)
                np.savez(os.path.join(args.save_dir, f"{name}_s{seed}.npz"),
                         states=rows, actions=np.asarray(res.logger.actions),
                         times=times)
            out = {"setting": name, "seed": seed, "fell": bool(res.fell),
                   "deltas": deltas}
            out.update(gait_metrics(rows, times, model.nq))
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
