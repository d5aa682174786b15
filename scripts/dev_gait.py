"""Gait-quality diagnostic for the humanoid MPPI controller.

Runs one headless episode (kernel planner + coupled-tier plant, same as
collection) and scores the gait from the logged 57-col trajectory:
forward progress/speed, torso-height stability, fall, and foot-alternation
statistics (committed swing-side switches with hysteresis on the logged
foot heights). The reference's only gait check was eyeballing the viewer
(SURVEY.md §4); this is its quantitative replacement.

All gait shaping goes through runtime PARAM_SLOTS deltas
(ops/kernel_costs.py), so a sweep reuses ONE compiled controller.

Usage (real TPU):
  python scripts/dev_gait.py --steps 600 --k 8192 --horizon 64 \
      --d-target-vel 0.2 --d-log-sigma -0.3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SLOT_FLAGS = {
    "d_target_vel": 4,
    "d_foot_offset": 5,
    "d_swing_vel_w": 6,
    "d_height_w": 7,
    "d_goal_xy_w": 8,
    "d_clearance_w": 9,
    "d_orient_w": 10,
    "d_log_sigma": 11,
    "d_log_temperature": 12,
    "d_swing_x_w": 13,
    "d_knee_x_w": 14,
    "d_foot_lift_w": 15,
}


def gait_metrics(rows: np.ndarray, times: np.ndarray, nq: int = 28):
    """rows: (N, 57) = [qpos(28); qvel(27); foot_l_z; foot_r_z].
    Scores only the finite prefix; reports the first non-finite step."""
    finite = np.isfinite(rows).all(axis=1)
    nan_step = int(np.argmin(finite)) if not finite.all() else None
    if nan_step is not None:
        rows, times = rows[:nan_step], times[:nan_step]
    if len(rows) < 2:
        return {"nan_step": nan_step, "steps": int(len(rows))}
    x = rows[:, 0]
    z = rows[:, 2]
    fl = rows[:, 55]
    fr = rows[:, 56]
    dt = float(np.median(np.diff(times))) if len(times) > 1 else 0.005
    dur = times[-1] - times[0] if len(times) > 1 else 1e-9

    # committed swing side with hysteresis: side flips only when the foot
    # height difference crosses +-thresh
    thresh = 0.015
    side = 0  # +1 left swing, -1 right swing, 0 unknown
    switches = 0
    switch_times = []
    for i in range(len(fl)):
        d = fl[i] - fr[i]
        new = 1 if d > thresh else (-1 if d < -thresh else side)
        if side != 0 and new != 0 and new != side:
            switches += 1
            switch_times.append(times[i])
        if new != 0:
            side = new
    stride = (np.median(np.diff(switch_times)) * 2
              if len(switch_times) > 2 else float("nan"))

    both_low = np.mean((fl < 0.12) & (fr < 0.12))
    return {
        "nan_step": nan_step,
        "steps": int(len(rows)),
        "sim_s": round(float(dur), 3),
        "x_progress_m": round(float(x[-1] - x[0]), 3),
        "mean_speed_mps": round(float((x[-1] - x[0]) / dur), 3),
        "y_drift_m": round(float(rows[-1, 1] - rows[0, 1]), 3),
        "torso_z_mean": round(float(np.mean(z)), 3),
        "torso_z_min": round(float(np.min(z)), 3),
        "foot_switches": int(switches),
        "steps_per_s": round(switches / float(dur), 2),
        "stride_period_s": round(float(stride), 3) if stride == stride else None,
        "double_support_frac": round(float(both_low), 3),
        "max_foot_z": round(float(max(fl.max(), fr.max())), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="humanoid_collect")
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--goal", type=float, nargs=3, default=[10.0, 0.0, 1.28])
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--block-k", type=int, default=1024)
    ap.add_argument("--save", default="", help="npz path for the trajectory")
    for flag in SLOT_FLAGS:
        ap.add_argument(f"--{flag.replace('_', '-')}", type=float, default=0.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.collect.runner import (
        EpisodeRunner, _humanoid_state_row)

    params = np.zeros(16, np.float32)
    params[0:3] = args.goal
    deltas = {}
    for flag, slot in SLOT_FLAGS.items():
        v = getattr(args, flag)
        params[slot] = v
        if v:
            deltas[flag] = v

    runner = EpisodeRunner(
        args.task, seed=args.seed, use_kernel=True, block_k=args.block_k,
        cost_kwargs_override={"param_target": True, "param_gait": True},
        mppi_override={"n_samples": args.k, "horizon": args.horizon},
    )
    model = runner.model
    row_fn = _humanoid_state_row(model.body_id("foot_left"),
                                 model.body_id("foot_right"))

    def fall_fn(qpos, p):
        # NaN-safe: a diverged plant aborts like a fall (NaN comparisons
        # are False, so `z < 0.7` alone would run to max_steps on NaNs)
        import jax.numpy as jnp
        return (qpos[2] < 0.7) | ~jnp.isfinite(qpos[2])

    res = runner.run(max_steps=args.steps, seed=args.seed,
                     state_row_fn=row_fn, fall_fn=fall_fn,
                     params=params, chunk=args.chunk)
    rows = np.asarray(res.logger.states)
    times = np.asarray(res.logger.times)
    acts = np.asarray(res.logger.actions)
    if args.save:
        np.savez(args.save, states=rows, actions=acts, times=times)
    out = {"task": args.task, "K": args.k, "H": args.horizon,
           "seed": args.seed, "fell": bool(res.fell), "deltas": deltas}
    out.update(gait_metrics(rows, times, model.nq))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
