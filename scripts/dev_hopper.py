"""Hopper demonstration harness (round-2 VERDICT weak-7).

Runs a kernel-path hopper episode at K>=4096 and scores it for actual
HOPPING: forward progress, recurring flight phases (foot clear of the
ground with the torso ballistic), and uprightness. Saves the trajectory
npz that tests/test_e2e_hopper.py asserts against.

  python scripts/dev_hopper.py --k 4096 --steps 600 \
      --save artifacts/hopper_k4096.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def hop_metrics(rows: np.ndarray, times: np.ndarray):
    """rows: (N, 15) = [qpos(7); qvel(7); foot_z]. Flight = foot sole above
    clearance for >= 2 consecutive steps; a hop = flight phase bounded by
    stance. qpos = [rootx, rootz(offset from 1 m), rooty, waist, hip, knee,
    ankle]."""
    finite = np.isfinite(rows).all(axis=1)
    nan_step = int(np.argmin(finite)) if not finite.all() else None
    if nan_step is not None:
        rows, times = rows[:nan_step], times[:nan_step]
    if len(rows) < 2:
        return {"nan_step": nan_step, "steps": int(len(rows))}
    x = rows[:, 0]
    z_t = rows[:, 1] + 1.0          # absolute torso height
    foot_z = rows[:, 14]
    dur = float(times[-1] - times[0]) if len(times) > 1 else 1e-9

    clearance = 0.09                # foot CENTER height in flight (radius .04)
    in_flight = foot_z > clearance
    # count flight phases with >= 3 consecutive airborne steps (15 ms)
    hops, run = 0, 0
    flight_steps = 0
    for f in in_flight:
        if f:
            run += 1
            flight_steps += 1
        else:
            if run >= 3:
                hops += 1
            run = 0
    if run >= 3:
        hops += 1

    return {
        "nan_step": nan_step,
        "steps": int(len(rows)),
        "sim_s": round(dur, 3),
        "x_progress_m": round(float(x[-1] - x[0]), 3),
        "mean_speed_mps": round(float((x[-1] - x[0]) / dur), 3),
        "torso_z_mean": round(float(z_t.mean()), 3),
        "torso_z_min": round(float(z_t.min()), 3),
        "hops": int(hops),
        "hops_per_s": round(hops / dur, 2),
        "flight_frac": round(float(in_flight.mean()), 3),
        "max_foot_z": round(float(foot_z.max()), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--block-k", type=int, default=1024)
    ap.add_argument("--target-vel", type=float, default=None)
    ap.add_argument("--sigma", type=float, default=None)
    ap.add_argument("--save", default="")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep landing-preparation param deltas "
                         "(ops/kernel_costs.hopper param_gait) on ONE "
                         "compiled program")
    ap.add_argument("--params", type=float, nargs="+", default=None,
                    help="explicit param vector [d_vel, w_land, "
                         "d_log_w_pitch, d_knee_w, lsig] for a single run")
    ap.add_argument("--planner", default="kernel",
                    choices=["kernel", "coupled"],
                    help="'coupled' plans rollouts on the full coupled "
                         "constraint tier (array engine, planner==plant) — "
                         "the round-3 diagnosed fix for mis-landings")
    args = ap.parse_args()

    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from humanoid_mppi_rl_tpu.collect.runner import EpisodeRunner

    cost_kw = dict({"target_vel_x": args.target_vel}
                   if args.target_vel is not None else {})
    use_params = args.sweep or args.params is not None
    if use_params:
        cost_kw["param_gait"] = True
    mppi_kw = {"n_samples": args.k, "horizon": args.horizon}
    if args.sigma is not None:
        mppi_kw["sigma"] = args.sigma
    runner = EpisodeRunner(
        "hopper", use_kernel=(args.planner == "kernel"),
        block_k=args.block_k,
        cost_kwargs_override=cost_kw or None,
        mppi_override=mppi_kw,
        planner_solver=("coupled" if args.planner == "coupled" else None),
    )
    foot = runner.model.body_id("foot")

    def state_row(st):
        return jnp.concatenate([st.qpos, st.qvel, st.xpos[foot, 2][None]])

    def fall_fn(qpos, p):
        return (qpos[1] < -0.55) | ~jnp.isfinite(qpos[1])   # torso below .45 m

    def P(d_vel=0.0, w_land=0.0, d_lw_pitch=0.0, d_knee_w=0.0, lsig=0.0):
        v = np.zeros(13, np.float32)
        v[4], v[5], v[6], v[7], v[11] = d_vel, w_land, d_lw_pitch, d_knee_w, lsig
        return v

    if args.sweep:
        import math
        configs = {
            "baseline": P(),
            "land20": P(w_land=20.0),
            "land60": P(w_land=60.0),
            "land20_knee2": P(w_land=20.0, d_knee_w=2.0),
            "land60_sig07": P(w_land=60.0, lsig=math.log(0.7)),
            "land20_pitch2x": P(w_land=20.0, d_lw_pitch=math.log(2.0)),
            "sig07": P(lsig=math.log(0.7)),
            "land60_knee2_sig07": P(w_land=60.0, d_knee_w=2.0,
                                    lsig=math.log(0.7)),
        }
        for name, pv in configs.items():
            res = runner.run(max_steps=args.steps, seed=args.seed,
                             state_row_fn=state_row, fall_fn=fall_fn,
                             chunk=args.chunk, params=pv)
            rows = np.asarray(res.logger.states)
            times = np.asarray(res.logger.times)
            out = {"name": name, "fell": bool(res.fell)}
            out.update(hop_metrics(rows, times))
            print(json.dumps(out), flush=True)
        return

    pv = P(*args.params) if args.params is not None else None
    res = runner.run(max_steps=args.steps, seed=args.seed,
                     state_row_fn=state_row, fall_fn=fall_fn,
                     chunk=args.chunk, params=pv)
    rows = np.asarray(res.logger.states)
    times = np.asarray(res.logger.times)
    if args.save:
        os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
        np.savez_compressed(args.save, states=rows,
                            actions=np.asarray(res.logger.actions),
                            times=times)
    out = {"K": args.k, "H": args.horizon, "seed": args.seed,
           "fell": bool(res.fell), "params": None if pv is None else pv.tolist()}
    out.update(hop_metrics(rows, times))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
