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
    # BALLISTIC flight: the foot-center test alone miscounts toe-standing
    # (a capsule foot's center sits high while an endpoint still touches);
    # true flight also has the torso in free fall, d(vz)/dt ~ -g
    vz = rows[:, 8]
    dt = float(np.median(np.diff(times))) if len(times) > 1 else 0.005
    az = np.gradient(vz, dt)
    ballistic = in_flight & (np.abs(az + 9.81) < 4.0)
    # count flight phases with >= 3 consecutive airborne steps (15 ms)
    hops, run = 0, 0
    flight_steps = 0
    for f in ballistic:
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
        "ballistic_frac": round(float(ballistic.mean()), 3),
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
    ap.add_argument("--spec", default="",
                    help='JSON {"name": {P-kwargs}} replacing the built-in '
                         "sweep table")
    ap.add_argument("--fall-z", type=float, default=0.45,
                    help="abort when torso absolute z drops below this; "
                         "0.45 kills legitimate deep stance compressions "
                         "(every sweep run 'fell' at exactly z=0.45)")
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

    thr = args.fall_z - 1.0   # qpos[1] is the offset from z = 1 m

    def fall_fn(qpos, p):
        return (qpos[1] < thr) | ~jnp.isfinite(qpos[1])

    def P(d_vel=0.0, w_land=0.0, d_lw_pitch=0.0, d_knee_w=0.0, lsig=0.0,
          w_clock=0.0, d_anchor=0.0):
        v = np.zeros(13, np.float32)
        v[4], v[5], v[6], v[7], v[11] = d_vel, w_land, d_lw_pitch, d_knee_w, lsig
        v[8], v[9] = w_clock, d_anchor
        return v

    if args.sweep:
        import math
        # round-2 of the sweep: the fall anatomy (artifacts/hopper_k4096,
        # last 0.5 s) is land -> stay crouched at knee ~2 rad -> pitch
        # over; landing-speed shaping alone softened impacts but did not
        # prevent it, and the coupled-tier planner fell identically — the
        # cost never DEMANDS a rebound. Attack with a hop clock (periodic
        # torso-height target) and a strong anti-crouch knee anchor.
        configs = {
            "clock30": P(w_clock=30.0),
            "clock80": P(w_clock=80.0),
            "knee20": P(d_knee_w=20.0),
            "knee60_a-02": P(d_knee_w=60.0, d_anchor=-0.2),
            "clock30_knee20": P(w_clock=30.0, d_knee_w=20.0),
            "clock80_knee20_land20": P(w_clock=80.0, d_knee_w=20.0,
                                       w_land=20.0),
            "clock30_pitch3x": P(w_clock=30.0, d_lw_pitch=math.log(3.0)),
            "clock80_knee60": P(w_clock=80.0, d_knee_w=60.0),
        }
        if args.spec:
            configs = {name: P(**kw)
                       for name, kw in json.loads(args.spec).items()}
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
