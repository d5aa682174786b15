"""Go1 trot gait-shaping sweep on the kernel planner (runtime param deltas).

The reference cost (src/quadruped_datacollection.py:57-138) produces a
0.4-0.6 m/s trot under MuJoCo C at K=50; on our penalty planner tier the
same cost settles into a belly-crawl (z~0.13, vx~0.2). This sweeps the
param_gait deltas of ops/kernel_costs.quadruped (zero deltas == reference
cost) to find a shaping that trots on OUR stack — the same playbook that
produced the humanoid's walking weights in round 3. One compile, one
episode per config.

  python scripts/dev_quad_gait.py [--steps 1000] [--k 4096]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--goal-x", type=float, default=3.0)
    ap.add_argument("--out", default="/tmp/quad_gait_sweep.jsonl")
    args = ap.parse_args()

    from humanoid_mppi_rl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from humanoid_mppi_rl_tpu.collect.runner import (
        EpisodeRunner, _quad_fall_fn, _quad_goal_fn)

    r = EpisodeRunner("go1_collect",
                      cost_kwargs_override={"param_goal": True,
                                            "param_gait": True},
                      use_kernel=True, block_k=min(1024, args.k),
                      mppi_override={"n_samples": args.k,
                                     "horizon": args.horizon})

    ln = math.log
    # params: [gx, gy, -, -, d_vel, d_h, lw_h, lw_v, lw_tr, lw_g, w_home,
    #          lsig, ltemp]
    def P(d_vel=0.0, d_h=0.0, w_h=500.0, w_v=30000.0, w_tr=34000.0,
          w_g=3000.0, w_home=0.0, sig=1.0, temp=1.0):
        return np.asarray([
            args.goal_x, 0.0, 0.0, 0.0, d_vel, d_h,
            ln(w_h / 500.0), ln(w_v / 30000.0), ln(w_tr / 34000.0),
            ln(w_g / 3000.0), w_home, ln(sig), ln(temp)], np.float32)

    configs = {
        # round 1 found sigma is the decisive knob: sig=0.7 with height+home
        # shaping stands (z 0.27-0.34) at 0.36 m/s while every sig=1.0
        # config belly-crawls — large exploration noise lets K=4096 MPPI
        # find crawl-lunges that exploit the penalty planner tier.
        "sig07_plain": P(sig=0.7),
        "sig06_h10k_home3k": P(w_h=10000.0, w_home=3000.0, sig=0.6),
        "sig05_h10k_home3k": P(w_h=10000.0, w_home=3000.0, sig=0.5),
        "sig07_h10k_home3k_g2x": P(w_h=10000.0, w_home=3000.0, sig=0.7,
                                   w_g=6000.0),
        "sig06_h10k_home1k": P(w_h=10000.0, w_home=1000.0, sig=0.6),
        "sig06_h5k_home3k": P(w_h=5000.0, w_home=3000.0, sig=0.6),
        "sig05_plain": P(sig=0.5),
        "sig06_h10k_home3k_v07": P(w_h=10000.0, w_home=3000.0, sig=0.6,
                                   d_vel=-0.2),
    }

    with open(args.out, "a") as f:
        for name, params in configs.items():
            t0 = time.time()
            res = r.run(max_steps=args.steps, seed=0,
                        goal_fn=_quad_goal_fn(0.5),
                        fall_fn=_quad_fall_fn(0.08), params=params,
                        chunk=50)
            s, a, t = res.logger.arrays()
            x, z = s[:, 0], s[:, 2]
            calves = s[:, [9, 12, 15, 18]]
            c = calves[len(calves) // 3:]
            fl_rr = float(np.corrcoef(c[:, 0], c[:, 3])[0, 1])
            fr_rl = float(np.corrcoef(c[:, 1], c[:, 2])[0, 1])
            out = {
                "name": name, "steps": res.steps,
                "goal": bool(res.goal_reached), "fell": bool(res.fell),
                "x_final": round(float(x[-1]), 3),
                "z_min": round(float(z.min()), 3),
                "z_tail": [round(float(z[-300:].min()), 3),
                           round(float(z[-300:].max()), 3)],
                "mean_vx": round(float((x[-1] - x[0])
                                       / (t[-1] - t[0] + 1e-9)), 3),
                "diag_corr": [round(fl_rr, 2), round(fr_rl, 2)],
                "wall_s": round(time.time() - t0, 1),
            }
            print(json.dumps(out), flush=True)
            f.write(json.dumps(out) + "\n")
            np.savez(f"/tmp/quad_gait_{name}.npz", states=s, actions=a,
                     times=t)


if __name__ == "__main__":
    main()
