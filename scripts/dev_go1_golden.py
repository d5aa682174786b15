"""Go1 golden-trajectory fidelity triage (VERDICT r2 ask #1).

The reference commits 10 successful Go1 goal runs
(/root/reference/Humanoid_MPPI-RL/quad_data_goal/*/run_*/, produced by
reference src/quadruped_datacollection.py:207-259). Logging is 2x per
control step (pre-step at :171, post-step at :231) with duplicated sim
times, so golden one-step pairs are (states[2k], actions[2k]) ->
states[2k+1].

Phase A (this script, --mj): replay every pair through MuJoCo C with our
assets/go1.xml to validate the asset + the pair contract (chain error must
be ~1e-10).

Phase B (--ours): one-step error ladder of our coupled-tier engine on the
same pairs, split by constraint activity, mirroring the humanoid golden
ladder (tests/test_golden_reference.py).
"""

import argparse
import glob
import os
import sys

import numpy as np

REF_GLOB = "/root/reference/Humanoid_MPPI-RL/quad_data_goal/*/run_*"
ASSET = os.path.join(os.path.dirname(__file__), "..",
                     "humanoid_mppi_rl_tpu", "assets", "go1.xml")


def load_runs(limit=None):
    runs = []
    for rd in sorted(glob.glob(REF_GLOB)):
        sf = glob.glob(os.path.join(rd, "states*.csv"))
        af = glob.glob(os.path.join(rd, "actions*.csv"))
        if not sf or not af:
            continue
        states = np.loadtxt(sf[0], delimiter=",")
        actions = np.loadtxt(af[0], delimiter=",")
        runs.append((rd, states, actions))
    return runs[:limit] if limit else runs


def golden_pairs(states, actions):
    """(x_t, u_t, x_{t+1}) for each control step; also sanity-check the
    duplicated-row structure (row 2k+1 == row 2k+2)."""
    n2 = states.shape[0]
    npairs = (n2 - 1) // 2
    x0 = states[0 : 2 * npairs : 2]
    u = actions[0 : 2 * npairs : 2]
    x1 = states[1 : 2 * npairs * 2 : 2][:npairs]
    # duplicate structure check
    dup = states[1:-1:2][: npairs - 1] - states[2::2][: npairs - 1]
    return x0, u, x1, np.abs(dup).max() if dup.size else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mj", action="store_true")
    ap.add_argument("--ours", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None, help="cap pairs/run")
    args = ap.parse_args()

    runs = load_runs(args.limit)
    print(f"{len(runs)} runs")

    if args.mj:
        import mujoco

        m = mujoco.MjModel.from_xml_path(ASSET)
        d = mujoco.MjData(m)
        print("nq", m.nq, "nv", m.nv, "nu", m.nu, "timestep", m.opt.timestep,
              "cone", m.opt.cone, "impratio", m.opt.impratio)
        for rd, states, actions in runs:
            x0, u, x1, dupmax = golden_pairs(states, actions)
            N = len(x0) if args.frames is None else min(len(x0), args.frames)
            err = np.zeros(N)
            nefc = np.zeros(N, int)
            for i in range(N):
                d.qpos[:] = x0[i, :19]
                d.qvel[:] = x0[i, 19:37]
                d.ctrl[:] = u[i]
                mujoco.mj_forward(m, d)
                nefc[i] = d.nefc
                mujoco.mj_step(m, d)
                err[i] = np.abs(
                    np.concatenate([d.qpos, d.qvel]) - x1[i]).max()
            print(f"{os.path.basename(rd)}: pairs={N} dup={dupmax:.1e} "
                  f"mj_chain_max={err.max():.2e} median={np.median(err):.2e} "
                  f"nefc[min/med/max]={nefc.min()}/{int(np.median(nefc))}/"
                  f"{nefc.max()}")

    if args.ours:
        import jax

        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
        import mujoco

        m = mujoco.MjModel.from_xml_path(ASSET)
        d = mujoco.MjData(m)
        pm = build_from_mjcf(ASSET, include_self_collisions=True)
        step_c = jax.jit(jax.vmap(lambda a, b, c: step(
            pm, forward(pm, a, b), c).qpos))
        step_cv = jax.jit(jax.vmap(lambda a, b, c: step(
            pm, forward(pm, a, b), c).qvel))

        all_err, all_nefc, all_verr = [], [], []
        for rd, states, actions in runs:
            x0, u, x1, _ = golden_pairs(states, actions)
            N = len(x0) if args.frames is None else min(len(x0), args.frames)
            x0, u, x1 = x0[:N], u[:N], x1[:N]
            nefc = np.zeros(N, int)
            for i in range(N):
                d.qpos[:] = x0[i, :19]
                d.qvel[:] = x0[i, 19:37]
                d.ctrl[:] = u[i]
                mujoco.mj_forward(m, d)
                nefc[i] = d.nefc
            qp = jnp.asarray(x0[:, :19])
            qv = jnp.asarray(x0[:, 19:37])
            uu = jnp.asarray(u)
            pred = np.asarray(step_c(qp, qv, uu))
            predv = np.asarray(step_cv(qp, qv, uu))
            err = np.abs(pred - x1[:, :19]).max(axis=1)
            verr = np.abs(predv - x1[:, 19:37]).max(axis=1)
            all_err.append(err)
            all_verr.append(verr)
            all_nefc.append(nefc)
            print(f"{os.path.basename(os.path.dirname(rd))}: N={N} "
                  f"qpos med={np.median(err):.2e} p90={np.quantile(err,0.9):.2e} "
                  f"max={err.max():.2e}")
        err = np.concatenate(all_err)
        verr = np.concatenate(all_verr)
        nefc = np.concatenate(all_nefc)
        con = nefc > 24  # always >=12 frictionloss rows + 12? (see print)
        print(f"\nTOTAL {len(err)} frames, nefc range "
              f"{nefc.min()}..{nefc.max()}")
        print(f"qpos: median={np.median(err):.2e} "
              f"p90={np.quantile(err, 0.9):.2e} max={err.max():.2e}")
        print(f"qvel: median={np.median(verr):.2e} "
              f"p90={np.quantile(verr, 0.9):.2e} max={verr.max():.2e}")


if __name__ == "__main__":
    sys.exit(main())
