"""Measure one-step contact fidelity vs the MuJoCo C oracle on the
reference's logged humanoid trajectory (the PARITY.md tolerance-ladder
number). Run on CPU f64."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

REF_RUN = "/root/reference/data/2025-04-09_145305"


def main():
    import mujoco

    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step

    states = np.loadtxt(os.path.join(REF_RUN, "states.csv"), delimiter=",")
    actions = np.loadtxt(os.path.join(REF_RUN, "actions.csv"), delimiter=",")
    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    pm = build_from_mjcf(asset, include_self_collisions=True)
    m = mujoco.MjModel.from_xml_path(asset)
    d = mujoco.MjData(m)

    step_j = jax.jit(lambda qp, qv, u: step(pm, forward(pm, qp, qv), u).qpos)

    idxs = np.arange(2, min(1400, states.shape[0] - 1))
    errs, vel_errs, nefc = [], [], []
    for i in idxs:
        qpos, qvel, u = states[i, :28], states[i, 28:55], actions[i]
        qp = np.asarray(step_j(jnp.asarray(qpos), jnp.asarray(qvel),
                               jnp.asarray(u)))
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = u
        mujoco.mj_step(m, d)
        errs.append(np.abs(qp - d.qpos).max())
        nefc.append(d.nefc)
    errs = np.asarray(errs)
    nefc = np.asarray(nefc)
    act = nefc > 0
    print(f"frames: {len(errs)}  constraint-active: {act.sum()}")
    if (~act).any():
        print(f"free frames:   median {np.median(errs[~act]):.3e}  "
              f"p90 {np.percentile(errs[~act], 90):.3e}")
    print(f"active frames: median {np.median(errs[act]):.3e}  "
          f"p90 {np.percentile(errs[act], 90):.3e}  "
          f"max {errs[act].max():.3e}")
    print(f"all frames:    median {np.median(errs):.3e}")


if __name__ == "__main__":
    main()
