"""Dev harness: contact behavior sanity vs mujoco."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import mujoco
import jax.numpy as jnp
from functools import partial

from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step

ASSET = os.path.join(os.path.dirname(__file__), "..", "humanoid_mppi_rl_tpu", "assets")


def rollout_mine(pm, qpos, qvel, ctrl, n):
    st0 = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))

    @jax.jit
    def run(st):
        def body(s, _):
            s = step(pm, s, jnp.asarray(ctrl))
            return s, (s.qpos, s.qvel)
        return jax.lax.scan(body, st, None, length=n)

    _, (qp, qv) = run(st0)
    return np.asarray(qp), np.asarray(qv)


def rollout_mj(m, qpos, qvel, ctrl, n):
    d = mujoco.MjData(m)
    d.qpos[:] = qpos; d.qvel[:] = qvel; d.ctrl[:] = ctrl
    qp = np.zeros((n, m.nq)); qv = np.zeros((n, m.nv))
    for i in range(n):
        mujoco.mj_step(m, d)
        qp[i] = d.qpos; qv[i] = d.qvel
    return qp, qv


def run(name, key=None, n=1000, ctrl=None):
    path = os.path.join(ASSET, f"{name}.xml")
    m = mujoco.MjModel.from_xml_path(path)
    pm = build_from_mjcf(path)
    qpos = m.qpos0.copy()
    if key is not None:
        ki = [k for k in range(m.nkey)][0]
        import mujoco as mj
        kid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_KEY, key)
        qpos = m.key_qpos[kid].copy()
    qvel = np.zeros(m.nv)
    u = np.zeros(m.nu) if ctrl is None else np.asarray(ctrl)
    qp1, qv1 = rollout_mine(pm, qpos, qvel, u, n)
    qp2, qv2 = rollout_mj(m, qpos, qvel, u, n)
    print(f"--- {name} ({n} steps) ---")
    print("mine: final root z %.4f  max|qvel| %.3f  nan=%s" %
          (qp1[-1][2] if m.nq > 6 else qp1[-1][0], np.abs(qv1).max(), np.isnan(qp1).any()))
    print("mj:   final root z %.4f  max|qvel| %.3f" %
          (qp2[-1][2] if m.nq > 6 else qp2[-1][0], np.abs(qv2).max()))
    # height trace comparison
    if m.nq > 6:
        print("z traj mine:", np.round(qp1[::n//10, 2], 3))
        print("z traj mj:  ", np.round(qp2[::n//10, 2], 3))


if __name__ == "__main__":
    home_ctrl = [0, 0.9, -1.8] * 4
    run("go1", key="home", n=1000, ctrl=home_ctrl)
    run("humanoid", n=600)
