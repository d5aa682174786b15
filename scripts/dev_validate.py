"""Dev harness: validate the JAX engine against the mujoco C oracle."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import mujoco
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
from humanoid_mppi_rl_tpu.physics import engine as eng

ASSET = os.path.join(os.path.dirname(__file__), "..", "humanoid_mppi_rl_tpu", "assets")

def check(name):
    path = os.path.join(ASSET, f"{name}.xml")
    m = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(m)
    pm = build_from_mjcf(path)

    rng = np.random.default_rng(0)
    qpos = m.qpos0 + rng.normal(0, 0.3, m.nq)
    # keep limited joints strictly inside their range (mujoco limit
    # constraints vs our penalties would otherwise dominate the diff)
    for j in range(m.njnt):
        jt = int(m.jnt_type[j])
        adr = m.jnt_qposadr[j]
        if jt == 0:
            q = qpos[adr+3:adr+7]
            qpos[adr+3:adr+7] = q / np.linalg.norm(q)
            qpos[adr+2] += 1.0   # lift well above the floor
        elif m.jnt_limited[j]:
            lo, hi = m.jnt_range[j]
            qpos[adr] = np.clip(qpos[adr], lo + 0.15*(hi-lo), hi - 0.15*(hi-lo))
    # lift slide-root models above the floor too
    for j in range(m.njnt):
        if int(m.jnt_type[j]) == 2 and abs(m.jnt_axis[j][2]) > 0.9 and m.jnt_bodyid[j] == 1:
            qpos[m.jnt_qposadr[j]] += 1.0
    qvel = rng.normal(0, 0.5, m.nv)

    d.qpos[:] = qpos; d.qvel[:] = qvel
    mujoco.mj_forward(m, d)

    st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
    print(f"--- {name} ---")
    print("xpos err:", np.abs(np.asarray(st.xpos) - d.xpos).max())
    qerr = np.minimum(np.abs(np.asarray(st.xquat) - d.xquat).max(axis=-1),
                      np.abs(np.asarray(st.xquat) + d.xquat).max(axis=-1))
    print("xquat err:", qerr.max())

    I, _ = eng._spatial_inertias(pm, st.xpos, st.xquat, jnp.float64)
    M = eng.mass_matrix(pm, st.S, I)
    Mref = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mref)
    print("M err:", np.abs(np.asarray(M) - Mref).max(), " (scale", np.abs(Mref).max(), ")")

    bias = eng.bias_forces(pm, st.S, I, st.body_vel, st.qvel)
    print("bias err:", np.abs(np.asarray(bias) - d.qfrc_bias).max(),
          " (scale", np.abs(d.qfrc_bias).max(), ")")

    # cvel comparison (mujoco cvel: rot then lin, at body com-ish frame)
    # check linear velocity of body origins via finite differences instead
    ctrl = rng.uniform(-1, 1, m.nu)
    st2 = step(pm, st, jnp.asarray(ctrl))
    d.ctrl[:] = ctrl
    mujoco.mj_step(m, d)
    print("step qpos err:", np.abs(np.asarray(st2.qpos) - d.qpos).max())
    print("step qvel err:", np.abs(np.asarray(st2.qvel) - d.qvel).max(),
          " (scale", np.abs(d.qvel).max(), ")")

if __name__ == "__main__":
    for name in sys.argv[1:] or ["cartpole"]:
        check(name)
