"""Frame-level triage: compare our Newton constraint solve against mjData
(qacc, efc_force) on single golden frames."""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco

from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward
from humanoid_mppi_rl_tpu.physics import engine as eng
from humanoid_mppi_rl_tpu.physics import newton as nwt

ASSET = "humanoid_mppi_rl_tpu/assets/go1.xml"

m = mujoco.MjModel.from_xml_path(ASSET)
d = mujoco.MjData(m)
pm = build_from_mjcf(ASSET, include_self_collisions=True)

rd = "/root/reference/Humanoid_MPPI-RL/quad_data_goal/2025-05-05_211729/run_000"
s = np.loadtxt(rd + "/states0.csv", delimiter=",")
a = np.loadtxt(rd + "/actions0.csv", delimiter=",")
x0 = s[0::2]
u = a[0::2]

frames = [int(x) for x in sys.argv[1:]] or [5, 20, 50, 200]

for i in frames:
    d.qpos[:] = x0[i, :19]
    d.qvel[:] = x0[i, 19:]
    d.ctrl[:] = u[i]
    mujoco.mj_forward(m, d)
    st = forward(pm, jnp.asarray(x0[i, :19]), jnp.asarray(x0[i, 19:]))
    dtype = st.qpos.dtype
    I, _ = eng._spatial_inertias(pm, st.xpos, st.xquat, dtype)
    M = eng.mass_matrix(pm, st.S, I)
    bias = eng.bias_forces(pm, st.S, I, st.body_vel, st.qvel)
    tau = eng._actuator_forces(pm, st.qpos, st.qvel, jnp.asarray(u[i]))
    tau_p, _ = eng._passive_forces(pm, st.qpos, st.qvel, frictionloss=False)
    f = tau + tau_p - bias
    qacc0 = jnp.linalg.solve(M, f)
    print(f"=== frame {i}: mj nefc {d.nefc}")
    print("  qacc_smooth err:", float(np.abs(np.asarray(qacc0) - d.qacc_smooth).max()))
    rows = nwt.build_rows(pm, st, st.S, dtype)
    x, frc = nwt.solve_qacc(pm, M, qacc0, rows)
    qacc_err = np.abs(np.asarray(x) - d.qacc)
    print(f"  qacc err: max {qacc_err.max():.3e} argmax {qacc_err.argmax()}")
    print(f"  rows: C={rows.J.shape[0]} ineq={rows.n_ineq} fric={rows.n_fric} "
          f"blocks={[(b['dim'], b['nb']) for b in rows.blocks]}")
    print("  mj efc force (type,id,force):")
    for r in range(d.nefc):
        print(f"    {int(d.efc_type[r])},{int(d.efc_id[r])}: "
              f"f={d.efc_force[r]:.4f} aref={d.efc_aref[r]:.4f} "
              f"R={d.efc_R[r]:.4e}")
    # our friction rows
    frc = np.asarray(frc)
    act = np.asarray(rows.active)
    af = np.asarray(rows.aref)
    Rr = np.asarray(rows.R)
    print("  ours (first ineq+fric rows, active only):")
    for r in range(rows.n_ineq + rows.n_fric):
        if act[r]:
            print(f"    row{r}{'F' if r >= rows.n_ineq else 'I'}: "
                  f"f={frc[r]:.4f} aref={af[r]:.4f} R={Rr[r]:.4e}")
    for blk in rows.blocks:
        start, nb, dim = blk["start"], blk["nb"], blk["dim"]
        for b in range(nb):
            sl = slice(start + b * dim, start + (b + 1) * dim)
            if act[sl.start]:
                print(f"    blk{dim} @{sl.start}: f={np.round(frc[sl], 4)} "
                      f"aref={np.round(af[sl], 3)} R={Rr[sl]}")
