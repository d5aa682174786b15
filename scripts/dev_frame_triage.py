"""Row-level comparison of our coupled QP vs MuJoCo's efc arrays on a
single golden frame (default: the current ladder max). Prints per-row
J^T f torque mismatch and the efc quantities that drive it."""

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
    from humanoid_mppi_rl_tpu.physics import engine

    frame = int(sys.argv[1]) if len(sys.argv) > 1 else 1063
    states = np.loadtxt(os.path.join(REF_RUN, "states.csv"), delimiter=",")
    actions = np.loadtxt(os.path.join(REF_RUN, "actions.csv"), delimiter=",")
    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    pm = build_from_mjcf(asset, include_self_collisions=True)
    m = mujoco.MjModel.from_xml_path(asset)
    d = mujoco.MjData(m)

    qpos, qvel, u = states[frame, :28], states[frame, 28:55], actions[frame]
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = u
    mujoco.mj_forward(m, d)
    print(f"frame {frame}: mj nefc={d.nefc} ncon={d.ncon}")
    for c in range(d.ncon):
        con = d.contact[c]
        g1, g2 = con.geom1, con.geom2
        print(f"  mj contact {c}: geoms ({g1},{g2}) dist {con.dist:+.5f} "
              f"pos {np.array2string(con.pos, precision=4)} dim {con.dim}")
    # mj efc rows: type 0=cfrc? use efc_type: 0 constraint types
    mjf = d.efc_force.copy()
    mjJ = d.efc_J.reshape(d.nefc, m.nv).copy()
    tau_mj = mjJ.T @ mjf
    print("  mj efc_aref:", np.array2string(d.efc_aref[:d.nefc], precision=3))
    print("  mj force   :", np.array2string(mjf, precision=3))

    dbg = {}
    engine._COUPLED_DEBUG = dbg
    _ = step(pm, forward(pm, jnp.asarray(qpos), jnp.asarray(qvel)),
             jnp.asarray(u))
    engine._COUPLED_DEBUG = None
    J = np.asarray(dbg["J"])
    f = np.asarray(dbg["f"])
    act = np.asarray(dbg["active"]) > 0
    aref = np.asarray(dbg["aref"])
    print(f"  ours: C={J.shape[0]} active={act.sum()}")
    print("  our aref (active):", np.array2string(aref[act], precision=3))
    print("  our force (active):", np.array2string(f[act], precision=3))
    tau_ours = J.T @ f
    dtau = tau_ours - tau_mj
    print("  |tau_ours - tau_mj| by dof:")
    for i in np.argsort(np.abs(dtau))[::-1][:8]:
        print(f"    dof {i:2d}: ours {tau_ours[i]:+9.3f} mj {tau_mj[i]:+9.3f} "
              f"diff {dtau[i]:+9.3f}")

    # one-step error recap
    mujoco.mj_step(m, d)
    st = step(pm, forward(pm, jnp.asarray(qpos), jnp.asarray(qvel)),
              jnp.asarray(u))
    err = np.abs(np.asarray(st.qpos) - d.qpos)
    print(f"  one-step qpos err max {err.max():.3e} at qpos idx {err.argmax()}")


if __name__ == "__main__":
    main()


def detail(frame=216):
    import mujoco
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
    from humanoid_mppi_rl_tpu.physics import engine
    states = np.loadtxt(os.path.join(REF_RUN, "states.csv"), delimiter=",")
    actions = np.loadtxt(os.path.join(REF_RUN, "actions.csv"), delimiter=",")
    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    pm = build_from_mjcf(asset, include_self_collisions=True)
    m = mujoco.MjModel.from_xml_path(asset)
    d = mujoco.MjData(m)
    qpos, qvel, u = states[frame, :28], states[frame, 28:55], actions[frame]
    d.qpos[:] = qpos; d.qvel[:] = qvel; d.ctrl[:] = u
    mujoco.mj_forward(m, d)
    print("mj efc_type:", d.efc_type[:d.nefc])
    print("mj efc_id  :", d.efc_id[:d.nefc])
    print("mj efc_R   :", np.array2string(d.efc_R[:d.nefc], precision=6))

    mjJ = d.efc_J.reshape(d.nefc, m.nv)
    Minv_mj = np.zeros((m.nv, m.nv))
    mujoco.mj_solveM(m, d, Minv_mj, np.eye(m.nv))
    A_mj = mjJ @ Minv_mj @ mjJ.T
    print("mj true Adiag:", np.array2string(np.diag(A_mj), precision=6))
    print("mj efc_force:", np.array2string(d.efc_force[:d.nefc], precision=4))
    print("mj efc_aref:", np.array2string(d.efc_aref[:d.nefc], precision=4))
    print("mj qacc_smooth Jrow:", np.array2string(mjJ @ d.qacc_smooth, precision=4))

    dbg = {}
    engine._COUPLED_DEBUG = dbg
    _ = step(pm, forward(pm, jnp.asarray(qpos), jnp.asarray(qvel)),
             jnp.asarray(u))
    engine._COUPLED_DEBUG = None
    act = np.asarray(dbg["active"]) > 0
    print("ours Adiag(act):", np.array2string(np.asarray(dbg["Adiag"])[act], precision=6))
    print("ours R(act)    :", np.array2string(np.asarray(dbg["R"])[act], precision=6))
    print("ours aref(act) :", np.array2string(np.asarray(dbg["aref"])[act], precision=4))
    print("ours rhs(act)  :", np.array2string(np.asarray(dbg["rhs"])[act], precision=4))
    print("ours f(act)    :", np.array2string(np.asarray(dbg["f"])[act], precision=4))
    print("ours d(act)    :", np.array2string(np.asarray(dbg["d"])[act], precision=6))
