"""Triage the golden-ladder tail: is the remaining max error PGS
convergence, or model mismatch?  For the worst frames, compare
(a) n_iter=25 vs n_iter=200, and (b) the PGS force vs an exact
block-pivoting active-set solve of the same QP. Run on CPU f64."""

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

    states = np.loadtxt(os.path.join(REF_RUN, "states.csv"), delimiter=",")
    actions = np.loadtxt(os.path.join(REF_RUN, "actions.csv"), delimiter=",")
    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    pm = build_from_mjcf(asset, include_self_collisions=True)
    m = mujoco.MjModel.from_xml_path(asset)
    d = mujoco.MjData(m)

    step25 = jax.jit(lambda qp, qv, u: step(pm, forward(pm, qp, qv), u).qpos)
    step200 = jax.jit(lambda qp, qv, u: step(
        pm, forward(pm, qp, qv), u, n_iter=200).qpos)

    idxs = np.arange(2, min(1400, states.shape[0] - 1))
    e25, e200 = [], []
    for i in idxs:
        qpos, qvel, u = states[i, :28], states[i, 28:55], actions[i]
        a25 = np.asarray(step25(jnp.asarray(qpos), jnp.asarray(qvel),
                                jnp.asarray(u)))
        a200 = np.asarray(step200(jnp.asarray(qpos), jnp.asarray(qvel),
                                  jnp.asarray(u)))
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = u
        mujoco.mj_step(m, d)
        e25.append(np.abs(a25 - d.qpos).max())
        e200.append(np.abs(a200 - d.qpos).max())
    e25 = np.asarray(e25)
    e200 = np.asarray(e200)
    print(f"n_iter=25 : median {np.median(e25):.3e} p90 "
          f"{np.percentile(e25, 90):.3e} max {e25.max():.3e}")
    print(f"n_iter=200: median {np.median(e200):.3e} p90 "
          f"{np.percentile(e200, 90):.3e} max {e200.max():.3e}")
    worst = np.argsort(e25)[::-1][:12]
    print("worst frames (idx, e25, e200):")
    for w in worst:
        print(f"  frame {idxs[w]:5d}  e25 {e25[w]:.3e}  e200 {e200[w]:.3e}")

    # exact QP on the worst frame: block-pivoting active-set vs PGS force
    fr = idxs[worst[0]]
    qpos, qvel, u = states[fr, :28], states[fr, 28:55], actions[fr]
    dbg = {}
    engine._COUPLED_DEBUG = dbg
    _ = step(pm, forward(pm, jnp.asarray(qpos), jnp.asarray(qvel)),
             jnp.asarray(u))
    engine._COUPLED_DEBUG = None
    A = np.asarray(dbg["Amat"])
    R = np.asarray(dbg["R"])
    rhs = np.asarray(dbg["rhs"])
    act = np.asarray(dbg["active"]) > 0
    f_pgs = np.asarray(dbg["f"])
    # block pivoting on active rows only
    n = A.shape[0]
    H = A + np.diag(R)
    f = np.zeros(n)
    S = act.copy()
    for _ in range(40):
        fs = np.zeros(n)
        if S.any():
            fs[S] = np.linalg.solve(H[np.ix_(S, S)], rhs[S])
        grad = H @ fs - rhs
        neg = S & (fs < -1e-12)
        add = act & ~S & (grad < -1e-12)
        if not neg.any() and not add.any():
            f = np.maximum(fs, 0.0)
            break
        S = S & ~neg | add
        f = np.maximum(fs, 0.0)
    obj = lambda x: 0.5 * x @ H @ x - x @ rhs
    print(f"frame {fr}: QP obj pgs {obj(f_pgs):.6e}  exact {obj(f):.6e}  "
          f"|f_pgs-f_exact|_inf {np.abs(f_pgs - f).max():.3e}  "
          f"|f|_inf {np.abs(f).max():.3e}")


if __name__ == "__main__":
    main()
