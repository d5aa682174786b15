"""LQR baseline: stabilize the cartpole upright (reference
examples/cartpole_lqr.jl behavior: FD linearization + Riccati -> the pole
stays up from a small perturbation)."""

import numpy as np

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
from humanoid_mppi_rl_tpu.solver.lqr import make_lqr_controller

import os

ASSET = os.path.join(os.path.dirname(__file__), "..",
                     "humanoid_mppi_rl_tpu", "assets", "cartpole.xml")


def test_lqr_stabilizes_cartpole_upright():
    pm = build_from_mjcf(ASSET)
    qpos0 = np.zeros(pm.nq)  # upright
    ctrl, (A, B, K) = make_lqr_controller(
        pm, qpos0, Q=np.diag([10.0, 100.0, 1.0, 1.0]), R=0.1 * np.eye(1))
    assert np.isfinite(np.asarray(K)).all()

    st = forward(pm, jnp.asarray([0.1, 0.15]), jnp.asarray([0.0, 0.0]))

    @jax.jit
    def run(st):
        def body(s, _):
            u = ctrl(s)
            return step(pm, s, u), s.qpos[1]
        return jax.lax.scan(body, st, None, length=400)

    s_final, thetas = run(st)
    assert abs(float(s_final.qpos[1])) < 0.02, float(s_final.qpos[1])
    assert abs(float(s_final.qpos[0])) < 0.1


HUMANOID = os.path.join(os.path.dirname(__file__), "..",
                        "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")


def test_humanoid_stand_setpoint_calibration():
    """Reference src/humanoid_lqr.jl:19-65: the height sweep finds an offset
    where the unactuated root-z inverse-dynamics force nearly vanishes, and
    the actuator-moment pseudoinverse reproduces qfrc0 exactly on actuated
    dofs (fully-actuated below the free joint)."""
    from humanoid_mppi_rl_tpu.solver.lqr import stand_setpoint

    model = build_from_mjcf(HUMANOID)
    qpos0, ctrl0, info = stand_setpoint(model, n_heights=201)
    weight = float(model.body_mass.sum() * 9.81)
    # fictitious vertical force at the calibrated height is tiny vs weight
    assert abs(info["u_vert"]).min() < 0.02 * weight
    # the sweep actually spans a sign change (force goes pull -> push)
    assert info["u_vert"].min() < 0 < info["u_vert"].max()
    # actuated rows of qfrc0 are matched to machine precision
    assert abs(info["residual"][6:]).max() < 1e-8
    # torque setpoint is within the humanoid ctrl range
    assert np.abs(ctrl0).max() <= 1.0


def test_humanoid_lqr_stands_on_one_leg():
    """Full reference pipeline (src/humanoid_lqr.jl): calibrated setpoint +
    balance Q + exact linearization + DARE gain keeps the one-leg stand
    upright for 1 s of sim."""
    from humanoid_mppi_rl_tpu.solver.lqr import make_humanoid_lqr

    model = build_from_mjcf(HUMANOID)
    controller, d = make_humanoid_lqr(model, n_heights=101)
    A, B, K = d["mats"]
    assert np.isfinite(np.asarray(A)).all()
    assert np.isfinite(np.asarray(K)).all()
    # LQR feedback must shrink the unstable open-loop spectrum to ~1
    sr_open = np.abs(np.linalg.eigvals(np.asarray(A))).max()
    sr_closed = np.abs(np.linalg.eigvals(
        np.asarray(A) - np.asarray(B) @ np.asarray(K))).max()
    assert sr_open > 1.01 and sr_closed < 1.001

    @jax.jit
    def run(st):
        def body(s, _):
            return step(model, s, controller(s)), s.qpos[2]
        return jax.lax.scan(body, st, None, length=200)

    st0 = forward(model, jnp.asarray(d["qpos0"]), jnp.zeros(model.nv))
    s_final, _ = run(st0)
    z0 = float(d["qpos0"][2])
    assert abs(float(s_final.qpos[2]) - z0) < 0.08
    assert float(jnp.abs(s_final.qvel).max()) < 0.5
