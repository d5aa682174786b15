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
