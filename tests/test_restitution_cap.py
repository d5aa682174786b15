"""Contact energy-injection (catapult) regression.

Soft-constraint dynamics store deep penetration as Baumgarte spring energy
and release it ballistically: pre-fix, a humanoid released with its feet
0.35 m below the floor launched to z=3.5 m at 7.9 m/s (both solver tiers) —
the exploit MPPI discovered at K=8192 to "fly" toward the goal (VERDICT r1:
humanoid_walk seed-0 hit max_foot_z = 16 m). The restitution cap
(physics.contact.RESTITUTION_VCAP) allows unlimited braking but bounds the
outward push so separation velocity cannot exceed ~0.5 m/s per row; the
same release now rises gently to stance height.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step

ASSETS = os.path.join(os.path.dirname(__file__), "..",
                      "humanoid_mppi_rl_tpu", "assets")


@pytest.mark.parametrize("solver", ["penalty", "coupled"])
def test_deep_penetration_release_does_not_catapult(solver):
    model = build_from_mjcf(os.path.join(ASSETS, "humanoid.xml"))
    qpos = np.array(model.qpos0, dtype=np.float64)
    qpos[2] -= 0.35          # feet ~0.35 m below the floor
    st = forward(model, jnp.asarray(qpos), jnp.zeros(model.nv))
    stepj = jax.jit(lambda s: step(model, s, jnp.zeros(model.nu),
                                   solver=solver))
    max_vz, max_z = -np.inf, -np.inf
    for _ in range(60):
        st = stepj(st)
        max_vz = max(max_vz, float(st.qvel[2]))
        max_z = max(max_z, float(st.qpos[2]))
    # calibrated post-fix: 0.49/0.64 m/s and z <= 1.13 (uncapped: 7.4-7.9 m/s,
    # z > 3.3); thresholds leave headroom for solver-iteration jitter
    assert max_vz < 1.2, f"{solver}: catapult velocity {max_vz}"
    assert max_z < 1.35, f"{solver}: ballistic height {max_z}"
    assert np.isfinite(np.asarray(st.qpos)).all()
