"""Contact energy-injection (catapult) regression.

Soft-constraint dynamics store deep penetration as Baumgarte spring energy
and release it ballistically: pre-fix, a humanoid released with its feet
0.35 m below the floor launched to z=3.5 m at 7.9 m/s (both solver tiers) —
the exploit MPPI discovered at K=8192 to "fly" toward the goal (VERDICT r1:
humanoid_walk seed-0 hit max_foot_z = 16 m). The restitution cap
(physics.contact.RESTITUTION_VCAP) allows unlimited braking but bounds the
outward push so separation velocity cannot exceed the cap per row; the
same release now rises gently to stance height.

Round 3: the tiers cap differently. The planner/penalty tier keeps the
tight 0.5 m/s cap (MPPI must not be able to seek slam energy). The
environment (coupled Newton) tier uses RESTITUTION_VCAP_ENV = 2.0 m/s so
that MuJoCo-legitimate deep-stance arefs on the golden replays stay
uncapped (tests/test_golden_reference.py tightened to max<=2e-3 as a
result) while a foot-slam bounce stays bounded at ~0.2 m ballistic height
vs the uncapped 3.3+ m.
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
    # calibrated post-fix (uncapped: 7.4-7.9 m/s, z > 3.3): penalty tier
    # 0.64 m/s under its 0.5 cap; coupled tier ~1.99 m/s under the 2.0
    # env cap. Thresholds leave headroom for solver-iteration jitter.
    vz_limit = 1.2 if solver == "penalty" else 2.4
    assert max_vz < vz_limit, f"{solver}: catapult velocity {max_vz}"
    assert max_z < 1.6, f"{solver}: ballistic height {max_z}"
    assert np.isfinite(np.asarray(st.qpos)).all()


@pytest.mark.parametrize("solver", ["penalty", "coupled"])
def test_deep_limit_violation_release_bounded(solver):
    """A joint released from deep limit violation must not be launched by
    the limit spring (round-2 advisor ask: the coupled tier removes the
    restitution cap from limit rows — MuJoCo's oracle has none — so the
    'limits cannot launch the robot' claim needs its own regression).

    Cartpole slider limit (range +-1 m): start 0.3 m beyond the limit at
    rest. The limit spring ejects the cart back inside the range; the
    post-release velocity must stay physically modest (MuJoCo C measures
    ~1.1 m/s for this release; uncontrolled Baumgarte springs would give
    arbitrarily large eject velocities for deeper violations)."""
    model = build_from_mjcf(os.path.join(ASSETS, "cartpole.xml"))
    qpos = np.array(model.qpos0, dtype=np.float64)
    qpos[0] = 1.3            # slider range is +-1
    st = forward(model, jnp.asarray(qpos), jnp.zeros(model.nv))
    stepj = jax.jit(lambda s: step(model, s, jnp.zeros(model.nu),
                                   solver=solver))
    max_v = 0.0
    for _ in range(100):
        st = stepj(st)
        max_v = max(max_v, abs(float(st.qvel[0])))
    assert np.isfinite(np.asarray(st.qpos)).all()
    assert max_v < 2.5, f"{solver}: limit eject velocity {max_v}"
    assert abs(float(st.qpos[0])) < 1.3, "cart did not move back inside"
