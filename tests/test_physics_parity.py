"""Engine-vs-MuJoCo oracle parity tests.

The reference trusts MuJoCo C stepping outright (reference
src/cartpole_mppi.py:73); our JAX engine is validated against that same
oracle: forward kinematics, mass matrix, bias forces, and full smooth steps
must match to near machine precision on constraint-free states; contact
states get a qualitative stability check (penalty model vs constraint
solver — SURVEY.md §7 tolerance ladder).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
from humanoid_mppi_rl_tpu.physics import engine as eng

mujoco = pytest.importorskip("mujoco")

ASSETS = os.path.join(os.path.dirname(__file__), "..", "humanoid_mppi_rl_tpu", "assets")
MODELS = ["cartpole", "hopper", "humanoid", "go1"]


def _free_state(m, seed=0):
    """Random state away from limits and the floor (constraint-free)."""
    rng = np.random.default_rng(seed)
    qpos = m.qpos0 + rng.normal(0, 0.3, m.nq)
    for j in range(m.njnt):
        jt = int(m.jnt_type[j])
        adr = m.jnt_qposadr[j]
        if jt == 0:
            q = qpos[adr + 3 : adr + 7]
            qpos[adr + 3 : adr + 7] = q / np.linalg.norm(q)
            qpos[adr + 2] += 1.0
        elif m.jnt_limited[j]:
            # small perturbation, clamped inside the range (large ones can
            # activate joint/tendon limit constraints, e.g. the humanoid
            # hamstring tendons)
            lo, hi = m.jnt_range[j]
            qpos[adr] = m.qpos0[adr] + 0.3 * (qpos[adr] - m.qpos0[adr])
            qpos[adr] = np.clip(qpos[adr], lo + 0.15 * (hi - lo), hi - 0.15 * (hi - lo))
        elif jt == 2 and abs(m.jnt_axis[j][2]) > 0.9:
            qpos[adr] += 1.0
    qvel = rng.normal(0, 0.5, m.nv)
    return qpos, qvel


@pytest.fixture(scope="module", params=MODELS)
def setup(request):
    path = os.path.join(ASSETS, f"{request.param}.xml")
    m = mujoco.MjModel.from_xml_path(path)
    pm = build_from_mjcf(path)
    return request.param, m, pm


def test_kinematics_parity(setup):
    name, m, pm = setup
    d = mujoco.MjData(m)
    for seed in range(3):
        qpos, qvel = _free_state(m, seed)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(m, d)
        st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
        np.testing.assert_allclose(np.asarray(st.xpos), d.xpos, atol=1e-10)
        qerr = np.minimum(
            np.abs(np.asarray(st.xquat) - d.xquat).max(axis=-1),
            np.abs(np.asarray(st.xquat) + d.xquat).max(axis=-1),
        )
        assert qerr.max() < 1e-10


def test_mass_matrix_and_bias_parity(setup):
    name, m, pm = setup
    d = mujoco.MjData(m)
    qpos, qvel = _free_state(m, 1)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
    I, _ = eng._spatial_inertias(pm, st.xpos, st.xquat, jnp.float64)
    M = eng.mass_matrix(pm, st.S, I)
    Mref = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mref)
    np.testing.assert_allclose(np.asarray(M), Mref, atol=1e-9)
    bias = eng.bias_forces(pm, st.S, I, st.body_vel, st.qvel)
    np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-8)


def test_smooth_step_parity(setup):
    """Full step matches mj_step exactly when no constraints are active
    (frictionloss zeroed on both sides: mujoco solves it as a constraint,
    we use a smooth approximation)."""
    import dataclasses

    name, m, pm = setup
    m.dof_frictionloss[:] = 0
    # disable the constraint pass: random poses can produce body-body
    # self-contacts which our round-1 pair set deliberately excludes
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
    pm = dataclasses.replace(pm, dof_frictionloss=np.zeros(m.nv))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(7)
    qpos, qvel = _free_state(m, 2)
    ctrl = rng.uniform(-0.8, 0.8, m.nu)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    mujoco.mj_step(m, d)
    st = step(pm, forward(pm, jnp.asarray(qpos), jnp.asarray(qvel)), jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-9)


def test_contact_sim_stable(setup):
    """Penalty-contact rollout from rest stays finite and near the floor."""
    import jax

    name, m, pm = setup
    if not pm.contact_pairs:
        pytest.skip("no contacts in model")
    qpos = m.key_qpos[0].copy() if m.nkey and name == "go1" else m.qpos0.copy()
    st0 = forward(pm, jnp.asarray(qpos), jnp.zeros(m.nv))
    u = jnp.zeros(m.nu)

    @jax.jit
    def run(st):
        def body(s, _):
            return step(pm, s, u), None
        s, _ = jax.lax.scan(body, st, None, length=400)
        return s

    s = run(st0)
    assert bool(jnp.all(jnp.isfinite(s.qpos)))
    assert bool(jnp.all(jnp.isfinite(s.qvel)))
    # free-root models: root stays above ground (no tunnelling), below 2x start
    if int(m.jnt_type[0]) == 0:
        z = float(s.qpos[2])
        assert -0.05 < z < 3.0


def test_self_collision_narrowphase_vs_mujoco():
    """Body-body (self) contact narrowphase and the coupled constraint QP
    track mj_step on a two-capsule toy model (contact.py::_self_rows:
    segment-segment closest points, oracle frame conventions, pyramidal
    cone rows)."""
    mujoco = pytest.importorskip("mujoco")
    import jax

    xml = """
    <mujoco>
      <option timestep="0.005"/>
      <worldbody>
        <body name="a" pos="0 0 1"><freejoint/>
          <geom name="ga" type="capsule" size="0.05 0.2" mass="1"/>
        </body>
        <body name="b" pos="0.0 0.02 1.28"><freejoint/>
          <geom name="gb" type="capsule" size="0.06 0.15" euler="0 60 0" mass="1"/>
        </body>
      </worldbody>
    </mujoco>
    """
    pm = build_from_mjcf(xml=xml, include_self_collisions=True)
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)

    step_j = jax.jit(lambda qp, qv: step(pm, forward(pm, qp, qv),
                                         jnp.zeros(pm.nu)))
    rng = np.random.default_rng(0)
    errs = []
    for _ in range(5):
        qpos = np.asarray(pm.qpos0, float).copy()
        qpos[:3] += rng.normal(0, 0.01, 3)
        qvel = rng.normal(0, 0.2, pm.nv)
        st = step_j(jnp.asarray(qpos), jnp.asarray(qvel))
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = 0
        mujoco.mj_step(m, d)
        assert d.ncon >= 1          # the pose interpenetrates by design
        errs.append(np.abs(np.asarray(st.qpos) - d.qpos).max())
    assert np.median(errs) < 2e-3, errs


def test_solver_tiers_agree_free_flight():
    """Both constraint tiers reduce to the identical smooth dynamics when no
    constraint is active."""
    import jax

    asset = os.path.join(ASSETS, "humanoid.xml")
    pm = build_from_mjcf(asset)
    qpos = np.asarray(pm.qpos0, float).copy()
    qpos[2] += 1.0                  # airborne: no contacts, no limits
    qvel = np.zeros(pm.nv)
    st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
    u = jnp.zeros(pm.nu)
    a = step(pm, st, u, solver="coupled")
    b = step(pm, st, u, solver="penalty")
    np.testing.assert_allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.qvel), np.asarray(b.qvel),
                               atol=1e-10)


BALL_CHAIN_XML = """
<mujoco model="ball_chain">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="base" pos="0 0 2">
      <joint name="root" type="free"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" density="800"/>
      <body name="link1" pos="0.3 0 0">
        <joint name="b1" type="ball" pos="0 0 0" damping="0.02" armature="0.01"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035" density="700"/>
        <body name="link2" pos="0.25 0 0">
          <joint name="b2" type="ball" pos="0 0 0" damping="0.02"/>
          <geom type="capsule" fromto="0 0 0 0.2 0.05 -0.05" size="0.03"/>
          <body name="tip" pos="0.2 0.05 -0.05">
            <joint name="h1" type="hinge" axis="0 1 0" damping="0.01"/>
            <geom type="sphere" size="0.05" density="500"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _ball_state(m, seed=0):
    rng = np.random.default_rng(seed)
    qpos = m.qpos0.copy()
    d = mujoco.MjData(m)
    for j in range(m.njnt):
        jt, adr = int(m.jnt_type[j]), int(m.jnt_qposadr[j])
        if jt == 0:       # free
            qpos[adr:adr + 3] += rng.normal(0, 0.2, 3)
            q = rng.normal(size=4)
            qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
        elif jt == 1:     # ball
            q = rng.normal(size=4)
            qpos[adr:adr + 4] = q / np.linalg.norm(q)
        else:
            qpos[adr] += rng.normal(0, 0.3)
    qvel = rng.normal(0, 0.6, m.nv)
    return qpos, qvel


def test_ball_joint_kinematics_parity():
    """FK (xpos/xquat) of a free+ball+ball+hinge chain vs mj_kinematics."""
    m = mujoco.MjModel.from_xml_string(BALL_CHAIN_XML)
    pm = build_from_mjcf(xml=BALL_CHAIN_XML)
    d = mujoco.MjData(m)
    qpos, qvel = _ball_state(m, 3)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
    np.testing.assert_allclose(np.asarray(st.xpos), d.xpos, atol=1e-12)
    ours = np.asarray(st.xquat)
    qd = np.minimum(np.abs(ours - d.xquat).max(axis=-1),
                    np.abs(ours + d.xquat).max(axis=-1))  # q == -q
    np.testing.assert_allclose(qd, 0, atol=1e-10)


def test_ball_joint_step_parity():
    """5 smooth steps of the ball chain match mj_step to near machine
    precision (mass matrix, bias, implicit joint damping, expmap
    integration all exercised through the ball dofs)."""
    m = mujoco.MjModel.from_xml_string(BALL_CHAIN_XML)
    pm = build_from_mjcf(xml=BALL_CHAIN_XML)
    d = mujoco.MjData(m)
    qpos, qvel = _ball_state(m, 11)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
    for _ in range(5):
        mujoco.mj_step(m, d)
        st = step(pm, st, jnp.zeros(pm.nu))
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-10)


def test_ball_joint_limits_supported():
    """Ball rotation limits load as penalty-tier constraint rows (round-4:
    previously a loud guard; see tests/test_engine_generality.py for the
    behavioral parity checks on arm5)."""
    limited = BALL_CHAIN_XML.replace(
        '<joint name="b2" type="ball" pos="0 0 0" damping="0.02"/>',
        '<joint name="b2" type="ball" pos="0 0 0" limited="true" '
        'range="0 60"/>')
    pm = build_from_mjcf(xml=limited)
    assert len(pm.ball_limits) == 1
    (dofadr, qadr, max_angle, solref, solimp, meff) = pm.ball_limits[0]
    assert abs(max_angle - np.deg2rad(60)) < 1e-9
    assert meff > 0


# bodies stacking several joints incl. a ball: hinge->ball->slide in one body
# and ball->slide in its child. MuJoCo's compiler forbids ball-followed-by-
# rotation in a body, so these are the legal multi-joint ball orderings
# (ADVICE r3: the ball dofs' Sdot predecessor set must stop at the ball —
# a trailing same-body slide must NOT enter its cdofdot, per mj_comVel's
# dof-ordered cvel accumulation).
MULTI_JOINT_BALL_XML = """
<mujoco>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0" pos="0 0.02 0"/>
      <joint type="ball" pos="0.05 0 0.1"/>
      <joint type="slide" axis="0 0 1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="1"/>
      <body pos="0.3 0 0">
        <joint type="ball" pos="0 0 0.01"/>
        <joint type="slide" axis="1 0 0"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03" mass="0.5"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_multi_joint_ball_body_parity():
    """Bias forces and 5 full steps match MuJoCo when a ball joint shares a
    body with other joints (regression: pred_mask used the whole-body
    ancestor row for ball dofs, leaking a trailing slide's velocity into the
    ball Sdot — 0.21 abs bias error on this model before the fix)."""
    m = mujoco.MjModel.from_xml_string(MULTI_JOINT_BALL_XML)
    pm = build_from_mjcf(xml=MULTI_JOINT_BALL_XML)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    qpos = m.qpos0.copy()
    qpos[0] = 0.4
    q = rng.normal(0, 0.3, 4)
    qpos[1:5] = q / np.linalg.norm(q)
    qpos[5] = 0.1
    q = rng.normal(0, 0.3, 4)
    qpos[6:10] = q / np.linalg.norm(q)
    qpos[10] = -0.2
    d.qpos[:] = qpos
    d.qvel[:] = rng.normal(0, 0.5, m.nv)
    mujoco.mj_forward(m, d)
    xpos, xquat, S = eng._fk(pm, jnp.asarray(qpos))
    I, xipos = eng._spatial_inertias(pm, xpos, xquat, jnp.float64)
    qv = jnp.asarray(d.qvel.copy())
    V = eng.body_velocities(pm, S, qv)
    bias = eng.bias_forces(pm, S, I, V, qv)
    np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-9)
    st = forward(pm, jnp.asarray(qpos), qv)
    for _ in range(5):
        mujoco.mj_step(m, d)
        st = step(pm, st, jnp.zeros(pm.nu))
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-10)
