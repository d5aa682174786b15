"""Engine generality beyond the four task robots (round-3 VERDICT missing-2).

assets/arm5.xml is the fifth robot: ball joints with quaternion springs and
rotation-angle limits, motor actuators on ball and free joints (multi-dof
gear), and MESH collision geoms against the floor — every feature the task
models never exercise, validated against the MuJoCo C oracle.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step

XML = os.path.join(os.path.dirname(__file__), "..", "humanoid_mppi_rl_tpu",
                   "assets", "arm5.xml")


@pytest.fixture(scope="module")
def models():
    m = mujoco.MjModel.from_xml_path(XML)
    pm = build_from_mjcf(XML)
    return m, pm


def _small_quat(rng, mag=0.2):
    v = rng.normal(size=3) * mag
    a = np.linalg.norm(v)
    return np.concatenate([[np.cos(a / 2)], v / max(a, 1e-12) * np.sin(a / 2)])


def _smooth_state(m, rng):
    """A state with no contacts or limit activity: arm within range, crate
    high in the air."""
    qpos = m.qpos0.copy()
    qpos[0:4] = _small_quat(rng)
    qpos[4] = float(rng.uniform(-0.8, 0.0))
    qpos[5:9] = _small_quat(rng)
    qpos[11] = 1.0 + float(rng.uniform(0, 0.5))
    qvel = rng.normal(size=m.nv) * 0.3
    return qpos, qvel


def test_arm5_features_load(models):
    _, pm = models
    assert len(pm.ball_springs) == 2          # shoulder + wrist
    assert len(pm.ball_limits) == 1           # shoulder 70 deg
    assert sorted(a.ndof for a in pm.actuators) == [1, 3, 3, 6]
    assert sum(1 for g in pm.geoms if g.mesh_verts is not None) == 2
    assert len(pm.contact_pairs) == 2         # plane-vs-mesh only


def test_smooth_one_step_parity(models):
    """Ball springs, ball/free motors, quaternion integration: one step vs
    MuJoCo C at machine-ish precision on contact-free states."""
    m, pm = models
    rng = np.random.default_rng(0)
    for trial in range(5):
        qpos, qvel = _smooth_state(m, rng)
        ctrl = rng.normal(size=m.nu) * 0.5
        d = mujoco.MjData(m)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
        st2 = step(pm, st, jnp.asarray(ctrl))
        np.testing.assert_allclose(np.asarray(st2.qpos), d.qpos,
                                   atol=1e-8, rtol=0)
        np.testing.assert_allclose(np.asarray(st2.qvel), d.qvel,
                                   atol=1e-6, rtol=0)


def test_smooth_trajectory_parity(models):
    """100 steps under sinusoid ctrl, still contact-free: accumulated qpos
    deviation stays tiny."""
    m, pm = models
    rng = np.random.default_rng(1)
    qpos, qvel = _smooth_state(m, rng)
    qvel *= 0.0
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = qvel

    stepj = jax.jit(lambda s, u: step(pm, s, u))
    st = forward(pm, jnp.asarray(qpos), jnp.asarray(qvel))
    for t in range(100):
        ctrl = 0.5 * np.sin(0.05 * t + np.arange(m.nu))
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = stepj(st, jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-6, rtol=0)


def test_mesh_contact_rest_parity(models):
    """Drop everything from qpos0 and settle: the free mesh crate's resting
    height and the spring-loaded arm equilibrium match MuJoCo C."""
    m, pm = models
    d = mujoco.MjData(m)
    for _ in range(1500):
        mujoco.mj_step(m, d)

    stepj = jax.jit(lambda s: step(pm, s, jnp.zeros(m.nu)))
    st = forward(pm, jnp.asarray(m.qpos0.copy()), jnp.zeros(m.nv))
    for _ in range(1500):
        st = stepj(st)
    q = np.asarray(st.qpos)
    assert np.isfinite(q).all()
    # crate rests on the floor at the mesh-support height (measured: both
    # engines settle at 0.0969)
    assert abs(q[11] - d.qpos[11]) < 2e-3, (q[11], d.qpos[11])
    # shoulder spring equilibrium angle
    ang_ours = 2 * np.arccos(np.clip(abs(q[0]), -1, 1))
    ang_mj = 2 * np.arccos(np.clip(abs(d.qpos[0]), -1, 1))
    assert abs(ang_ours - ang_mj) < 5e-3, (ang_ours, ang_mj)


def test_ball_limit_restores(models):
    """From a pose past the 70-degree shoulder limit, the limit force pushes
    the rotation back inside the range (penalty-tier law; MuJoCo treats the
    same violation with its constraint solver)."""
    m, pm = models
    limit = np.deg2rad(70)
    qpos = m.qpos0.copy()
    v = np.array([1.2, 0.3, 0.0])
    a = np.linalg.norm(v)          # 1.236 rad > limit
    qpos[0:4] = np.concatenate([[np.cos(a / 2)], v / a * np.sin(a / 2)])
    stepj = jax.jit(lambda s: step(pm, s, jnp.zeros(m.nu)))
    st = forward(pm, jnp.asarray(qpos), jnp.zeros(m.nv))
    for _ in range(400):
        st = stepj(st)
    ang = 2 * np.arccos(np.clip(abs(float(st.qpos[0])), -1, 1))
    assert np.isfinite(np.asarray(st.qpos)).all()
    assert ang < limit + 1e-3, ang

    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    for _ in range(400):
        mujoco.mj_step(m, d)
    ang_mj = 2 * np.arccos(np.clip(abs(d.qpos[0]), -1, 1))
    # both engines end inside the limit; spring+limit equilibria agree to
    # within the penalty-vs-constraint tier tolerance
    assert abs(ang - ang_mj) < 0.05, (ang, ang_mj)


def test_kernel_path_builds_arm5_and_guards_mesh_pairs():
    """Round-5: arm5 (ball joints, multi-dof motors, plane-vs-mesh) BUILDS
    on the Pallas kernel path; non-plane mesh pairs still refuse loudly."""
    from humanoid_mppi_rl_tpu.ops.kernel_costs import KERNEL_COSTS
    from humanoid_mppi_rl_tpu.ops.rollout_kernel import build_rollout_kernel

    pm = build_from_mjcf(XML)
    rk = build_rollout_kernel(pm, KERNEL_COSTS["arm5"], 4, block_k=8,
                              interpret=True)
    assert callable(rk)
    # a primitive-vs-mesh pair remains array-engine-only on the kernel
    pm2 = build_from_mjcf(xml=MESH_ON_BOX_XML)
    with pytest.raises(NotImplementedError, match="array-engine-only"):
        build_rollout_kernel(pm2, KERNEL_COSTS["cartpole"], 4, block_k=8)


# round-4 follow-up: primitive-vs-mesh narrowphase (vertex ranking against
# the primitive SDF; one side world-static). Cube meshes rest on faces whose
# corners ARE the deepest vertices, so the vertex narrowphase is exact here.
CUBE_MESH = ("0.1 0.1 0.1  0.1 0.1 -0.1  0.1 -0.1 0.1  0.1 -0.1 -0.1  "
             "-0.1 0.1 0.1  -0.1 0.1 -0.1  -0.1 -0.1 0.1  -0.1 -0.1 -0.1")

MESH_ON_BOX_XML = f"""
<mujoco>
  <asset><mesh name="cube" vertex="{CUBE_MESH}"/></asset>
  <worldbody>
    <geom type="box" size="0.5 0.5 0.15" pos="0 0 0.15"/>
    <body pos="0 0 0.45">
      <freejoint/>
      <geom type="mesh" mesh="cube" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

BOX_ON_MESH_XML = f"""
<mujoco>
  <asset><mesh name="cube" vertex="{CUBE_MESH}"/></asset>
  <worldbody>
    <geom type="mesh" mesh="cube" pos="0 0 0.1"/>
    <body pos="0 0 0.32">
      <freejoint/>
      <geom type="box" size="0.14 0.14 0.08" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def _settle_both(xml, steps=1200):
    m = mujoco.MjModel.from_xml_string(xml)
    pm = build_from_mjcf(xml=xml)
    d = mujoco.MjData(m)
    for _ in range(steps):
        mujoco.mj_step(m, d)
    stepj = jax.jit(lambda s: step(pm, s, jnp.zeros(max(m.nu, 0))))
    st = forward(pm, jnp.asarray(m.qpos0.copy()), jnp.zeros(m.nv))
    for _ in range(steps):
        st = stepj(st)
    return m, d, np.asarray(st.qpos), np.asarray(st.qvel)


def test_mesh_on_primitive_rest_parity():
    """A free cube MESH dropped onto a world box settles at the MuJoCo C
    resting height (dynamic-mesh case: rows on the mesh body, +SDF-gradient
    normals)."""
    m, d, q, qv = _settle_both(MESH_ON_BOX_XML)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.05, qv          # actually at rest
    assert abs(q[2] - d.qpos[2]) < 3e-3, (q[2], d.qpos[2])
    assert abs(q[2] - 0.4) < 0.02               # box top 0.3 + half cube 0.1


def test_primitive_on_mesh_rest_parity():
    """A free box dropped onto a world cube MESH settles at the MuJoCo C
    resting height (dynamic-primitive case: rows on the primitive body,
    flipped normals pushing it off the static mesh vertices)."""
    m, d, q, qv = _settle_both(BOX_ON_MESH_XML)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.05, qv
    assert abs(q[2] - d.qpos[2]) < 3e-3, (q[2], d.qpos[2])
    assert abs(q[2] - 0.28) < 0.02              # mesh top 0.2 + half box 0.08


# round-5: mesh-vs-mesh (vertex-vs-hull-SDF both ways) and two-dynamic-body
# mesh pairs (relative-jacobian rows) — these configurations previously
# guarded out (r4 VERDICT missing-3). Small-on-big keeps the contact in the
# clean face regime (small cube's vertices land in the big facet interior).
SMALL_CUBE_MESH = ("0.06 0.06 0.06  0.06 0.06 -0.06  0.06 -0.06 0.06  "
                   "0.06 -0.06 -0.06  -0.06 0.06 0.06  -0.06 0.06 -0.06  "
                   "-0.06 -0.06 0.06  -0.06 -0.06 -0.06")

MESH_ON_MESH_XML = f"""
<mujoco>
  <asset>
    <mesh name="cube" vertex="{CUBE_MESH}"/>
    <mesh name="small" vertex="{SMALL_CUBE_MESH}"/>
  </asset>
  <worldbody>
    <geom type="mesh" mesh="cube" pos="0 0 0.1"/>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom type="mesh" mesh="small" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

TWO_DYN_STACK_XML = f"""
<mujoco>
  <asset>
    <mesh name="cube" vertex="{CUBE_MESH}"/>
    <mesh name="small" vertex="{SMALL_CUBE_MESH}"/>
  </asset>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.12">
      <freejoint/>
      <geom type="mesh" mesh="cube" mass="1"/>
    </body>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom type="mesh" mesh="small" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_mesh_on_mesh_rest_parity():
    """A free small cube MESH dropped onto a world cube MESH settles at the
    MuJoCo C resting height (mesh-vs-mesh: small cube's bottom vertices vs
    the big cube's convex-hull SDF)."""
    m, d, q, qv = _settle_both(MESH_ON_MESH_XML)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.05, qv
    assert abs(q[2] - d.qpos[2]) < 5e-3, (q[2], d.qpos[2])
    assert abs(q[2] - 0.26) < 0.02             # mesh top 0.2 + half small 0.06


def test_two_dynamic_mesh_stack_parity():
    """TWO dynamic bodies in a mesh pair: a free small mesh stacked on a
    free big mesh on the floor. Rows carry relative jacobians (equal-and-
    opposite wrenches), so the stack settles at MuJoCo C heights."""
    m, d, q, qv = _settle_both(TWO_DYN_STACK_XML, steps=1500)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.05, qv
    # big cube on the floor; small cube on the big cube
    assert abs(q[2] - d.qpos[2]) < 5e-3, (q[2], d.qpos[2])
    assert abs(q[9] - d.qpos[9]) < 5e-3, (q[9], d.qpos[9])
    assert abs(q[2] - 0.1) < 0.02
    assert abs(q[9] - 0.26) < 0.02


def test_two_dynamic_box_on_mesh_parity():
    """Two-dynamic-body PRIMITIVE-vs-mesh: a free box dropped onto a free
    cube mesh resting on the floor (previously refused with 'needs one
    world-attached geom')."""
    xml = BOX_ON_MESH_XML.replace(
        '<geom type="mesh" mesh="cube" pos="0 0 0.1"/>',
        '<geom type="plane" size="2 2 0.1"/>'
        '<body pos="0 0 0.12"><freejoint/>'
        '<geom type="mesh" mesh="cube" mass="1"/></body>')
    m, d, q, qv = _settle_both(xml, steps=1500)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.05, qv
    assert abs(q[2] - d.qpos[2]) < 5e-3, (q[2], d.qpos[2])   # mesh on floor
    assert abs(q[9] - d.qpos[9]) < 5e-3, (q[9], d.qpos[9])   # box on mesh


CYL_XML = """
<mujoco>
  <worldbody>
    <geom type="plane" size="3 3 0.1"/>
    <body pos="0 0 {z0}">
      <freejoint/>
      <geom type="cylinder" size="0.08 0.15" mass="1" euler="{euler}"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize("euler,z0,expect_z", [
    ("90 0 0", 0.3, 0.08),    # lying: rests on the side line at z=r
    ("0 0 0", 0.4, 0.15),     # standing: rests on the cap face at z=hl
    ("75 0 0", 0.3, None),    # tilted: falls over and settles vs MuJoCo
])
def test_cylinder_plane_rest_parity(euler, z0, expect_z):
    """Round-5 stretch (r4 VERDICT item 9): EXACT cylinder-vs-plane
    narrowphase (3 rim points per cap) replaces the inscribed-capsule
    approximation — resting height matches MuJoCo C in the lying, standing,
    and tipped-over regimes."""
    xml = CYL_XML.format(z0=z0, euler=euler)
    m, d, q, qv = _settle_both(xml, steps=2000)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.1, qv
    assert abs(q[2] - d.qpos[2]) < 5e-3, (q[2], d.qpos[2])
    if expect_z is not None:
        assert abs(q[2] - expect_z) < 0.01, q[2]


TENDON_ACT_XML = """
<mujoco>
  <option gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="1"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.03" mass="0.6"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1"><joint joint="j1" coef="0.8"/><joint joint="j2" coef="-0.5"/></fixed>
    <fixed name="t2"><joint joint="j1" coef="0.3"/><joint joint="j2" coef="0.4"/></fixed>
  </tendon>
  <actuator>
    <motor tendon="t1" gear="1.5" ctrlrange="-2 2" ctrllimited="true"/>
    <position tendon="t2" kp="12" gear="0.7"/>
  </actuator>
</mujoco>
"""


def test_tendon_actuator_parity():
    """Motor and position-servo actuators on fixed tendons: 200 driven steps
    match MuJoCo C (length/velocity are gear-scaled tendon coordinates,
    moment = gear * coef row — mjTRN_TENDON)."""
    m = mujoco.MjModel.from_xml_string(TENDON_ACT_XML)
    pm = build_from_mjcf(xml=TENDON_ACT_XML)
    assert sorted(a.tendon_id for a in pm.actuators) == [0, 1]
    d = mujoco.MjData(m)
    d.qpos[:] = [0.3, -0.4]
    d.qvel[:] = [0.5, -0.2]
    rng = np.random.default_rng(7)
    ctrls = rng.uniform(-1.5, 1.5, (200, 2))
    st = forward(pm, jnp.asarray(d.qpos.copy()), jnp.asarray(d.qvel.copy()))
    for k in range(200):
        d.ctrl[:] = ctrls[k]
        mujoco.mj_step(m, d)
        st = step(pm, st, jnp.asarray(ctrls[k]))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-8)


# round-5: spatial (site-chain) tendons — state-dependent length/moment
# (engine.spatial_tendon_geometry), limits through all array tiers, and
# tendon-transmission actuators on them (previously refused at build).
SPATIAL_TENDON_XML = """
<mujoco>
  <option gravity="0 0 -9.81"/>
  <worldbody>
    <site name="anchor" pos="0 0 1.3"/>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="1"/>
      <site name="mid" pos="0.15 0 0.05"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.03" mass="0.6"/>
        <site name="tip" pos="0.22 0 0"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="st" limited="true" range="0 0.62">
      <site site="anchor"/><site site="mid"/><site site="tip"/>
    </spatial>
  </tendon>
  <actuator>
    <motor tendon="st" gear="2.0" ctrlrange="-3 3" ctrllimited="true"/>
  </actuator>
</mujoco>
"""


def test_spatial_tendon_geometry_and_trajectory_parity():
    """Site-chain tendon length matches MuJoCo C to machine precision, and
    200 driven steps through the actuated spatial tendon track MuJoCo
    exactly (the tendon's 0.62 m limit is ACTIVE at the hanging pose —
    rest length 0.66 — so the state-dependent limit rows are exercised in
    the default coupled tier)."""
    from humanoid_mppi_rl_tpu.physics.engine import spatial_tendon_geometry
    m = mujoco.MjModel.from_xml_string(SPATIAL_TENDON_XML)
    pm = build_from_mjcf(xml=SPATIAL_TENDON_XML)
    assert len(pm.spatial_tendons) == 1
    assert pm.tendon_is_spatial[0]
    d = mujoco.MjData(m)
    d.qpos[:] = [0.4, -0.3]
    d.qvel[:] = [0.3, -0.2]
    st = forward(pm, jnp.asarray(d.qpos.copy()), jnp.asarray(d.qvel.copy()))
    mujoco.mj_forward(m, d)
    L, M = spatial_tendon_geometry(pm, st)
    np.testing.assert_allclose(float(L[0]), float(d.ten_length[0]),
                               atol=1e-12)
    rng = np.random.default_rng(2)
    ctrls = rng.uniform(-1.5, 1.5, (200, 1))
    for k in range(200):
        d.ctrl[:] = ctrls[k]
        mujoco.mj_step(m, d)
        st = step(pm, st, jnp.asarray(ctrls[k]))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-11)


def test_spatial_tendon_guards():
    """Geom wraps/pulleys, passive tendon springs, and the kernel path
    refuse loudly."""
    wrapped = SPATIAL_TENDON_XML.replace(
        '<site site="anchor"/><site site="mid"/><site site="tip"/>',
        '<site site="anchor"/>'
        '<geom geom="wrapgeom"/>'
        '<site site="tip"/>'
    ).replace(
        '<site name="mid" pos="0.15 0 0.05"/>',
        '<site name="mid" pos="0.15 0 0.05"/>'
        '<geom name="wrapgeom" type="sphere" size="0.03" pos="0.15 0 0.1" '
        'contype="0" conaffinity="0"/>')
    with pytest.raises(NotImplementedError, match="site-chain"):
        build_from_mjcf(xml=wrapped)
    springy = SPATIAL_TENDON_XML.replace(
        '<spatial name="st" limited="true" range="0 0.62">',
        '<spatial name="st" stiffness="5" limited="true" range="0 0.62">')
    with pytest.raises(NotImplementedError, match="stiffness"):
        build_from_mjcf(xml=springy)
    from humanoid_mppi_rl_tpu.ops.kernel_costs import KERNEL_COSTS
    from humanoid_mppi_rl_tpu.ops.rollout_kernel import build_rollout_kernel
    pm = build_from_mjcf(xml=SPATIAL_TENDON_XML)
    with pytest.raises(NotImplementedError, match="spatial"):
        build_rollout_kernel(pm, KERNEL_COSTS["cartpole"], 4, block_k=8)


def test_mesh_sdf_rows_sphere_capsule():
    """Row-level probe of the sphere and capsule SDF branches: penetrating
    mesh vertices produce active rows whose normals point from the
    primitive into the mesh body along the analytic radial direction."""
    from humanoid_mppi_rl_tpu.physics import contact as ct
    xml = MESH_ON_BOX_XML.replace(
        '<geom type="box" size="0.5 0.5 0.15" pos="0 0 0.15"/>',
        '<geom type="sphere" size="0.2" pos="0 0 0.1"/>')
    pm = build_from_mjcf(xml=xml)
    q = pm.qpos0.copy()
    # mesh bottom corners at (+-0.1, +-0.1, 0.23): distance to the sphere
    # center (0,0,0.1) is sqrt(0.01+0.01+0.0169)=0.192 < r=0.2 -> all four
    # penetrate by 8 mm (vertex regime, not the documented face regime)
    q[2] = 0.33
    st = forward(pm, jnp.asarray(q), jnp.zeros(pm.nv))
    rows = ct.collect_contact_rows(pm, st, st.S)
    pen = np.asarray(rows["pen"])
    n = np.asarray(rows["n"])
    # direction 1: the four bottom corners penetrate the sphere by 8 mm,
    # normals radially up into the mesh body
    r_exp = 0.2 - np.sqrt(0.1 ** 2 + 0.1 ** 2 + 0.13 ** 2)
    vert_rows = np.isclose(pen, r_exp, atol=1e-6)
    assert vert_rows.sum() == 4, pen
    for k in np.nonzero(vert_rows)[0]:
        assert n[k, 2] > 0.5, n[k]           # upward into the mesh body
    # direction 2 (round-5): the sphere's top pokes 70 mm into the mesh's
    # bottom FACE interior — the regime the vertex ranking alone misses
    # (sphere top z=0.3 vs mesh bottom z=0.23). Row on the sphere side,
    # normal = hull bottom-face normal (downward, into the world sphere;
    # reaction pushes the mesh up).
    face_rows = np.isclose(pen, 0.07, atol=1e-6)
    assert face_rows.sum() == 1, pen
    assert n[np.nonzero(face_rows)[0][0], 2] < -0.5
    assert (pen > 1e-6).sum() == 5, pen
    # capsule branch: horizontal capsule under the same mesh; corner radial
    # distance to the axis sqrt(0.01+0.0169)=0.164 < r -> 36 mm penetration
    xml_c = MESH_ON_BOX_XML.replace(
        '<geom type="box" size="0.5 0.5 0.15" pos="0 0 0.15"/>',
        '<geom type="capsule" fromto="-0.3 0 0.1 0.3 0 0.1" size="0.2"/>')
    pm_c = build_from_mjcf(xml=xml_c)
    qc = pm_c.qpos0.copy()
    qc[2] = 0.33
    st = forward(pm_c, jnp.asarray(qc), jnp.zeros(pm_c.nv))
    rows = ct.collect_contact_rows(pm_c, st, st.S)
    pen = np.asarray(rows["pen"])
    n = np.asarray(rows["n"])
    # capsule endpoints sit outside the mesh hull in x, so direction 2
    # contributes no deep rows here (up to a ~1e-17 rounding hairline);
    # the four corner-vertex rows carry the contact
    active = pen > 1e-6
    assert active.sum() == 4, pen
    np.testing.assert_allclose(
        pen[active], 0.2 - np.sqrt(0.1 ** 2 + 0.13 ** 2), atol=1e-6)
    # normals are radial from the axis: zero x-component, upward z
    for k in np.nonzero(active)[0]:
        assert abs(n[k, 0]) < 1e-6 and n[k, 2] > 0.5, n[k]


SITE_ACT_XML = """
<mujoco>
  <option gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.05" mass="2"/>
      <site name="thruster" pos="0.06 0 0.05" euler="0 20 0"/>
      <body pos="0.1 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03" mass="0.4"/>
        <site name="tip" pos="0.2 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor site="thruster" gear="0 0 1 0 0 0" ctrlrange="0 30" ctrllimited="true"/>
    <motor site="thruster" gear="0 0 0 0 0 0.5"/>
    <motor site="tip" gear="1 0 0 0 0 0"/>
  </actuator>
</mujoco>
"""


def test_site_actuator_parity():
    """Site-transmission motors (force + torque wrenches at sites, incl. a
    site on a child body of the chain): 200 driven steps match MuJoCo C
    (moment = S-projection of the world wrench onto the site's body chain
    — mjTRN_SITE without refsite)."""
    m = mujoco.MjModel.from_xml_string(SITE_ACT_XML)
    pm = build_from_mjcf(xml=SITE_ACT_XML)
    assert sum(1 for a in pm.actuators if a.site_bodyid >= 0) == 3
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    d.qvel[:] = rng.normal(0, 0.2, m.nv)
    st = forward(pm, jnp.asarray(d.qpos.copy()), jnp.asarray(d.qvel.copy()))
    ctrls = np.column_stack([
        20.0 + 2 * np.sin(0.05 * np.arange(200)),          # hover-ish thrust
        rng.uniform(-1, 1, 200),
        rng.uniform(-0.5, 0.5, 200),
    ])
    for k in range(200):
        d.ctrl[:] = ctrls[k]
        mujoco.mj_step(m, d)
        st = step(pm, st, jnp.asarray(ctrls[k]))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-8)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-7)


def test_site_actuator_moment_with_state():
    """actuator_moment(model, state) evaluates the state-dependent site
    rows (r4 advisor item: LQR can linearize thruster models); without a
    state it still refuses loudly. Cross-checked against the engine's
    qfrc_actuator: qfrc == moment^T (gain*u) for the pure-motor model."""
    from humanoid_mppi_rl_tpu.physics.engine import (_actuator_forces,
                                                     actuator_moment)
    m = mujoco.MjModel.from_xml_string(SITE_ACT_XML)
    pm = build_from_mjcf(xml=SITE_ACT_XML)
    with pytest.raises(NotImplementedError, match="state-dependent"):
        actuator_moment(pm)
    rng = np.random.default_rng(5)
    qpos = pm.qpos0.copy()
    qpos[3:7] = _small_quat(rng)
    qpos[7] += 0.3
    st = forward(pm, jnp.asarray(qpos), jnp.zeros(pm.nv))
    M = np.asarray(actuator_moment(pm, st))
    u = np.array([5.0, 0.3, -0.2])
    qfrc = np.asarray(_actuator_forces(pm, st.qpos, st.qvel,
                                       jnp.asarray(u), st))
    np.testing.assert_allclose(M.T @ u, qfrc, atol=1e-12)


def test_site_refsite_guard():
    """refsite-relative site transmissions refuse loudly."""
    xml = SITE_ACT_XML.replace(
        '<motor site="tip" gear="1 0 0 0 0 0"/>',
        '<motor site="tip" refsite="thruster" gear="1 0 0 0 0 0"/>')
    with pytest.raises(NotImplementedError, match="refsite"):
        build_from_mjcf(xml=xml)


# round-5 advisor item: near-coincident mesh vertices (scanned/unindexed
# meshes store vertex clusters MuJoCo's compiler keeps when they differ by
# >~1e-7) must not spend every narrowphase slot on one physical point —
# the top-k dedup in contact.add_mesh_rows replaces micron-duplicates with
# the next-deepest DISTINCT vertex so wide patches stay torque-constrained.
def _clustered_cube_xml():
    c = [(sx, sy, sz) for sx in (-.1, .1) for sy in (-.1, .1)
         for sz in (-.1, .1)]
    pts = []
    for p in c:
        for j in range(3):   # 3-cluster per corner, ~0.45 um apart
            pts.append((p[0] + j * 2e-7, p[1] + j * 1e-7, p[2]))
    verts = "  ".join(" ".join(repr(v) for v in p) for p in pts)
    return f"""
<mujoco>
  <asset><mesh name="cube" vertex="{verts}"/></asset>
  <worldbody>
    <geom type="box" size="0.5 0.5 0.15" pos="0 0 0.15"/>
    <body pos="0 0 0.45">
      <freejoint/>
      <geom type="mesh" mesh="cube" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_clustered_vertex_mesh_rests_level():
    xml = _clustered_cube_xml()
    pm = build_from_mjcf(xml=xml)
    mesh_geom = [g for g in pm.geoms if g.mesh_verts is not None][0]
    assert np.asarray(mesh_geom.mesh_verts).shape[0] == 24  # clusters kept
    m, d, q, qv = _settle_both(xml)
    assert np.isfinite(q).all()
    assert np.abs(qv).max() < 0.05, qv
    assert abs(q[2] - d.qpos[2]) < 3e-3, (q[2], d.qpos[2])
    # level rest: all four distinct bottom corners are supported, so the
    # quaternion stays near identity (tilt < ~1 degree)
    tilt = 2 * np.arccos(np.clip(abs(q[3]), -1.0, 1.0))
    assert tilt < np.deg2rad(1.0), tilt
