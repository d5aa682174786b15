"""Pallas rollout-kernel tests (interpret mode on CPU).

The scalar-SoA physics (ops/scalar_physics) is validated against the array
engine oracle to machine precision; the fused rollout kernel is validated
against the generic solver rollout path; kernel costs against the jnp cost
library."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.costs import cartpole as cpc
from humanoid_mppi_rl_tpu.costs import humanoid as humc
from humanoid_mppi_rl_tpu.dynamics.physics import make_physics_dynamics
from humanoid_mppi_rl_tpu.ops import kernel_costs
from humanoid_mppi_rl_tpu.ops.kernel_math import asin, atan2
from humanoid_mppi_rl_tpu.ops.rollout_kernel import build_rollout_kernel
from humanoid_mppi_rl_tpu.ops.scalar_physics import scalar_step
from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step
from humanoid_mppi_rl_tpu.solver.mppi import MPPIConfig, rollout_costs

import os

ASSETS = os.path.join(os.path.dirname(__file__), "..", "humanoid_mppi_rl_tpu", "assets")


def _asset(name):
    return os.path.join(ASSETS, f"{name}.xml")


@pytest.mark.parametrize("name", ["cartpole", "hopper", "humanoid", "go1"])
def test_scalar_step_matches_engine(name):
    pm = build_from_mjcf(_asset(name))
    rng = np.random.default_rng(3)
    B = 4
    qpos = np.tile(pm.qpos0, (B, 1)) + rng.normal(0, 0.1, (B, pm.nq))
    for j in pm.joints:
        if j.jtype == 0:
            q = qpos[:, j.qposadr + 3 : j.qposadr + 7]
            qpos[:, j.qposadr + 3 : j.qposadr + 7] = q / np.linalg.norm(
                q, axis=1, keepdims=True)
    qvel = rng.normal(0, 0.3, (B, pm.nv))
    ctrl = rng.uniform(-0.5, 0.5, (B, pm.nu))

    st = jax.vmap(lambda qp, qv: forward(pm, qp, qv))(
        jnp.asarray(qpos), jnp.asarray(qvel))
    # the kernel implements the decoupled "penalty" solver tier exactly
    # (the coupled default adds a cross-row constraint solve — see
    # physics.engine.step)
    st2 = jax.vmap(lambda s, u: step(pm, s, u, solver="penalty"))(
        st, jnp.asarray(ctrl))

    qp_l = [jnp.asarray(qpos[:, i]) for i in range(pm.nq)]
    qv_l = [jnp.asarray(qvel[:, i]) for i in range(pm.nv)]
    u_l = [jnp.asarray(ctrl[:, i]) for i in range(pm.nu)]
    qpn, qvn, _ = scalar_step(pm, qp_l, qv_l, u_l, jnp.zeros(B))
    qpn = np.stack([np.asarray(x) for x in qpn], 1)
    qvn = np.stack([np.asarray(x) for x in qvn], 1)
    np.testing.assert_allclose(qpn, np.asarray(st2.qpos), atol=1e-10)
    np.testing.assert_allclose(qvn, np.asarray(st2.qvel), atol=1e-8)


def test_scalar_step_matches_engine_arm5():
    """Round-5 kernel-path generality: the scalar step matches the array
    engine's penalty tier on arm5 at machine-ish precision — ball-joint FK/
    S rows/Sdot, quaternion springs, the shoulder rotation-angle limit,
    multi-dof ball/free motors, ball integration, and plane-vs-mesh
    contacts. States cover contact-free, crate-resting (mesh contact), and
    past-the-70deg-shoulder-limit samples."""
    pm = build_from_mjcf(_asset("arm5"))
    rng = np.random.default_rng(3)
    B = 4

    def smallq(mag=0.3):
        v = rng.normal(size=3) * mag
        a = np.linalg.norm(v)
        return np.concatenate([[np.cos(a / 2)],
                               v / max(a, 1e-12) * np.sin(a / 2)])

    qpos = np.tile(pm.qpos0, (B, 1)).astype(float)
    for b in range(B):
        qpos[b, 0:4] = smallq(0.5 if b == 1 else 0.2)   # shoulder ball
        qpos[b, 4] = rng.uniform(-0.8, 0.0)             # elbow
        qpos[b, 5:9] = smallq()                         # wrist ball
        qpos[b, 11] = 0.097 if b == 2 else 1.0 + rng.uniform(0, 0.3)
        qpos[b, 12:16] = smallq(0.1)                    # crate quat
    v = np.array([1.3, 0.2, 0.0])                       # b=3: past the limit
    a = np.linalg.norm(v)
    qpos[3, 0:4] = np.concatenate([[np.cos(a / 2)], v / a * np.sin(a / 2)])
    qvel = rng.normal(0, 0.3, (B, pm.nv))
    ctrl = rng.uniform(-0.5, 0.5, (B, pm.nu))

    st = jax.vmap(lambda qp, qv: forward(pm, qp, qv))(
        jnp.asarray(qpos), jnp.asarray(qvel))
    st2 = jax.vmap(lambda s, u: step(pm, s, u, solver="penalty"))(
        st, jnp.asarray(ctrl))
    qp_l = [jnp.asarray(qpos[:, i]) for i in range(pm.nq)]
    qv_l = [jnp.asarray(qvel[:, i]) for i in range(pm.nv)]
    u_l = [jnp.asarray(ctrl[:, i]) for i in range(pm.nu)]
    qpn, qvn, _ = scalar_step(pm, qp_l, qv_l, u_l, jnp.zeros(B))
    qpn = np.stack([np.asarray(x) for x in qpn], 1)
    qvn = np.stack([np.asarray(x) for x in qvn], 1)
    np.testing.assert_allclose(qpn, np.asarray(st2.qpos), atol=1e-10)
    np.testing.assert_allclose(qvn, np.asarray(st2.qvel), atol=5e-8)


def test_kernel_math():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 2, 256)
    x = rng.normal(0, 2, 256)
    np.testing.assert_allclose(np.asarray(atan2(jnp.asarray(y), jnp.asarray(x))),
                               np.arctan2(y, x), atol=2e-5)
    s = rng.uniform(-1, 1, 256)
    np.testing.assert_allclose(np.asarray(asin(jnp.asarray(s))),
                               np.arcsin(s), atol=3e-5)


@pytest.mark.parametrize("name,kcost,jcost", [
    ("cartpole", kernel_costs.cartpole, cpc.make_costs),
    ("arm5", kernel_costs.arm5,
     lambda m: __import__("humanoid_mppi_rl_tpu.costs.arm5",
                          fromlist=["make_costs"]).make_costs(m)),
])
def test_rollout_kernel_matches_generic_path(name, kcost, jcost):
    """Pallas wrapper (interpret mode) vs the generic solver rollout.
    Cartpole only — interpret-mode execution of the humanoid mega-kernel is
    minutes-slow on CPU; humanoid coverage comes from
    test_scalar_step_matches_engine + test_kernel_costs_match_jnp_costs,
    which together span the same math."""
    pm = build_from_mjcf(_asset(name))
    K, T = 16, 3
    rng = np.random.default_rng(0)
    U = rng.normal(0, 0.2, (T, pm.nu)).astype(np.float32)
    noise = rng.normal(0, 0.4, (K, T, pm.nu)).astype(np.float32)
    qpos0 = np.asarray(pm.qpos0, np.float32)
    st = forward(pm, jnp.asarray(qpos0), jnp.zeros(pm.nv, jnp.float32))
    dyn = make_physics_dynamics(pm)
    run_c, term_c = jcost(pm)
    cfg = MPPIConfig(n_samples=K, horizon=T)
    ref = np.asarray(rollout_costs(dyn, run_c, term_c, cfg, st,
                                   jnp.asarray(U), jnp.asarray(noise)))
    rk = build_rollout_kernel(pm, kcost, T, block_k=16, interpret=True)
    got, qf, vf = rk(
        jnp.asarray(np.tile(qpos0[:, None], (1, K))),
        jnp.zeros((pm.nv, K), jnp.float32),
        jnp.zeros((1, K), jnp.float32),
        jnp.asarray(U),
        jnp.asarray(np.ascontiguousarray(np.transpose(noise, (1, 2, 0)))),
    )
    ok = np.isfinite(ref)
    assert ok.mean() > 0.9
    rel = np.abs(np.asarray(got)[ok] - ref[ok]) / (np.abs(ref[ok]) + 1e-3)
    # f32 rollouts over contact-rich states accumulate roundoff; the kernel
    # path is the numerically tighter of the two (see dynamics/physics.py)
    assert np.median(rel) < 2e-2, np.median(rel)


def _make_ctx(pm, B=4, seed=0):
    from humanoid_mppi_rl_tpu.ops import scalar_physics as sph

    rng = np.random.default_rng(seed)
    qpos = np.tile(pm.qpos0, (B, 1)) + rng.normal(0, 0.05, (B, pm.nq))
    for j in pm.joints:
        if j.jtype == 0:
            q = qpos[:, j.qposadr + 3 : j.qposadr + 7]
            qpos[:, j.qposadr + 3 : j.qposadr + 7] = q / np.linalg.norm(
                q, axis=1, keepdims=True)
    qvel = rng.normal(0, 0.2, (B, pm.nv))
    ctrl = rng.uniform(-0.5, 0.5, (B, pm.nu))
    qp = [jnp.asarray(qpos[:, i], jnp.float32) for i in range(pm.nq)]
    qv = [jnp.asarray(qvel[:, i], jnp.float32) for i in range(pm.nv)]
    uu = [jnp.asarray(ctrl[:, i], jnp.float32) for i in range(pm.nu)]
    fwd = sph.scalar_forward(pm, qp, qv)
    ctx = sph.ctx_from(pm, fwd, qp, qv, uu, jnp.full(B, 0.37, jnp.float32))
    return ctx, qpos, qvel, ctrl


def test_kernel_costs_match_jnp_costs():
    """Scalar-SoA kernel costs == jnp cost library on the same states."""
    from humanoid_mppi_rl_tpu.costs import quadruped as quadc
    from humanoid_mppi_rl_tpu.physics import PhysicsState

    for name, kfac, jfac in [
        ("humanoid", kernel_costs.humanoid, humc.make_costs),
        ("go1", kernel_costs.quadruped,
         lambda m: __import__("humanoid_mppi_rl_tpu.costs.quadruped",
                              fromlist=["make_costs"]).make_costs(m)),
    ]:
        pm = build_from_mjcf(_asset(name))
        ctx, qpos, qvel, ctrl = _make_ctx(pm)
        runk, termk = kfac(pm)
        ck = np.asarray(runk(ctx, 0))
        runj, termj = (jfac(pm) if name != "humanoid" else humc.make_costs(pm))
        B = qpos.shape[0]
        cj = []
        for b in range(B):
            st = forward(pm, jnp.asarray(qpos[b], jnp.float32),
                         jnp.asarray(qvel[b], jnp.float32),
                         jnp.asarray(0.37, jnp.float32))
            cj.append(float(runj(st, jnp.asarray(ctrl[b], jnp.float32), 0)))
        np.testing.assert_allclose(ck, cj, rtol=2e-4)


def test_kernel_v1_and_hard_costs_match_jnp_costs():
    """The v1 time-phased and hard-penalty humanoid kernel costs == their
    jnp oracles (costs/humanoid.make_costs_v1 / make_costs_hard_penalty),
    including the gait-clock dependence on t and the terminal at t=T."""
    pm = build_from_mjcf(_asset("humanoid"))
    ctx, qpos, qvel, ctrl = _make_ctx(pm)
    B = qpos.shape[0]

    def oracle(runj, t, zero_ctrl=False):
        out = []
        for b in range(B):
            st = forward(pm, jnp.asarray(qpos[b], jnp.float32),
                         jnp.asarray(qvel[b], jnp.float32),
                         jnp.asarray(0.37, jnp.float32))
            u = (jnp.zeros(pm.nu, jnp.float32) if zero_ctrl
                 else jnp.asarray(ctrl[b], jnp.float32))
            out.append(float(runj(st, u, t)))
        return out

    # v1: check both gait phases and the horizon-injected terminal clock
    runk, termk = kernel_costs.humanoid_v1(pm, horizon=150)
    runj, termj = humc.make_costs_v1(pm)
    for t in (0, 137):
        np.testing.assert_allclose(np.asarray(runk(ctx, jnp.asarray(t))),
                                   oracle(runj, t), rtol=2e-4)
    ctx2, *_ = _make_ctx(pm)
    np.testing.assert_allclose(
        np.asarray(termk(ctx2)),
        [float(termj(forward(pm, jnp.asarray(qpos[b], jnp.float32),
                             jnp.asarray(qvel[b], jnp.float32),
                             jnp.asarray(0.37, jnp.float32)),
                    jnp.asarray(150))) for b in range(B)],
        rtol=2e-4)

    # hard-penalty variant
    runk, termk = kernel_costs.humanoid_hard(pm)
    runj, termj = humc.make_costs_hard_penalty(pm)
    np.testing.assert_allclose(np.asarray(runk(ctx, 0)), oracle(runj, 0),
                               rtol=2e-4)


def test_kernel_runtime_params_cost_equivalence():
    """param-target cost == statically-baked cost at the same goal."""
    pm = build_from_mjcf(_asset("humanoid"))
    ctx, *_ = _make_ctx(pm)
    goal = (1.3, -0.4, 1.2)
    ctx.params = [jnp.asarray(g, jnp.float32) for g in goal] + [0.0] * 13
    run_s, _ = kernel_costs.humanoid(pm, target=goal)
    run_p, _ = kernel_costs.humanoid(pm, param_target=True)
    np.testing.assert_allclose(np.asarray(run_p(ctx, 0)),
                               np.asarray(run_s(ctx, 0)), rtol=1e-6)


def test_kernel_gait_params_zero_deltas_match_reference():
    """param_gait=True with all-zero delta slots == the baked reference cost;
    nonzero deltas change it (PARAM_SLOTS contract, ops/kernel_costs.py)."""
    pm = build_from_mjcf(_asset("humanoid"))
    ctx, *_ = _make_ctx(pm)
    goal = (1.3, -0.4, 1.2)
    base = [jnp.asarray(g, jnp.float32) for g in goal] + [0.0] * 13

    ctx.params = base
    run_s, term_s = kernel_costs.humanoid(pm, target=goal)
    run_g, term_g = kernel_costs.humanoid(pm, param_target=True,
                                          param_gait=True)
    np.testing.assert_allclose(np.asarray(run_g(ctx, 0)),
                               np.asarray(run_s(ctx, 0)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(term_g(ctx)),
                               np.asarray(term_s(ctx)), rtol=1e-6)

    # a height-weight delta (slot 7) moves the cost by exactly d_w * |tz - rz|
    bumped = list(base)
    bumped[7] = jnp.asarray(0.7, jnp.float32)
    ctx.params = bumped
    expect = np.asarray(run_s(ctx, 0)) + 0.7 * np.abs(
        goal[2] - np.asarray(ctx.qpos[2]))
    np.testing.assert_allclose(np.asarray(run_g(ctx, 0)), expect, rtol=1e-5)


def test_kernel_walk_weights_match_jnp_oracle():
    """Baked w_* kwargs (the WEIGHTS_WALK preset) give the same kernel cost
    as the jnp make_costs_walk oracle, and differ from the v3 default."""
    pm = build_from_mjcf(_asset("humanoid"))
    ctx, qpos, qvel, ctrl = _make_ctx(pm)
    B = qpos.shape[0]

    runk, termk = kernel_costs.humanoid(pm, **humc.WEIGHTS_WALK)
    runj, termj = humc.make_costs_walk(pm)
    cj = []
    for b in range(B):
        st = forward(pm, jnp.asarray(qpos[b], jnp.float32),
                     jnp.asarray(qvel[b], jnp.float32),
                     jnp.asarray(0.37, jnp.float32))
        cj.append(float(runj(st, jnp.asarray(ctrl[b], jnp.float32), 0)))
    np.testing.assert_allclose(np.asarray(runk(ctx, 0)), cj, rtol=2e-4)

    run_v3, _ = kernel_costs.humanoid(pm)
    assert not np.allclose(np.asarray(runk(ctx, 0)), np.asarray(run_v3(ctx, 0)))

    # the humanoid_walk task preset wires these weights through load_task
    from humanoid_mppi_rl_tpu.envs.tasks import TASKS
    spec = TASKS["humanoid_walk"]
    assert spec.kernel_cost == "humanoid"
    assert spec.cost_kwargs["w_swing_x"] == 0.0
    assert spec.mppi.n_samples == 8192 and spec.mppi.horizon == 64
