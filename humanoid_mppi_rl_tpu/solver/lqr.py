"""LQR baseline (reference L8 side stack: examples/cartpole_lqr.jl,
src/humanoid_lqr.jl).

TPU-native re-design: where the reference finite-differences the MuJoCo step
(mjd_transitionFD, examples/cartpole_lqr.jl:26) and calls a Julia Riccati
solver (`ared`), here the engine step is linearized *exactly* with jax.jacfwd
in a quaternion-aware tangent space (the analog of mj_differentiatePos used
by the reference controller, src/humanoid_lqr.jl:154-164), and the discrete
Riccati equation is solved by fixed-point iteration under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import (PhysicsModel, PhysicsState, actuator_moment,
                       body_com_jacobian, forward, inverse_dynamics, step,
                       subtree_com_jacobian)
from ..physics import spatial as sp
from ..physics.model import FREE


def _apply_tangent(model: PhysicsModel, qpos0: jax.Array, dq: jax.Array) -> jax.Array:
    """qpos0 (+) dq: hinge/slide add; free-joint orientation via local expmap."""
    qpos = qpos0
    if model.hs_qposadr.shape[0]:
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        qpos = qpos.at[qadr].add(dq[dadr])
    for qa, da in zip(model.free_qposadr.tolist(), model.free_dofadr.tolist()):
        qpos = qpos.at[qa : qa + 3].add(dq[da : da + 3])
        quat = qpos0[qa + 3 : qa + 7]
        qpos = qpos.at[qa + 3 : qa + 7].set(
            sp.quat_integrate(quat, dq[da + 3 : da + 6], jnp.asarray(1.0, qpos0.dtype)))
    return qpos


def _tangent_diff(model: PhysicsModel, qpos: jax.Array, qpos0: jax.Array) -> jax.Array:
    """dq = qpos (-) qpos0 in the tangent space (mj_differentiatePos analog)."""
    dq = jnp.zeros(model.nv, qpos.dtype)
    if model.hs_qposadr.shape[0]:
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        dq = dq.at[dadr].set(qpos[qadr] - qpos0[qadr])
    for qa, da in zip(model.free_qposadr.tolist(), model.free_dofadr.tolist()):
        dq = dq.at[da : da + 3].set(qpos[qa : qa + 3] - qpos0[qa : qa + 3])
        q0 = qpos0[qa + 3 : qa + 7]
        q1 = qpos[qa + 3 : qa + 7]
        dquat = sp.quat_mul(sp.quat_conj(q0), q1)
        # quaternion log map, AD-safe at identity (vec == 0, where a plain
        # norm has a NaN gradient): dq = [2*atan2(|v|, w)/|v|] * v with the
        # bracket an even, smooth function of |v| (-> 2/w at 0)
        w = dquat[0]
        vec = dquat[1:]
        n = jnp.sqrt(jnp.sum(vec * vec) + 1e-24)
        scale = 2.0 * jnp.arctan2(n, w) / n
        dq = dq.at[da + 3 : da + 6].set(scale * vec)
    return dq


def linearize(model: PhysicsModel, qpos0: np.ndarray, qvel0: np.ndarray,
              ctrl0: np.ndarray) -> Tuple[jax.Array, jax.Array]:
    """Exact-AD discrete linearization of the engine step about
    (qpos0, qvel0, ctrl0): returns A (2nv x 2nv), B (2nv x nu) in tangent
    coordinates x = [dq; dv]."""
    nv, nu = model.nv, model.nu
    qpos0 = jnp.asarray(qpos0)
    qvel0 = jnp.asarray(qvel0)
    ctrl0 = jnp.asarray(ctrl0)
    x_next0 = step(model, forward(model, qpos0, qvel0), ctrl0)

    def f(x: jax.Array, u: jax.Array) -> jax.Array:
        qpos = _apply_tangent(model, qpos0, x[:nv])
        qvel = qvel0 + x[nv:]
        st = step(model, forward(model, qpos, qvel), ctrl0 + u)
        dq = _tangent_diff(model, st.qpos, x_next0.qpos)
        return jnp.concatenate([dq, st.qvel - x_next0.qvel])

    zx = jnp.zeros(2 * nv, qpos0.dtype)
    zu = jnp.zeros(nu, qpos0.dtype)
    A = jax.jacfwd(f, argnums=0)(zx, zu)
    B = jax.jacfwd(f, argnums=1)(zx, zu)
    return A, B


def solve_dare(A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
               iters: int = 300) -> jax.Array:
    """Discrete algebraic Riccati by fixed-point iteration (the `ared` call
    of examples/cartpole_lqr.jl:32); returns the gain K with u = -K x."""

    def body(_, P):
        BtP = B.T @ P
        G = jnp.linalg.solve(R + BtP @ B, BtP @ A)
        return Q + A.T @ P @ A - A.T @ P @ B @ G

    P = jax.lax.fori_loop(0, iters, body, Q)
    BtP = B.T @ P
    K = jnp.linalg.solve(R + BtP @ B, BtP @ A)
    return K


# ---------------------------------------------------------------------------
# Humanoid stand-on-one-leg LQR (reference src/humanoid_lqr.jl)
# ---------------------------------------------------------------------------

def stand_setpoint(model: PhysicsModel, keyframe: str = "stand_on_left_leg",
                   span: float = 1e-3, n_heights: int = 2001):
    """Control set-point calibration (reference src/humanoid_lqr.jl:19-65).

    Inverse dynamics at the raw keyframe carries an unphysical vertical force
    on the unactuated root-z dof (the feet interpenetrate or float). The
    reference sweeps root-height offsets in [-1, 1] mm and picks the one
    whose required root-z force is smallest (:24-40); the calibrated
    qfrc0 = mj_inverse(qpos0, qacc=0) is then mapped to actuator space with
    the transmission-moment pseudoinverse, ctrl0 = pinv(M_act)' qfrc0
    (:52-65). The sweep is a single vmapped+jitted batch here instead of a
    2001-iteration host loop.

    Returns (qpos0, ctrl0, info) with info = dict(height, u_vert, heights,
    qfrc0, residual).
    """
    key_qpos = dict(model.keyframes)[keyframe]
    heights = jnp.linspace(-span, span, n_heights)
    zvel = jnp.zeros(model.nv)

    def vert_force(h):
        qpos = jnp.asarray(key_qpos).at[2].add(h)
        st = forward(model, qpos, zvel)
        return inverse_dynamics(model, st)[2]       # root-z dof

    u_vert = jax.jit(jax.vmap(vert_force))(heights)
    best = jnp.argmin(jnp.abs(u_vert))
    height = heights[best]

    qpos0 = jnp.asarray(key_qpos).at[2].add(height)
    st0 = forward(model, qpos0, zvel)
    qfrc0 = inverse_dynamics(model, st0)
    M_act = actuator_moment(model, st0)             # (nu, nv) — state
    # kinematics let site-transmission models linearize too (r4 advisor)
    # ctrl0 solves M_act^T ctrl = qfrc0 in least squares (fully-actuated
    # below the free joint, so the actuated rows match exactly)
    ctrl0, *_ = jnp.linalg.lstsq(M_act.T, qfrc0)
    residual = M_act.T @ ctrl0 - qfrc0
    info = dict(height=float(height), u_vert=np.asarray(u_vert),
                heights=np.asarray(heights), qfrc0=np.asarray(qfrc0),
                residual=np.asarray(residual))
    return np.asarray(qpos0), np.asarray(ctrl0), info


def humanoid_balance_Q(model: PhysicsModel, qpos0: np.ndarray,
                       balance_cost: float = 1000.0,
                       balance_joint_cost: float = 3.0,
                       other_joint_cost: float = 0.3,
                       stance_foot: str = "foot_left") -> np.ndarray:
    """Balance-aware Q design (reference src/humanoid_lqr.jl:81-136):
    penalize the horizontal offset between the whole-robot CoM jacobian and
    the stance-foot CoM jacobian (CoM over support), keep abdomen + stance-leg
    joints stiff, leave the rest nearly free; zero cost on velocities.

    The reference indexes the joint-cost blocks by *joint id* where dof
    indices are required (src/humanoid_lqr.jl:117-121 — ids are offset by 5
    from dof addresses past the free joint); here the dof addresses are used,
    which is the intended design (and matches the upstream DeepMind LQR
    notebook the script follows).
    """
    nv = model.nv
    st0 = forward(model, jnp.asarray(qpos0), jnp.zeros(nv))
    torso = model.body_id("torso")
    foot = model.body_id(stance_foot)
    jac_com = np.asarray(subtree_com_jacobian(model, st0, torso))
    jac_foot = np.asarray(body_com_jacobian(model, st0, foot))
    jac_diff = jac_com - jac_foot
    Qbalance = jac_diff.T @ jac_diff

    side = "left" if "left" in stance_foot else "right"
    balance_dofs = []
    for j, name in zip(model.joints, model.joint_names):
        if j.jtype != FREE and (
            "abdomen" in name
            or (side in name and any(p in name for p in ("hip", "knee", "ankle")))
        ):
            balance_dofs.append(j.dofadr)
    free_dofs = list(range(6))
    other_dofs = [d for d in range(6, nv) if d not in balance_dofs]

    Qjoint = np.eye(nv)
    Qjoint[free_dofs, free_dofs] = 0.0
    Qjoint[balance_dofs, balance_dofs] = balance_joint_cost
    Qjoint[other_dofs, other_dofs] = other_joint_cost

    Qpos = balance_cost * Qbalance + Qjoint
    Q = np.zeros((2 * nv, 2 * nv))
    Q[:nv, :nv] = Qpos
    Q += 1e-10 * np.eye(2 * nv)
    return Q


def make_humanoid_lqr(model: PhysicsModel, keyframe: str = "stand_on_left_leg",
                      n_heights: int = 2001):
    """Full reference pipeline: setpoint calibration -> balance Q -> exact-AD
    linearization -> DARE gain -> quaternion-aware feedback controller
    (reference src/humanoid_lqr.jl end-to-end)."""
    qpos0, ctrl0, info = stand_setpoint(model, keyframe, n_heights=n_heights)
    Q = humanoid_balance_Q(model, qpos0)
    controller, mats = make_lqr_controller(
        model, qpos0, ctrl0=ctrl0, Q=Q, R=np.eye(model.nu))
    return controller, dict(qpos0=qpos0, ctrl0=ctrl0, Q=Q, info=info,
                            mats=mats)


def make_lqr_controller(
    model: PhysicsModel,
    qpos0: np.ndarray,
    qvel0: Optional[np.ndarray] = None,
    ctrl0: Optional[np.ndarray] = None,
    Q: Optional[np.ndarray] = None,
    R: Optional[np.ndarray] = None,
):
    """controller(state: PhysicsState) -> ctrl, stabilizing (qpos0, qvel0)."""
    nv, nu = model.nv, model.nu
    qvel0 = np.zeros(nv) if qvel0 is None else qvel0
    ctrl0 = np.zeros(nu) if ctrl0 is None else ctrl0
    Qm = jnp.asarray(np.eye(2 * nv) if Q is None else Q)
    Rm = jnp.asarray(np.eye(nu) if R is None else R)

    A, B = linearize(model, qpos0, qvel0, ctrl0)
    K = solve_dare(A, B, Qm, Rm)
    qpos0_j = jnp.asarray(qpos0)
    qvel0_j = jnp.asarray(qvel0)
    ctrl0_j = jnp.asarray(ctrl0)

    def controller(state: PhysicsState) -> jax.Array:
        dq = _tangent_diff(model, state.qpos, qpos0_j)
        x = jnp.concatenate([dq, state.qvel - qvel0_j])
        return ctrl0_j - K @ x

    return controller, (A, B, K)
