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

from ..physics import PhysicsModel, PhysicsState, forward, step
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
        # log map (small-angle): 2 * vec(dquat) * sign(w)
        w = dquat[0]
        vec = dquat[1:]
        angle = 2.0 * jnp.arctan2(jnp.linalg.norm(vec) + 1e-12, w)
        axis = vec / (jnp.linalg.norm(vec) + 1e-12)
        dq = dq.at[da + 3 : da + 6].set(axis * angle)
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
