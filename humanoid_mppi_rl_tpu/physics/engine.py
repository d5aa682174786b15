"""JAX-native rigid-body dynamics engine (the TPU replacement for the
reference's MuJoCo C stepping, reference src/cartpole_mppi.py:73 `mj_step`).

Formulation: world-frame ("origin" Plucker) operational-space algebra.

- Forward kinematics walks the body tree once per step (unrolled at trace
  time — nbody <= 14 for all four task robots) producing body poses and the
  per-dof motion subspace matrix ``S`` (nv, 6) plus the static ancestor mask
  ``A`` (nbody, nv) from the model. Everything downstream is dense batched
  einsum/matmul — the shape XLA tiles onto the TPU MXU, with the MPPI sample
  axis vmapped on the outside.

- Mass matrix:    M = sum_b (A_b A_b^T) ∘ (S I^O_b S^T)   + diag(armature)
- Bias force:     origin-frame Newton-Euler with qacc=0:
                    a_b  = sum_{j<=b} (V_{bj} x S_j) qd_j - a_gravity
                    f_b  = I^O_b a_b + V_b x* (I^O_b V_b)
                    bias = proj(f)  where proj(f)_n = S_n . sum_b A_{bn} f_b
- Integration: semi-implicit Euler with implicit joint damping, matching
  MuJoCo's Euler integrator: qacc = (M + h*diag(damping))^{-1} f_explicit,
  qvel += h*qacc, quaternions integrated by local-frame expmap.

Contacts and joint limits use smooth penalty forces (contact.py) rather than
MuJoCo's constraint solver — the documented fidelity tradeoff for a fully
vmappable, branch-free step (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import spatial as sp
from .contact import contact_terms
from .model import FREE, HINGE, SLIDE, PhysicsModel


@struct.dataclass
class PhysicsState:
    """Dynamic state + cached kinematics (valid for qpos/qvel)."""

    qpos: jax.Array       # (nq,)
    qvel: jax.Array       # (nv,)
    time: jax.Array       # scalar
    xpos: jax.Array       # (nbody, 3) body frame origins, world
    xquat: jax.Array      # (nbody, 4)
    S: jax.Array          # (nv, 6) per-dof motion subspace, origin frame
    body_vel: jax.Array   # (nbody, 6) spatial velocity [w; v_origin]

    def body_linvel(self, bodyid: int) -> jax.Array:
        """World linear velocity of the body-frame origin (mujoco cvel analog)."""
        w = self.body_vel[bodyid, :3]
        v0 = self.body_vel[bodyid, 3:]
        return v0 + jnp.cross(w, self.xpos[bodyid])

    def body_angvel(self, bodyid: int) -> jax.Array:
        return self.body_vel[bodyid, :3]


def _fk(model: PhysicsModel, qpos: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Forward kinematics. Returns xpos (nbody,3), xquat (nbody,4), S (nv,6).

    Level-synchronous: bodies are processed one tree depth at a time, all
    bodies of a level in a single vectorized batch, and joints as vectorized
    (level, slot, type) stages (model.fk_levels, precomputed at build). This
    keeps the HLO op count O(depth), not O(nbody*njoint) — essential both for
    XLA CPU runtime overhead and for vmap(K)/TPU compile times.

    Mirrors mujoco mj_kinematics semantics: body frame = parent frame *
    (body_pos, body_quat), then joint transforms applied in order, each about
    its anchor in the current frame.
    """
    import numpy as np

    dtype = qpos.dtype
    nbody, nv = model.nbody, model.nv

    xpos = jnp.zeros((nbody, 3), dtype)
    xquat = jnp.zeros((nbody, 4), dtype).at[0, 0].set(1.0)

    # per-dof staging for S assembly; free-translation rows are initialized
    # to their constant world axes e_i
    init_axis = np.zeros((nv, 3))
    init_axis[model.dof_type_freet.astype(bool), model.free_axis_idx[model.dof_type_freet.astype(bool)]] = 1.0
    jaxis_w = jnp.asarray(init_axis, dtype)
    janchor_w = jnp.zeros((nv, 3), dtype)

    for level in model.fk_levels:
        pq = xquat[jnp.asarray(level.parent_ids)]                 # (n, 4)
        pp = xpos[jnp.asarray(level.parent_ids)]                  # (n, 3)
        quat = sp.quat_mul(pq, jnp.asarray(level.body_quat, dtype))
        pos = pp + sp.quat_rotate(pq, jnp.asarray(level.body_pos, dtype))

        for st in level.stages:
            rows = jnp.asarray(st.rows)
            if st.jtype == FREE:
                p = qpos[st.qposadr[:, None] + np.arange(3)]      # (n, 3)
                q = sp.quat_normalize(qpos[st.qposadr[:, None] + 3 + np.arange(4)])
                pos = pos.at[rows].set(p)
                quat = quat.at[rows].set(q)
            elif st.jtype == SLIDE:
                qv = qpos[jnp.asarray(st.qposadr)] - jnp.asarray(st.ref, dtype)
                a_w = sp.quat_rotate(quat[rows], jnp.asarray(st.axis, dtype))
                pos = pos.at[rows].add(a_w * qv[:, None])
                jaxis_w = jaxis_w.at[jnp.asarray(st.dofadr)].set(a_w)
            else:  # HINGE
                qv = qpos[jnp.asarray(st.qposadr)] - jnp.asarray(st.ref, dtype)
                qr = quat[rows]
                pr = pos[rows]
                jpos = jnp.asarray(st.jpos, dtype)
                axis = jnp.asarray(st.axis, dtype)
                anchor = pr + sp.quat_rotate(qr, jpos)
                qloc = sp.quat_from_axis_angle(axis, qv)
                qnew = sp.quat_mul(qr, qloc)
                pnew = anchor - sp.quat_rotate(qnew, jpos)
                quat = quat.at[rows].set(qnew)
                pos = pos.at[rows].set(pnew)
                a_w = sp.quat_rotate(qnew, axis)
                dadr = jnp.asarray(st.dofadr)
                jaxis_w = jaxis_w.at[dadr].set(a_w)
                janchor_w = janchor_w.at[dadr].set(anchor)

        xpos = xpos.at[jnp.asarray(level.body_ids)].set(pos)
        xquat = xquat.at[jnp.asarray(level.body_ids)].set(quat)

    # free-joint rotational dofs: axis = R e_i (body-local angular velocity),
    # anchor = body origin
    for qa, da, bid in zip(model.free_qposadr.tolist(),
                           model.free_dofadr.tolist(),
                           model.free_bodyid.tolist()):
        R = sp.quat_to_mat(xquat[bid])
        jaxis_w = jaxis_w.at[da + 3 : da + 6].set(R.T)            # rows = columns of R
        janchor_w = janchor_w.at[da + 3 : da + 6].set(
            jnp.broadcast_to(xpos[bid], (3, 3)))

    rot_mask = jnp.asarray(model.dof_type_hinge + model.dof_type_freer, dtype)[:, None]
    lin_mask = jnp.asarray(model.dof_type_slide + model.dof_type_freet, dtype)[:, None]
    S_ang = jaxis_w * rot_mask
    S_lin = jnp.cross(janchor_w, jaxis_w) * rot_mask + jaxis_w * lin_mask
    S = jnp.concatenate([S_ang, S_lin], axis=-1)
    return xpos, xquat, S


def _spatial_inertias(model: PhysicsModel, xpos, xquat, dtype) -> Tuple[jax.Array, jax.Array]:
    """Per-body spatial inertia about the world origin. Returns (I (nbody,6,6),
    xipos (nbody,3))."""
    R_b = sp.quat_to_mat(xquat)
    ipos = jnp.asarray(model.body_ipos, dtype)
    iquat = jnp.asarray(model.body_iquat, dtype)
    xipos = xpos + jnp.einsum("bij,bj->bi", R_b, ipos)
    iR = sp.quat_to_mat(sp.quat_mul(xquat, iquat))
    I = sp.spatial_inertia_origin(
        jnp.asarray(model.body_mass, dtype),
        jnp.asarray(model.body_inertia, dtype),
        xipos,
        iR,
    )
    return I, xipos


def mass_matrix(model: PhysicsModel, S: jax.Array, I: jax.Array) -> jax.Array:
    """Joint-space mass matrix (nv, nv)."""
    dtype = S.dtype
    A = jnp.asarray(model.ancestor_mask, dtype)          # (nbody, nv)
    # masked body jacobians J_b = diag(A_b) S: contraction via (b,nv,6)
    # intermediates only — never materializes a (nbody, nv, nv) tensor,
    # which matters under vmap(K=8192) on TPU HBM
    J = A[:, :, None] * S[None, :, :]                    # (nbody, nv, 6)
    JI = jnp.einsum("bni,bij->bnj", J, I)
    M = jnp.einsum("bnj,bmj->nm", JI, J)
    return M + jnp.diag(jnp.asarray(model.dof_armature, dtype))


def body_velocities(model: PhysicsModel, S: jax.Array, qvel: jax.Array) -> jax.Array:
    A = jnp.asarray(model.ancestor_mask, qvel.dtype)
    return jnp.einsum("bn,n,ni->bi", A, qvel, S)


def bias_forces(
    model: PhysicsModel, S: jax.Array, I: jax.Array, V: jax.Array, qvel: jax.Array
) -> jax.Array:
    """qfrc_bias (nv,): Coriolis/centrifugal + gravity (sign: M qacc + bias = f)."""
    dtype = qvel.dtype
    A = jnp.asarray(model.ancestor_mask, dtype)
    # Sdot_j qd_j = (V_pred(j) x S_j) qd_j where V_pred(j) is the velocity of
    # the frame S_j is fixed in (pred_mask); free-translation dofs have
    # world-fixed S (sdot_zero).
    P = jnp.asarray(model.pred_mask, dtype)              # (nv, nv)
    V_pred = jnp.einsum("jd,d,di->ji", P, qvel, S)       # (nv, 6)
    live = 1.0 - jnp.asarray(model.sdot_zero, dtype)
    W = sp.motion_cross(V_pred, S) * (qvel * live)[:, None]   # (nv, 6)
    a_g = jnp.concatenate(
        [jnp.zeros(3, dtype), -jnp.asarray(model.gravity, dtype)]
    )
    a_bias = jnp.einsum("bn,ni->bi", A, W) + a_g         # (nbody, 6)
    IV = jnp.einsum("bij,bj->bi", I, V)
    F = jnp.einsum("bij,bj->bi", I, a_bias) + sp.motion_cross_force(V, IV)
    return project_forces(model, S, F)


def project_forces(model: PhysicsModel, S: jax.Array, F_body: jax.Array) -> jax.Array:
    """Project per-body origin-frame spatial forces into joint space:
    tau_n = S_n . sum_b A_{bn} F_b."""
    A = jnp.asarray(model.ancestor_mask, S.dtype)
    return jnp.einsum("bn,bi,ni->n", A, F_body, S)


def _actuator_forces(model: PhysicsModel, qpos, qvel, ctrl) -> jax.Array:
    """qfrc_actuator: motor/position servo torques (mujoco gain/bias model),
    vectorized over all (joint-transmission, single-dof) actuators."""
    dtype = qpos.dtype
    if model.nu == 0:
        return jnp.zeros(model.nv, dtype)
    gear = jnp.asarray(model.act_gear, dtype)
    u = jnp.clip(ctrl, jnp.asarray(model.act_ctrl_lo, dtype),
                 jnp.asarray(model.act_ctrl_hi, dtype))
    length = gear * qpos[jnp.asarray(model.act_qposadr)]
    velocity = gear * qvel[jnp.asarray(model.act_dofadr)]
    bias = jnp.asarray(model.act_bias, dtype)
    force = (jnp.asarray(model.act_gain, dtype) * u
             + bias[:, 0] + bias[:, 1] * length + bias[:, 2] * velocity)
    force = jnp.clip(force, jnp.asarray(model.act_force_lo, dtype),
                     jnp.asarray(model.act_force_hi, dtype))
    return jnp.zeros(model.nv, dtype).at[jnp.asarray(model.act_dofadr)].add(gear * force)


def _passive_forces(model: PhysicsModel, qpos, qvel):
    """Springs, dampers, smooth friction loss, joint-limit and tendon-limit
    penalties (the reference relies on MuJoCo's constraint solver for
    limits; here they are stiff smooth penalties).

    Returns (tau, G_extra) where G_extra (nv, nv) is the velocity-derivative
    of the stiff force terms, folded into the implicit-Euler matrix by the
    caller (h*G_extra) so penalty damping is unconditionally stable even when
    the instantaneous effective inertia drops far below its qpos0 value
    (e.g. a folded hopper leg)."""
    dtype = qpos.dtype
    tau = -jnp.asarray(model.dof_damping, dtype) * qvel
    g_diag = jnp.zeros(model.nv, dtype)
    G_extra = None
    # smooth Coulomb friction loss (implicit linearization of the slope)
    fl = jnp.asarray(model.dof_frictionloss, dtype)
    w_fl = 0.05
    tau = tau - fl * jnp.tanh(qvel / w_fl)
    sech2 = 1.0 - jnp.tanh(qvel / w_fl) ** 2
    g_diag = g_diag + fl / w_fl * sech2

    # springs + limit penalties over all single-dof joints, vectorized.
    # limit scale: k = Mdiag0/tc^2, c = 2*zeta*Mdiag0/tc per dof; damping is
    # made implicit via g_diag so stiff penalties stay stable even when the
    # instantaneous effective inertia drops below its qpos0 value.
    tc, zeta = model.limit_timeconst, model.limit_dampratio
    if model.hs_qposadr.shape[0]:
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        q = qpos[qadr]
        v = qvel[dadr]
        f = -jnp.asarray(model.hs_stiffness, dtype) * (
            q - jnp.asarray(model.hs_springref, dtype))
        lo = jnp.asarray(model.hs_range[:, 0], dtype)
        hi = jnp.asarray(model.hs_range[:, 1], dtype)
        lim = jnp.asarray(model.hs_limited, dtype)
        below = jnp.maximum(lo - q, 0.0)
        above = jnp.maximum(q - hi, 0.0)
        active = ((below > 0) | (above > 0)).astype(dtype) * lim
        k_l = jnp.asarray(model.hs_limit_k, dtype)
        c_l = jnp.asarray(model.hs_limit_c, dtype)
        f = f + (k_l * (below - above)) * lim - c_l * v * active
        tau = tau.at[dadr].add(f)
        g_diag = g_diag.at[dadr].add(c_l * active)

    # fixed-tendon limits (humanoid hamstrings)
    if model.tendon_coef.shape[0]:
        coef = jnp.asarray(model.tendon_coef, dtype)      # (nt, nv)
        # fixed tendon length: L = coef @ (qpos gathered at hinge/slide dofs)
        qd = jnp.zeros(model.nv, dtype).at[jnp.asarray(model.hs_dofadr)].set(
            qpos[jnp.asarray(model.hs_qposadr)])
        L = coef @ qd
        Ldot = coef @ qvel
        lo = jnp.asarray(model.tendon_range[:, 0], dtype)
        hi = jnp.asarray(model.tendon_range[:, 1], dtype)
        lim = jnp.asarray(model.tendon_limited, dtype)
        # effective inertia along each tendon direction
        m_t = jnp.asarray(model.tendon_coef**2 @ model.dof_Mdiag0, dtype)
        k_t = m_t / (tc * tc)
        c_t = 2.0 * zeta * m_t / tc
        below = jnp.maximum(lo - L, 0.0)
        above = jnp.maximum(L - hi, 0.0)
        active = ((below > 0) | (above > 0)).astype(dtype) * lim
        f_t = k_t * (below - above) - c_t * Ldot * active
        tau = tau + coef.T @ (f_t * lim)
        G_extra = jnp.einsum("t,tn,tm->nm", c_t * active * lim, coef, coef)
    G = jnp.diag(g_diag)
    if G_extra is not None:
        G = G + G_extra
    return tau, G


def inverse_dynamics(model: PhysicsModel, state: PhysicsState,
                     qacc: Optional[jax.Array] = None) -> jax.Array:
    """mj_inverse analog: the generalized applied force required to realize
    ``qacc`` at (qpos, qvel), accounting for bias, passive and contact forces:

        qfrc_inverse = M qacc + bias - tau_passive - tau_contact

    (reference src/humanoid_lqr.jl:36,58 uses mj_inverse with qacc=0 for the
    stand-setpoint calibration). With our smooth penalty contacts the contact
    force is an explicit function of state, so no constraint solve is needed
    — and the result is differentiable."""
    dtype = state.qpos.dtype
    qpos, qvel, S = state.qpos, state.qvel, state.S
    I, _ = _spatial_inertias(model, state.xpos, state.xquat, dtype)
    bias = bias_forces(model, S, I, state.body_vel, qvel)
    tau_p, _ = _passive_forces(model, qpos, qvel)
    tau = tau_p
    if model.contact_pairs:
        F_c, _ = contact_terms(model, state, S)
        tau = tau + project_forces(model, S, F_c)
    out = bias - tau
    if qacc is not None:
        M = mass_matrix(model, S, I)
        out = out + M @ qacc
    return out


def actuator_moment(model: PhysicsModel) -> "jnp.ndarray":
    """(nu, nv) transmission moment: qfrc_actuator = moment^T @ force with
    force = gain*ctrl for the motor actuators of the task robots (mujoco
    data.actuator_moment analog; constant for joint transmissions)."""
    import numpy as np

    M = np.zeros((model.nu, model.nv))
    for i, a in enumerate(model.actuators):
        M[i, a.dofadr] = a.gear
    return jnp.asarray(M)


def body_com_jacobian(model: PhysicsModel, state: PhysicsState,
                      bodyid: int) -> jax.Array:
    """(3, nv) world-frame translational jacobian of a body's CoM
    (mj_jacBodyCom analog)."""
    dtype = state.qpos.dtype
    R = sp.quat_to_mat(state.xquat[bodyid])
    xipos = state.xpos[bodyid] + R @ jnp.asarray(model.body_ipos[bodyid], dtype)
    A = jnp.asarray(model.ancestor_mask, dtype)[bodyid]        # (nv,)
    S_ang, S_lin = state.S[:, :3], state.S[:, 3:]              # (nv, 3)
    J = (S_lin + jnp.cross(S_ang, xipos[None, :])) * A[:, None]
    return J.T                                                  # (3, nv)


def subtree_com_jacobian(model: PhysicsModel, state: PhysicsState,
                         rootid: int) -> jax.Array:
    """(3, nv) jacobian of the mass-weighted CoM of ``rootid``'s subtree
    (mj_jacSubtreeCom analog, reference src/humanoid_lqr.jl:99)."""
    import numpy as np

    # static subtree membership
    parent = model.body_parent
    in_sub = np.zeros(model.nbody, bool)
    in_sub[rootid] = True
    for b in range(rootid + 1, model.nbody):
        in_sub[b] = in_sub[parent[b]]
    ids = np.where(in_sub)[0]
    masses = model.body_mass[ids]
    total = float(masses.sum())
    J = jnp.zeros((3, model.nv), state.qpos.dtype)
    for b, mass in zip(ids.tolist(), masses.tolist()):
        J = J + (mass / total) * body_com_jacobian(model, state, b)
    return J


def forward(model: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
            time: Optional[jax.Array] = None) -> PhysicsState:
    """Compute kinematics caches for (qpos, qvel) — mujoco mj_forward analog."""
    xpos, xquat, S = _fk(model, qpos)
    V = body_velocities(model, S, qvel)
    t = jnp.asarray(0.0, qpos.dtype) if time is None else time
    return PhysicsState(qpos=qpos, qvel=qvel, time=t, xpos=xpos, xquat=xquat,
                        S=S, body_vel=V)


def _integrate_qpos(model: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
                    h: float) -> jax.Array:
    out = qpos
    if model.hs_qposadr.shape[0]:
        qadr = jnp.asarray(model.hs_qposadr)
        out = out.at[qadr].add(h * qvel[jnp.asarray(model.hs_dofadr)])
    for qa, da in zip(model.free_qposadr.tolist(), model.free_dofadr.tolist()):
        pos = qpos[qa : qa + 3]
        quat = qpos[qa + 3 : qa + 7]
        v = qvel[da : da + 3]
        w_local = qvel[da + 3 : da + 6]
        out = out.at[qa : qa + 3].set(pos + h * v)
        out = out.at[qa + 3 : qa + 7].set(
            sp.quat_integrate(quat, w_local, jnp.asarray(h, qpos.dtype))
        )
    return out


def step(model: PhysicsModel, state: PhysicsState, ctrl: jax.Array) -> PhysicsState:
    """One physics step (mujoco mj_step analog): forward dynamics + Euler."""
    dtype = state.qpos.dtype
    h = model.timestep
    qpos, qvel, S = state.qpos, state.qvel, state.S

    I, _ = _spatial_inertias(model, state.xpos, state.xquat, dtype)
    V = state.body_vel
    M = mass_matrix(model, S, I)
    bias = bias_forces(model, S, I, V, qvel)

    tau = _actuator_forces(model, qpos, qvel, ctrl)
    tau_p, G_p = _passive_forces(model, qpos, qvel)
    tau = tau + tau_p
    G_c = None
    if model.contact_pairs:
        F_c, G_c = contact_terms(model, state, S)        # (nbody,6), (nv,nv)
        tau = tau + project_forces(model, S, F_c)

    # implicit-damping Euler (mujoco mj_Euler): qacc = (M + h D)^-1 f_explicit,
    # extended with implicit contact/limit/friction damping terms h*G
    Mh = M + h * jnp.diag(jnp.asarray(model.dof_damping, dtype)) + h * G_p
    if G_c is not None:
        Mh = Mh + h * G_c
    f = tau - bias
    L = jax.scipy.linalg.cho_factor(Mh)
    qacc = jax.scipy.linalg.cho_solve(L, f)

    qvel_new = qvel + h * qacc
    qpos_new = _integrate_qpos(model, qpos, qvel_new, h)

    new = forward(model, qpos_new, qvel_new, state.time + h)
    return new
