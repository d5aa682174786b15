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

Contacts and joint limits come in two tiers (see `step`): the default
"coupled" tier replicates MuJoCo's convex constraint QP (pyramidal friction
cone, solimp regularizer, projected Gauss-Seidel — still branch-free and
vmappable), while the "penalty" tier is the decoupled per-row impedance law
the Pallas rollout mega-kernel implements for K=8192-lane planning
(SURVEY.md §7 "hard parts"; fidelity numbers in PARITY.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import spatial as sp
from .contact import contact_terms
from .model import BALL, FREE, HINGE, SLIDE, PhysicsModel


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
            elif st.jtype == BALL:
                # quaternion rotation about the joint anchor (mj_kinematics
                # ball semantics); S rows like the free joint's rotational
                # block — columns of the post-joint rotation (body-local
                # angular velocity), anchored at the joint anchor
                q4 = sp.quat_normalize(
                    qpos[st.qposadr[:, None] + np.arange(4)])
                qr = quat[rows]
                pr = pos[rows]
                jpos = jnp.asarray(st.jpos, dtype)
                anchor = pr + sp.quat_rotate(qr, jpos)
                qnew = sp.quat_mul(qr, q4)
                pnew = anchor - sp.quat_rotate(qnew, jpos)
                quat = quat.at[rows].set(qnew)
                pos = pos.at[rows].set(pnew)
                R = sp.quat_to_mat(qnew)                  # (n, 3, 3)
                drows = st.dofadr[:, None] + np.arange(3)
                jaxis_w = jaxis_w.at[jnp.asarray(drows)].set(
                    jnp.swapaxes(R, -1, -2))              # rows = R columns
                janchor_w = janchor_w.at[jnp.asarray(drows)].set(
                    jnp.broadcast_to(anchor[:, None, :], anchor.shape[:1] + (3, 3)))
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


def spatial_tendon_geometry(model: PhysicsModel, state: "PhysicsState"):
    """(L (nst,), moment (nst, nv)) of the straight site-chain spatial
    tendons (round-5; mj_tendon site-wrap semantics without geom wraps):
    L = sum of segment lengths; moment = dL/dqvel = sum over segments of
    the unit segment direction dotted into the endpoint point-jacobian
    difference. State-dependent, unlike the fixed tendons' static coef."""
    dtype = state.qpos.dtype
    A = jnp.asarray(model.ancestor_mask, dtype)
    S_ang, S_lin = state.S[:, :3], state.S[:, 3:]          # (nv, 3)
    Ls, Ms = [], []
    for _tid, bodies, lpos in model.spatial_tendons:
        pts = []
        for b, lp in zip(bodies, lpos):
            R_b = sp.quat_to_mat(state.xquat[b])
            pts.append(state.xpos[b] + R_b @ jnp.asarray(lp, dtype))
        L = jnp.asarray(0.0, dtype)
        mom = jnp.zeros(model.nv, dtype)
        for i in range(len(pts) - 1):
            d = pts[i + 1] - pts[i]
            ln = jnp.sqrt(jnp.sum(d * d) + 1e-24)
            dh = d / ln
            L = L + ln
            for bb, pp, sgn in ((bodies[i + 1], pts[i + 1], 1.0),
                                (bodies[i], pts[i], -1.0)):
                Jp = (S_lin + jnp.cross(S_ang, pp[None, :])) * A[bb][:, None]
                mom = mom + sgn * (Jp @ dh)
        Ls.append(L)
        Ms.append(mom)
    return jnp.stack(Ls), jnp.stack(Ms)


def _actuator_forces(model: PhysicsModel, qpos, qvel, ctrl,
                     state: "PhysicsState" = None) -> jax.Array:
    """qfrc_actuator: motor/position servo torques (mujoco gain/bias model),
    vectorized over all (joint-transmission, single-dof) actuators; motor
    transmissions on ball/free joints (gear vector over the joint's dofs),
    fixed tendons, and sites (need ``state`` kinematics for the site
    Jacobian) are applied per-actuator below."""
    dtype = qpos.dtype
    if model.nu == 0:
        return jnp.zeros(model.nv, dtype)
    sel = (np.arange(model.nu) if model.act_single_idx is None
           else model.act_single_idx)
    qfrc = jnp.zeros(model.nv, dtype)
    if len(sel):
        gear = jnp.asarray(model.act_gear[sel], dtype)
        u = jnp.clip(ctrl[jnp.asarray(sel)],
                     jnp.asarray(model.act_ctrl_lo[sel], dtype),
                     jnp.asarray(model.act_ctrl_hi[sel], dtype))
        length = gear * qpos[jnp.asarray(model.act_qposadr[sel])]
        velocity = gear * qvel[jnp.asarray(model.act_dofadr[sel])]
        bias = jnp.asarray(model.act_bias[sel], dtype)
        force = (jnp.asarray(model.act_gain[sel], dtype) * u
                 + bias[:, 0] + bias[:, 1] * length + bias[:, 2] * velocity)
        force = jnp.clip(force, jnp.asarray(model.act_force_lo[sel], dtype),
                         jnp.asarray(model.act_force_hi[sel], dtype))
        qfrc = qfrc.at[jnp.asarray(model.act_dofadr[sel])].add(gear * force)
    for i, act in enumerate(model.actuators):
        if act.site_bodyid >= 0:
            # site transmission (mjTRN_SITE, no refsite): unit wrench =
            # site-frame gear rotated to world, moment = S-projection onto
            # the site's body chain; length = 0, velocity = moment . qvel
            # (mj_transmission site branch)
            if state is None:
                raise ValueError(
                    "site-transmission actuators need state kinematics")
            b = act.site_bodyid
            S = state.S
            R_b = sp.quat_to_mat(state.xquat[b])
            p_s = state.xpos[b] + R_b @ jnp.asarray(act.site_pos, dtype)
            R_s = R_b @ sp.quat_to_mat(jnp.asarray(act.site_quat, dtype))
            gv = jnp.asarray(act.gear6, dtype)
            Fw = R_s @ gv[:3]
            tau0 = R_s @ gv[3:] + jnp.cross(p_s, Fw)
            anc = jnp.asarray(model.ancestor_mask, dtype)[b]
            moment = (S[:, :3] @ tau0 + S[:, 3:] @ Fw) * anc      # (nv,)
            vel = moment @ qvel
            u = ctrl[i]
            if act.ctrllimited:
                u = jnp.clip(u, float(act.ctrlrange[0]),
                             float(act.ctrlrange[1]))
            force = (float(act.gain) * u + float(act.bias[0])
                     + float(act.bias[2]) * vel)
            if act.forcelimited:
                force = jnp.clip(force, float(act.forcerange[0]),
                                 float(act.forcerange[1]))
            qfrc = qfrc + moment * force
            continue
        if act.tendon_id >= 0 and model.tendon_is_spatial is not None \
                and model.tendon_is_spatial[act.tendon_id]:
            # spatial-tendon transmission: state-dependent length/moment
            if state is None:
                raise ValueError(
                    "spatial-tendon actuators need state kinematics")
            idx = [k for k, (tid, *_ ) in enumerate(model.spatial_tendons)
                   if tid == act.tendon_id][0]
            L_all, M_all = spatial_tendon_geometry(model, state)
            moment = float(act.gear) * M_all[idx]
            length = float(act.gear) * L_all[idx]
            vel = moment @ qvel
            u = ctrl[i]
            if act.ctrllimited:
                u = jnp.clip(u, float(act.ctrlrange[0]),
                             float(act.ctrlrange[1]))
            force = (float(act.gain) * u + float(act.bias[0])
                     + float(act.bias[1]) * length
                     + float(act.bias[2]) * vel)
            if act.forcelimited:
                force = jnp.clip(force, float(act.forcerange[0]),
                                 float(act.forcerange[1]))
            qfrc = qfrc + moment * force
            continue
        if act.tendon_id >= 0:
            # fixed-tendon transmission (mjTRN_TENDON): length/velocity are
            # the gear-scaled tendon coordinates, moment = gear * coef row
            coef = jnp.asarray(model.tendon_coef[act.tendon_id], dtype)
            qd = jnp.zeros(model.nv, dtype).at[
                jnp.asarray(model.hs_dofadr)].set(
                    qpos[jnp.asarray(model.hs_qposadr)])
            length = float(act.gear) * (coef @ qd)
            vel = float(act.gear) * (coef @ qvel)
            u = ctrl[i]
            if act.ctrllimited:
                u = jnp.clip(u, float(act.ctrlrange[0]),
                             float(act.ctrlrange[1]))
            force = (float(act.gain) * u + float(act.bias[0])
                     + float(act.bias[1]) * length
                     + float(act.bias[2]) * vel)
            if act.forcelimited:
                force = jnp.clip(force, float(act.forcerange[0]),
                                 float(act.forcerange[1]))
            qfrc = qfrc + coef * (float(act.gear) * force)
            continue
        if act.ndof == 1:
            continue
        # motor-type only (model build guards position/bias servos):
        # force = gain * u, qfrc[dofs] += gear[:ndof] * force; velocity
        # bias uses the gear projection of qvel (MuJoCo actuator_velocity)
        u = ctrl[i]
        if act.ctrllimited:
            u = jnp.clip(u, float(act.ctrlrange[0]), float(act.ctrlrange[1]))
        gv = jnp.asarray(act.gear6[:act.ndof], dtype)
        vel = gv @ qvel[act.dofadr:act.dofadr + act.ndof]
        force = float(act.gain) * u + float(act.bias[2]) * vel
        if act.forcelimited:
            force = jnp.clip(force, float(act.forcerange[0]),
                             float(act.forcerange[1]))
        qfrc = qfrc.at[act.dofadr:act.dofadr + act.ndof].add(gv * force)
    return qfrc


def _limit_force(viol, pos_dot, a0_pos, solref, solimp, meff, lim, dtype,
                 r_form: bool = False, h: float = 0.0):
    """Shared solref/solimp limit force law (MuJoCo limit constraints use
    the same soft-constraint dynamics as contacts — see contact.py):

        f = max(m_eff * d(r) * (d(r) k_base viol - b pos_dot - a0_pos), 0)

    viol >= 0 is the violation; pos_dot and a0_pos are the velocity and the
    unconstrained acceleration in CONSTRAINT-space convention (pos = -viol,
    the direction the force pushes): moving deeper into violation means
    pos_dot < 0, which increases the force.

    Two exact readings of MuJoCo's soft constraint f = (aref - a)/(A + R):
    - forward/penalty (r_form=False): a0_pos is the UNCONSTRAINED
      acceleration a0, and (A+R)^-1 = d(r) m_eff.
    - inverse (r_form=True, mj_inverse analog): a0_pos is the REALIZED
      acceleration a1 = J qacc, and the force is f = (aref - a1)/R with
      R = (1-d)/d * 1/m_eff — uniquely determined by the given motion.

    Returns (force_magnitude, implicit_damping_coefficient)."""
    from .contact import impedance, solref_kb

    k_base, b_ref = solref_kb(solref, solimp)           # static numpy
    active = (viol > 0).astype(dtype) * lim
    d_r = impedance(viol, solimp).astype(dtype)
    me = jnp.asarray(meff, dtype)
    gain = me * d_r
    if r_form:
        gain = gain / jnp.maximum(1.0 - d_r, 1e-6)
    f_c = jnp.maximum(
        gain * (d_r * jnp.asarray(k_base, dtype) * viol
                - jnp.asarray(b_ref, dtype) * pos_dot - a0_pos),
        0.0) * active
    if h and not r_form:
        # restitution cap (contact.RESTITUTION_VCAP): the limit may brake
        # without bound but only push back out up to the cap velocity —
        # prevents joint-limit catapults (same exploit as contact slams)
        from .contact import RESTITUTION_VCAP

        f_c = jnp.minimum(
            f_c, me * jnp.maximum(RESTITUTION_VCAP - pos_dot, 0.0) / h)
    c = me * d_r * jnp.asarray(b_ref, dtype) * active
    return f_c, c


def _passive_forces(model: PhysicsModel, qpos, qvel,
                    frictionloss: bool = True):
    """Springs, dampers, smooth friction loss, joint-limit and tendon-limit
    penalties (the reference relies on MuJoCo's constraint solver for
    limits; here they are smooth penalties with solref/solimp-matched
    impedance — see contact.py for the force law).

    frictionloss=False: skip the smooth tanh Coulomb friction (the coupled
    Newton tier resolves dof_frictionloss as Huber constraint rows exactly
    as MuJoCo does — physics/newton.py; the tanh is the decoupled penalty
    tier's smooth approximation).

    Returns (tau, G_extra) where G_extra (nv, nv) is the velocity-derivative
    of the stiff force terms, folded into the implicit-Euler matrix by the
    caller (h*G_extra) so penalty damping is unconditionally stable even when
    the instantaneous effective inertia drops far below its qpos0 value
    (e.g. a folded hopper leg)."""
    dtype = qpos.dtype
    tau = -jnp.asarray(model.dof_damping, dtype) * qvel
    g_diag = jnp.zeros(model.nv, dtype)
    G_extra = None
    if frictionloss:
        # smooth Coulomb friction loss (implicit linearization of the slope)
        fl = jnp.asarray(model.dof_frictionloss, dtype)
        w_fl = 0.05
        tau = tau - fl * jnp.tanh(qvel / w_fl)
        sech2 = 1.0 - jnp.tanh(qvel / w_fl) ** 2
        g_diag = g_diag + fl / w_fl * sech2

    # joint springs (smooth, not constraints)
    if model.hs_qposadr.shape[0]:
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        f = -jnp.asarray(model.hs_stiffness, dtype) * (
            qpos[qadr] - jnp.asarray(model.hs_springref, dtype))
        tau = tau.at[dadr].add(f)
    # ball-joint quaternion springs: tau[dofs] = -k * subQuat(q, q_spring)
    # (MuJoCo mj_passive ball branch — local-frame rotation vector)
    for dofadr, qadr, k, qref in model.ball_springs:
        q = qpos[qadr:qadr + 4]
        vec = sp.quat_sub(q, jnp.asarray(qref, dtype))
        tau = tau.at[dofadr:dofadr + 3].add(-k * vec)
    return tau, jnp.diag(g_diag)


def _limit_constraint_forces(model: PhysicsModel, qpos, qvel, qacc0,
                             r_form: bool = False, h: float = 0.0,
                             state: "PhysicsState" = None):
    """Joint-limit and tendon-limit constraint penalties with a0
    compensation (r_form=True: inverse-mode R-scaling, see _limit_force).
    Returns (tau (nv,), G (nv, nv) implicit damping)."""
    dtype = qpos.dtype
    tau = jnp.zeros(model.nv, dtype)
    g_diag = jnp.zeros(model.nv, dtype)
    G_extra = None

    if model.hs_qposadr.shape[0]:
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        q = qpos[qadr]
        v = qvel[dadr]
        a0 = qacc0[dadr]
        lo = jnp.asarray(model.hs_range[:, 0], dtype)
        hi = jnp.asarray(model.hs_range[:, 1], dtype)
        lim = jnp.asarray(model.hs_limited, dtype)
        below = jnp.maximum(lo - q, 0.0)
        above = jnp.maximum(q - hi, 0.0)
        viol = below + above
        s = jnp.sign(below - above)        # push-back direction in dof space
        # constraint-space (pos = -viol) velocity/acceleration: s * qdot
        f_c, c_l = _limit_force(viol, s * v, s * a0,
                                model.hs_limit_solref,
                                model.hs_limit_solimp, model.hs_limit_meff,
                                lim, dtype, r_form=r_form, h=h)
        tau = tau.at[dadr].add(s * f_c)
        g_diag = g_diag.at[dadr].add(c_l)

    # fixed-tendon limits (humanoid hamstrings); spatial tendons are
    # masked out of the static-coef path and handled below
    if model.tendon_coef.shape[0]:
        not_spatial = (np.ones(model.tendon_coef.shape[0])
                       if model.tendon_is_spatial is None
                       else 1.0 - model.tendon_is_spatial.astype(float))
        coef = jnp.asarray(model.tendon_coef, dtype)      # (nt, nv)
        # fixed tendon length: L = coef @ (qpos gathered at hinge/slide dofs)
        qd = jnp.zeros(model.nv, dtype).at[jnp.asarray(model.hs_dofadr)].set(
            qpos[jnp.asarray(model.hs_qposadr)])
        L = coef @ qd
        Ldot = coef @ qvel
        La0 = coef @ qacc0
        lo = jnp.asarray(model.tendon_range[:, 0], dtype)
        hi = jnp.asarray(model.tendon_range[:, 1], dtype)
        lim = jnp.asarray(model.tendon_limited * not_spatial, dtype)
        below = jnp.maximum(lo - L, 0.0)
        above = jnp.maximum(L - hi, 0.0)
        viol = below + above
        s = jnp.sign(below - above)
        f_c, c_t = _limit_force(viol, s * Ldot, s * La0,
                                model.tendon_limit_solref,
                                model.tendon_limit_solimp,
                                model.tendon_limit_meff, lim, dtype,
                                r_form=r_form, h=h)
        tau = tau + coef.T @ (s * f_c)
        G_extra = jnp.einsum("t,tn,tm->nm", c_t, coef, coef)

    # spatial-tendon limits: same law over the state-dependent site-chain
    # length with the traced moment row as J (round-5)
    if model.spatial_tendons:
        if state is None:
            raise ValueError("spatial-tendon limits need state kinematics")
        sids = np.array([t[0] for t in model.spatial_tendons])
        if model.tendon_limited[sids].any():
            L_sp, M_sp = spatial_tendon_geometry(model, state)  # (ns,),(ns,nv)
            Ldot = M_sp @ qvel
            La0 = M_sp @ qacc0
            lo = jnp.asarray(model.tendon_range[sids, 0], dtype)
            hi = jnp.asarray(model.tendon_range[sids, 1], dtype)
            lim = jnp.asarray(model.tendon_limited[sids], dtype)
            below = jnp.maximum(lo - L_sp, 0.0)
            above = jnp.maximum(L_sp - hi, 0.0)
            viol = below + above
            s = jnp.sign(below - above)
            f_c, c_t = _limit_force(viol, s * Ldot, s * La0,
                                    model.tendon_limit_solref[sids],
                                    model.tendon_limit_solimp[sids],
                                    model.tendon_limit_meff[sids], lim,
                                    dtype, r_form=r_form, h=h)
            tau = tau + M_sp.T @ (s * f_c)
            G_sp = jnp.einsum("t,tn,tm->nm", c_t, M_sp, M_sp)
            G_extra = G_sp if G_extra is None else G_extra + G_sp

    # ball-joint rotation-angle limits: constraint row J = -axis over the
    # ball's 3 dofs (pushing the rotation vector back toward zero), same
    # solref/solimp law as single-dof limits (penalty tier)
    for dofadr, qadr, max_angle, solref, solimp, meff in model.ball_limits:
        q = qpos[qadr:qadr + 4]
        rotvec = sp.quat_log(q)
        angle = jnp.sqrt(jnp.sum(rotvec * rotvec) + 1e-24)
        axis = rotvec / angle
        viol = jnp.maximum(angle - max_angle, 0.0)
        v_row = -(axis @ qvel[dofadr:dofadr + 3])
        a_row = -(axis @ qacc0[dofadr:dofadr + 3])
        f_c, c_b = _limit_force(viol[None], v_row[None], a_row[None],
                                np.asarray(solref)[None],
                                np.asarray(solimp)[None],
                                np.asarray([meff]),
                                jnp.ones(1, dtype), dtype,
                                r_form=r_form, h=h)
        tau = tau.at[dofadr:dofadr + 3].add(-axis * f_c[0])
        Gb = c_b[0] * jnp.outer(axis, axis)
        pad = jnp.zeros((model.nv, model.nv), dtype).at[
            dofadr:dofadr + 3, dofadr:dofadr + 3].set(Gb)
        G_extra = pad if G_extra is None else G_extra + pad
    G = jnp.diag(g_diag)
    if G_extra is not None:
        G = G + G_extra
    return tau, G


def _full_f32_matmuls(fn):
    """Trace `fn` under HIGHEST matmul precision. TPU f32 dots default to
    bfloat16 multiply passes on the MXU, which is fine for the MPPI noise
    reductions but NOT for the plant's stiff constraint solve: the coupled
    PGS iteration (A = J M^-1 J^T, 25 sweeps) diverges to NaN under violent
    contacts at bf16-pass precision while plain f32 stays stable (observed
    on a humanoid collection episode: CPU f32 fine, TPU default NaN in one
    step). The plant is ONE sample with 27x27 matrices — latency-bound, so
    full-precision passes cost nothing measurable."""

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


@_full_f32_matmuls
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
    # constraint forces evaluated at the GIVEN motion (mujoco inverse mode:
    # f = (aref - J qacc)/R, uniquely determined by the realized motion)
    qacc0 = jnp.zeros(model.nv, dtype) if qacc is None else qacc
    if bool(model.hs_limited.any() or model.tendon_limited.any()):
        tau_l, _ = _limit_constraint_forces(model, qpos, qvel, qacc0,
                                            r_form=True, state=state)
        tau = tau + tau_l
    if model.contact_pairs:
        tau_c, _ = contact_terms(model, state, S, qacc0, r_form=True)
        tau = tau + tau_c
    out = bias - tau
    if qacc is not None:
        M = mass_matrix(model, S, I)
        out = out + M @ qacc
    return out


def actuator_moment(model: PhysicsModel,
                    state: "PhysicsState" = None) -> "jnp.ndarray":
    """(nu, nv) transmission moment: qfrc_actuator = moment^T @ force with
    force = gain*ctrl for the motor actuators of the task robots (mujoco
    data.actuator_moment analog; constant for joint/tendon transmissions).

    Site-transmission moments are STATE-DEPENDENT (the world wrench rotates
    with the site's body): pass ``state`` kinematics to evaluate them at
    that configuration (so solver/lqr can linearize thruster-style models,
    round-4 advisor item); without a state they refuse loudly."""
    import numpy as np

    M = np.zeros((model.nu, model.nv))
    site_rows = []
    for i, a in enumerate(model.actuators):
        if a.site_bodyid >= 0:
            if state is None:
                raise NotImplementedError(
                    "site-transmission moments are state-dependent; pass "
                    "state kinematics (actuator_moment(model, state)) or "
                    "use _actuator_forces")
            site_rows.append(i)
        elif a.tendon_id >= 0 and model.tendon_is_spatial is not None \
                and model.tendon_is_spatial[a.tendon_id]:
            if state is None:
                raise NotImplementedError(
                    "spatial-tendon moments are state-dependent; pass "
                    "state kinematics (actuator_moment(model, state))")
            site_rows.append(("tendon", i))
        elif a.tendon_id >= 0:
            M[i] = a.gear * model.tendon_coef[a.tendon_id]
        elif a.ndof > 1:
            M[i, a.dofadr:a.dofadr + a.ndof] = a.gear6[:a.ndof]
        else:
            M[i, a.dofadr] = a.gear
    Mj = jnp.asarray(M, state.qpos.dtype if state is not None else None)
    for entry in site_rows:
        if isinstance(entry, tuple):      # spatial-tendon row
            i = entry[1]
            a = model.actuators[i]
            idx = [k for k, (tid, *_ ) in enumerate(model.spatial_tendons)
                   if tid == a.tendon_id][0]
            _, M_sp = spatial_tendon_geometry(model, state)
            Mj = Mj.at[i].set(float(a.gear) * M_sp[idx])
            continue
        i = entry
        a = model.actuators[i]
        dtype = state.qpos.dtype
        b = a.site_bodyid
        R_b = sp.quat_to_mat(state.xquat[b])
        p_s = state.xpos[b] + R_b @ jnp.asarray(a.site_pos, dtype)
        R_s = R_b @ sp.quat_to_mat(jnp.asarray(a.site_quat, dtype))
        gv = jnp.asarray(a.gear6, dtype)
        Fw = R_s @ gv[:3]
        tau0 = R_s @ gv[3:] + jnp.cross(p_s, Fw)
        anc = jnp.asarray(model.ancestor_mask, dtype)[b]
        row = (state.S[:, :3] @ tau0 + state.S[:, 3:] @ Fw) * anc
        Mj = Mj.at[i].set(row)
    return Mj


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


@_full_f32_matmuls
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
    for jnt in model.joints:
        if jnt.jtype != BALL:
            continue
        qa, da = jnt.qposadr, jnt.dofadr
        out = out.at[qa : qa + 4].set(
            sp.quat_integrate(qpos[qa : qa + 4], qvel[da : da + 3],
                              jnp.asarray(h, qpos.dtype)))
    return out


# when set to a dict (and the call is NOT jitted), _coupled_constraint_terms
# stashes its QP rows/solution for offline fidelity triage
_COUPLED_DEBUG = None


def _coupled_constraint_terms(model: PhysicsModel, state: PhysicsState,
                              S, L0, qacc0, n_iter: int = 25):
    """Coupled constraint solve: contact pyramid rows + joint/tendon limits.

    Faithful analog of MuJoCo's convex constraint QP (mj docs "Computation",
    pyramidal friction cone, the solver the reference runs through mj_step):

        f = argmin_{f>=0}  1/2 f^T (A + R) f - f^T (aref - a0)

    over rows
      - contact pyramid edges J = Jn ± mu Jt_i for each tangent direction
        (condim>1; a single Jn row when frictionless), with
        aref = d(r) k pen - b (vn ± mu vt_i) — friction and normal forces
        are coupled through the cone exactly as in MuJoCo,
      - joint-limit and tendon-limit rows,
    with A = J M^-1 J^T (plain M incl. armature) and the solimp regularizer
    R = diag((1-d)/d A_ii). Solved with a fixed count of projected, damped
    Jacobi iterations — branch-free, vmappable, MXU-friendly (each iteration
    is one (C,C)@(C,) matvec with C ~ 40-100).

    The solved forces are applied EXPLICITLY (tau = J^T f, no implicit
    damping term), exactly as MuJoCo's Euler pipeline does — the QP already
    bounds them, so no extra stabilization is needed. Returns tau (nv,).
    """
    from .contact import (RESTITUTION_VCAP, collect_contact_rows, impedance,
                          solref_kb)
    import numpy as np

    dtype = state.qpos.dtype
    nv = model.nv
    qpos, qvel = state.qpos, state.qvel
    h = float(model.timestep)

    def _cap(aref, v_row):
        # restitution cap (contact.RESTITUTION_VCAP), CONTACT rows only: the
        # QP drives the row acceleration toward aref, so post-step row
        # velocity ~ v + h*aref; bound aref so a stored deep foot-floor
        # penetration cannot catapult the row past the cap separation
        # velocity (the MPPI seed-0 "fly to goal" exploit,
        # tests/test_restitution_cap.py). The bound is floored at 0: a row
        # already separating faster than the cap from its own smooth
        # dynamics must keep its RAW (negative, braking) aref — clamping it
        # to (VCAP - v)/h there would demand violent deceleration the f>=0
        # solver converts into a wrong force (golden frame 574: the knee
        # limit row exits at 13.9 rad/s with aref=-1230 and a legitimate
        # braking force of +106; the unfloored cap distorted it to +24,
        # a 3.2e-2 one-step qpos error).
        #
        # Joint/tendon-limit rows are NOT capped in this (environment/golden)
        # tier: MuJoCo — the oracle this tier is measured against — has no
        # such cap, a violated limit legitimately demands large aref (golden
        # frame 1063: mj aref 681.7 on a knee row, the cap distorted it to
        # 38.6, a 1.5e-2 qpos error — the whole ladder tail), and a limit
        # ejects within the bounded joint range so it cannot launch the
        # robot the way a floor spring can. The PLANNER tier
        # (ops/scalar_physics.py) keeps its cap on every row class so MPPI
        # cannot seek limit-spring energy exploits.
        return jnp.minimum(aref, jnp.maximum(
            (RESTITUTION_VCAP - v_row) / h, 0.0))

    Js, arefs, imps, actives = [], [], [], []
    diagapx = []  # per-row MuJoCo diagApprox (invweight0-based) for R
    slots = []  # static per-row color for the 4-color projected GS (below)
    rows = collect_contact_rows(model, state, S) if model.contact_pairs else None
    if rows is not None:
        kb = rows["k_base"]
        br = rows["b_ref"]
        base = rows["d_r"] * kb * rows["pen"]                # (P,)
        # frictionless/friction row split must be STATIC: plane rows have
        # static mu; the K self-row slots always get pyramid rows (their
        # traced mu is ~always > 0 — geom friction defaults; a zero comes
        # through as 4 coincident normal rows, a benign degeneracy)
        mu_pl = np.asarray(rows["mu_plane_static"], dtype=np.float64)
        fr = np.concatenate([
            np.nonzero(mu_pl > 0)[0],
            rows["n_plane"] + np.arange(rows["n_self"]),
        ]).astype(np.int64)
        nf = np.nonzero(mu_pl == 0)[0]
        if nf.size:
            Js.append(rows["JpN"][nf])
            arefs.append(_cap(base[nf] - br[nf] * rows["vn"][nf],
                              rows["vn"][nf]))
            imps.append(rows["d_r"][nf])
            actives.append(rows["active"][nf])
            diagapx.append(rows["invw"][nf])
            slots.append(np.zeros(nf.size, np.int32))
        if fr.size:
            mu_f = rows["mu"][fr][:, None, None]                 # (F,1,1)
            Jn = rows["JpN"][fr]                                 # (F, nv)
            Jt = jnp.stack([rows["Jt1"][fr], rows["Jt2"][fr]], 1)  # (F,2,nv)
            vt = jnp.stack([rows["vt1"][fr], rows["vt2"][fr]], 1)  # (F,2)
            sgn = jnp.asarray([1.0, -1.0], dtype)
            # pyramid rows (F, 2 tangents, 2 signs, nv) -> (F*4, nv)
            Jpyr = (Jn[:, None, None, :]
                    + mu_f[..., None] * sgn[None, None, :, None]
                    * Jt[:, :, None, :])
            vel = (rows["vn"][fr][:, None, None]
                   + mu_f * sgn[None, None, :] * vt[:, :, None])   # (F,2,2)
            aref_p = _cap(base[fr][:, None, None]
                          - br[fr][:, None, None] * vel, vel)
            F = fr.size
            Js.append(Jpyr.reshape(F * 4, nv))
            arefs.append(aref_p.reshape(F * 4))
            rep = lambda x: jnp.repeat(x[fr], 4)
            imps.append(rep(rows["d_r"]))
            actives.append(rep(rows["active"]))
            # pyramid-facet diagApprox: invw0 * 2 mu^2 (1 + mu^2) — MuJoCo's
            # mj_diagApprox law, recovered numerically (dev_frame_triage.py)
            mu1 = rows["mu"]
            diagapx.append(rep(rows["invw"] * 2.0 * mu1 * mu1
                               * (1.0 + mu1 * mu1)))
            slots.append(np.tile(np.arange(4, dtype=np.int32), F))

    if model.hs_qposadr.shape[0] and model.hs_limited.any():
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        q, v = qpos[qadr], qvel[dadr]
        lo = jnp.asarray(model.hs_range[:, 0], dtype)
        hi = jnp.asarray(model.hs_range[:, 1], dtype)
        lim = jnp.asarray(model.hs_limited, dtype)
        below = jnp.maximum(lo - q, 0.0)
        above = jnp.maximum(q - hi, 0.0)
        viol = below + above
        s = jnp.sign(below - above)
        k_base, b_ref = solref_kb(model.hs_limit_solref, model.hs_limit_solimp)
        d_l = impedance(viol, model.hs_limit_solimp).astype(dtype)
        E = np.zeros((len(model.hs_dofadr), nv))
        E[np.arange(len(model.hs_dofadr)), model.hs_dofadr] = 1.0
        J_l = s[:, None] * jnp.asarray(E, dtype)
        active_l = (viol > 0).astype(dtype) * lim
        Js.append(J_l)
        arefs.append(d_l * jnp.asarray(k_base, dtype) * viol
                     - jnp.asarray(b_ref, dtype) * (s * v))
        imps.append(d_l)
        actives.append(active_l)
        diagapx.append(jnp.asarray(model.hs_limit_invw0, dtype))
        slots.append(np.zeros(len(model.hs_dofadr), np.int32))

    if model.tendon_coef.shape[0] and model.tendon_limited.any():
        if (model.tendon_is_spatial is not None
                and (model.tendon_limited
                     & model.tendon_is_spatial).any()):
            # legacy PGS tier kept for triage only; spatial-tendon limits
            # live in the newton/penalty tiers
            raise NotImplementedError(
                "spatial-tendon limits unsupported in the coupled_pgs "
                "tier (use the default coupled/newton or penalty tier)")
        coef = jnp.asarray(model.tendon_coef, dtype)
        qd = jnp.zeros(nv, dtype).at[jnp.asarray(model.hs_dofadr)].set(
            qpos[jnp.asarray(model.hs_qposadr)])
        L = coef @ qd
        Ldot = coef @ qvel
        lo = jnp.asarray(model.tendon_range[:, 0], dtype)
        hi = jnp.asarray(model.tendon_range[:, 1], dtype)
        lim = jnp.asarray(model.tendon_limited, dtype)
        below = jnp.maximum(lo - L, 0.0)
        above = jnp.maximum(L - hi, 0.0)
        viol = below + above
        s = jnp.sign(below - above)
        k_base, b_ref = solref_kb(model.tendon_limit_solref,
                                  model.tendon_limit_solimp)
        d_t = impedance(viol, model.tendon_limit_solimp).astype(dtype)
        J_t = s[:, None] * coef
        active_t = (viol > 0).astype(dtype) * lim
        Js.append(J_t)
        arefs.append(d_t * jnp.asarray(k_base, dtype) * viol
                     - jnp.asarray(b_ref, dtype) * (s * Ldot))
        imps.append(d_t)
        actives.append(active_t)
        diagapx.append(jnp.asarray(model.tendon_invweight0, dtype))
        slots.append(np.zeros(model.tendon_coef.shape[0], np.int32))

    if not Js:
        return jnp.zeros(nv, dtype)

    J = jnp.concatenate(Js, axis=0)                    # (C, nv)
    aref = jnp.concatenate(arefs)
    d_all = jnp.clip(jnp.concatenate(imps), 1e-4, 0.9999)
    active = jnp.concatenate(actives)

    W = jax.scipy.linalg.cho_solve(L0, J.T)            # (nv, C) = M^-1 J^T
    Amat = J @ W                                       # (C, C)
    Adiag = jnp.maximum(jnp.diag(Amat), 1e-10)
    # solimp regularizer R = (1-d)/d * diagApprox, with diagApprox MuJoCo's
    # invweight0-based estimate (NOT the true A diagonal): dof_invweight0
    # for limit rows, summed body translational invweight0 for contact
    # normals, * 2 mu^2 (1+mu^2) for pyramid facets. Matches mjData.efc_R
    # exactly (tests/test_golden_reference.py ladder; probes in
    # scripts/dev_frame_triage.py).
    dapx = jnp.concatenate(diagapx)
    R = (1.0 - d_all) / d_all * jnp.maximum(dapx, 1e-12)
    rhs = aref - J @ qacc0

    C = J.shape[0]

    # 4-color projected Gauss-Seidel. Plain per-row GS converges but its
    # scan over C rows x n_iter sweeps is thousands of tiny sequential ops
    # — ~26 ms/step on a TPU chip (the per-op latency, not the math). The
    # strongly-coupled rows are the 4 pyramid edges of ONE contact (they
    # share the normal row of A); rows of different contacts/limits couple
    # only weakly through M^-1. So color rows by their pyramid-edge index
    # (slots 0..3; frictionless/limit/tendon rows take slot 0): within a
    # sweep the 4 slots update sequentially (exact GS ordering inside each
    # contact) while all rows of one slot update in parallel (Jacobi across
    # contacts). Each sweep is 4 dense (C,C) matvecs — vector-unit work
    # instead of scan latency: ~0.5 ms/step, same fixed n_iter sweeps.
    #
    # Parallel-update stability: "different contacts couple only weakly"
    # fails for CLUSTERED self-collision contacts (golden frame 1380: three
    # hand/arm/torso contacts with off-diagonal A at 0.93 of the diagonal
    # — plain Jacobi overshoots ~3x and limit-cycles, leaving the cluster's
    # forces at 0). Divide each row's update by its SAME-SLOT active
    # row-sum of |A| instead of the bare diagonal: automatic
    # under-relaxation exactly where same-slot coupling is strong,
    # asymptotically the plain diagonal where it is weak.
    slot_np = np.concatenate(slots)
    slot = jnp.asarray(slot_np)
    same_slot = jnp.asarray(slot_np[:, None] == slot_np[None, :], dtype)
    D = jnp.maximum(
        jnp.sum(jnp.abs(Amat) * same_slot * active[None, :], axis=1),
        Adiag) + R

    def sweep(f, _):
        for s in range(4):
            resid = rhs - Amat @ f - R * f
            fs = jnp.maximum(f + resid / D, 0.0) * active
            f = jnp.where(slot == s, fs, f)
        return f, None

    f0 = jnp.zeros(C, dtype)
    f, _ = jax.lax.scan(sweep, f0, None, length=n_iter)

    # Block-pivoting active-set refinement: PGS above converges the easy
    # rows but stalls on strongly-coupled clusters now that R is MuJoCo's
    # small invweight0 regularizer (25 sweeps left 2.4e2 of 9.4e2 N force
    # error on golden frame 269; 200 sweeps still 1e-2 qpos error). Each
    # refinement iteration solves the QP exactly on the current working set
    # via a masked Cholesky solve — a (C,C) factorization is one MXU tile op
    # at C~200, far cheaper than 175 more PGS sweeps — then re-pivots:
    # rows whose solved force went negative leave, inactive rows with
    # negative gradient enter. Four iterations land within 1e-6 of the
    # reference QP optimum on every golden frame.
    H = Amat + jnp.diag(R)
    # small ridge keeps the masked solve effective on rank-deficient
    # working sets (4 redundant pyramid facets with d near the 0.9999 clip
    # push R toward ~1e-16*invw0, where assume_a='pos' can NaN in f32 and
    # the refinement would be silently discarded by the objective guard)
    ridge = 1e-9 * jnp.max(Adiag)

    def pivot(fS, _):
        _, S = fS
        So = S[:, None] * S[None, :]
        Hm = So * H + jnp.diag(1.0 - S + ridge)
        fs = jax.scipy.linalg.solve(Hm, S * rhs, assume_a="pos")
        fp = jnp.maximum(fs, 0.0) * active
        grad = H @ fp - rhs
        S_new = active * jnp.where((fs > 0.0) | (grad < 0.0), 1.0, 0.0)
        return (fp, S_new), None

    S0 = active * jnp.where(f > 0.0, 1.0, 0.0)
    (f_piv, _), _ = jax.lax.scan(pivot, (f, S0), None, length=4)
    # keep whichever iterate has the lower QP objective (pivoting can
    # oscillate on degenerate pyramids; PGS is monotone but slow)
    obj = lambda x: 0.5 * x @ (H @ x) - x @ rhs
    f = jnp.where(obj(f_piv) < obj(f), f_piv, f)
    if _COUPLED_DEBUG is not None:  # debug stash (fidelity triage only)
        _COUPLED_DEBUG.update(J=J, aref=aref, rhs=rhs, Adiag=Adiag, R=R,
                              f=f, active=active, d=d_all, Amat=Amat,
                              slot=slot)
    return J.T @ f


@_full_f32_matmuls
def step(model: PhysicsModel, state: PhysicsState, ctrl: jax.Array,
         solver: str = "coupled", n_iter: int = 25) -> PhysicsState:
    """One physics step (mujoco mj_step analog): forward dynamics + Euler.

    solver="coupled" (default, environment / data-collection tier):
    two-phase constraint handling — first the smooth dynamics are solved for
    the unconstrained acceleration qacc0, then contact normals and
    joint/tendon limits are resolved JOINTLY by projected damped-Jacobi
    iterations on MuJoCo's regularized constraint QP
    (engine._coupled_constraint_terms) and the damped system is solved again.

    solver="penalty" (planner tier): single-phase decoupled per-row penalty
    with the same solref/solimp-matched impedance force law but no a0
    compensation and no cross-row coupling (f = d(r) m_eff aref per row, see
    contact.py). This is exactly the law the Pallas rollout mega-kernel
    implements (ops/scalar_physics.py) — MPPI plans against this tier, the
    environment steps with the coupled tier."""
    dtype = state.qpos.dtype
    h = model.timestep
    qpos, qvel, S = state.qpos, state.qvel, state.S

    I, _ = _spatial_inertias(model, state.xpos, state.xquat, dtype)
    V = state.body_vel
    M = mass_matrix(model, S, I)
    bias = bias_forces(model, S, I, V, qvel)

    has_limits = bool(model.hs_limited.any() or model.tendon_limited.any())
    has_fl = bool((model.dof_frictionloss > 0).any())
    newton_mode = solver == "coupled" and (
        model.contact_pairs or has_limits or has_fl)

    tau = _actuator_forces(model, qpos, qvel, ctrl, state=state)
    # Newton tier resolves dof_frictionloss as Huber constraint rows
    # (physics/newton.py), so the smooth tanh approximation is excluded there
    tau_p, G_p = _passive_forces(model, qpos, qvel,
                                 frictionloss=not newton_mode)
    tau = tau + tau_p

    # implicit-damping Euler (mujoco mj_Euler): qacc = (M + h D)^-1 f_explicit,
    # extended with implicit contact/limit/friction damping terms h*G
    Mh = M + h * jnp.diag(jnp.asarray(model.dof_damping, dtype)) + h * G_p
    f = tau - bias

    if newton_mode:
        # phase 1: unconstrained smooth acceleration against PLAIN M (incl.
        # armature) — MuJoCo's qacc_smooth; damping acts explicitly in f
        Lp = jax.scipy.linalg.cho_factor(M)
        qacc0 = jax.scipy.linalg.cho_solve(Lp, f)
        # phase 2: primal Newton on MuJoCo's convex constraint problem
        # (elliptic/pyramidal cones, limits, frictionloss — newton.py)
        from .newton import newton_constraint_forces

        f = f + newton_constraint_forces(model, state, S, qacc0, M,
                                         n_iter=n_iter)
    elif solver == "coupled_pgs" and (model.contact_pairs or has_limits):
        # legacy round-2 dual solver (projected Gauss-Seidel + active-set
        # refinement on the pyramidal QP) — kept for comparison/triage
        Lp = jax.scipy.linalg.cho_factor(M)
        qacc0 = jax.scipy.linalg.cho_solve(Lp, f)
        f = f + _coupled_constraint_terms(model, state, S, Lp, qacc0,
                                          n_iter=n_iter)
    elif solver == "penalty":
        if has_limits:
            tau_l, G_l = _limit_constraint_forces(
                model, qpos, qvel, jnp.zeros(model.nv, dtype), h=h,
                state=state)
            f = f + tau_l
            Mh = Mh + h * G_l
        if model.contact_pairs:
            tau_ct, G_c = contact_terms(model, state, S)
            f = f + tau_ct
            Mh = Mh + h * G_c
    elif solver not in ("coupled", "coupled_pgs"):  # pragma: no cover
        raise ValueError(f"unknown solver {solver!r}")
    L = jax.scipy.linalg.cho_factor(Mh)
    qacc = jax.scipy.linalg.cho_solve(L, f)

    qvel_new = qvel + h * qacc
    qpos_new = _integrate_qpos(model, qpos, qvel_new, h)

    new = forward(model, qpos_new, qvel_new, state.time + h)
    return new
