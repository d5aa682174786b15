"""Physics model description, extracted from compiled MJCF.

The reference reaches rigid-body dynamics through the MuJoCo C engine
(reference src/cartpole_mppi.py:8-9, src/Humanoid_datacollection_v2.jl:10-11).
Here the MuJoCo *compiler* is still used — host-side, at build time only — to
resolve MJCF defaults/classes into numeric model constants, which are packed
into a plain-numpy :class:`PhysicsModel`. All *stepping* happens in our own
JAX engine (engine.py), compiled by XLA to TPU.

The model object is deliberately NOT a jax pytree: jitted step functions close
over it, so every structural constant (tree topology, joint types, dof
addresses) is static at trace time and the numeric constants are embedded and
constant-folded by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

# Joint types (match mujoco.mjtJoint values)
FREE = 0
BALL = 1
SLIDE = 2
HINGE = 3

# Geom types we support for collision (match mujoco.mjtGeom values)
GEOM_PLANE = 0
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_MESH = 7
GEOM_BOX = 6


@dataclasses.dataclass(frozen=True)
class Joint:
    jtype: int
    bodyid: int
    qposadr: int
    dofadr: int
    ndof: int
    pos: np.ndarray       # (3,) anchor in body frame
    axis: np.ndarray      # (3,) axis in body frame
    limited: bool
    range: np.ndarray     # (2,)
    stiffness: float
    springref: float      # reference position of the joint spring
    solref: np.ndarray = None    # (2,) limit-constraint (timeconst, dampratio)
    solimp: np.ndarray = None    # (5,) limit-constraint impedance
    # ball joints only: spring reference quaternion (qpos_spring segment)
    springref_quat: np.ndarray = None


@dataclasses.dataclass(frozen=True)
class Actuator:
    """Joint-transmission actuator (motor or position servo)."""
    dofadr: int
    qposadr: int
    gear: float
    # force = gain * ctrl + bias0 + bias1 * (gear*q) + bias2 * (gear*qvel)
    gain: float
    bias: np.ndarray          # (3,)
    ctrllimited: bool
    ctrlrange: np.ndarray     # (2,)
    forcelimited: bool
    forcerange: np.ndarray    # (2,)
    # multi-dof (ball/free joint) transmissions: number of driven dofs and
    # the gear vector across them; single-dof actuators keep ndof=1 and
    # gear == gear6[0]
    ndof: int = 1
    gear6: np.ndarray = None
    # fixed-tendon transmission: index into tendon_coef (ndof=0 so the
    # vectorized single-dof kernel skips it); length/velocity/moment are
    # gear * the tendon's coef row (mjTRN_TENDON)
    tendon_id: int = -1
    # site transmission (mjTRN_SITE, no refsite): a wrench at the site —
    # gear[0:3] force + gear[3:6] torque in the SITE frame per unit
    # actuator force; length = 0, velocity = moment . qvel (ndof=0)
    site_bodyid: int = -1
    site_pos: tuple = None            # body-local site offset (3,)
    site_quat: tuple = None           # body-local site orientation (4,)


@dataclasses.dataclass(frozen=True)
class Geom:
    gtype: int
    bodyid: int
    pos: np.ndarray       # (3,) in body frame
    quat: np.ndarray      # (4,) in body frame
    size: np.ndarray      # (3,)
    friction: np.ndarray  # (3,) slide/torsion/roll
    solref: np.ndarray    # (2,) (timeconst, dampratio)
    solimp: np.ndarray    # (5,) (d0, dmax, width, midpoint, power)
    margin: float
    priority: int
    condim: int
    # original MJCF type before the cylinder->capsule narrowphase
    # approximation (GEOM_CYLINDER geoms step as capsules INSCRIBED in the
    # cylinder: half-length reduced by the radius so the round caps never
    # reach past the flat faces — a false trunk/thigh contact otherwise,
    # scripts/dev_go1_probe.py)
    gtype_orig: int = -1
    # mesh geoms: vertices in the geom frame (plane-vs-mesh narrowphase
    # ranks them by plane distance each step — contact.py); deduplicated at
    # build time so coincident STL soup vertices can't spend several of the
    # per-pair contact-row slots on the same point
    mesh_verts: np.ndarray = None
    # convex-hull face planes of the mesh, geom frame: (F, 4) rows
    # [nx, ny, nz, d] with n·x + d <= 0 inside (scipy ConvexHull
    # equations). Supports the hull signed-distance field used by the
    # mesh-vs-mesh and primitive-into-mesh-face narrowphase branches
    # (contact._hull_sdf) — MuJoCo's mesh collision also operates on the
    # convex hull (mjc convex collider).
    mesh_hull: np.ndarray = None


@dataclasses.dataclass(frozen=True)
class FKStage:
    """One (tree-level, joint-slot, joint-type) group, vectorized in FK."""
    jtype: int
    rows: np.ndarray       # positions within the level's body list
    qposadr: np.ndarray    # (n,)
    dofadr: np.ndarray     # (n,)
    axis: np.ndarray       # (n, 3) joint axis in body frame
    jpos: np.ndarray       # (n, 3) joint anchor in body frame
    ref: np.ndarray        # (n,) qpos0 reference


@dataclasses.dataclass(frozen=True)
class FKLevel:
    body_ids: np.ndarray   # (n,) bodies at this tree depth
    parent_ids: np.ndarray # (n,)
    body_pos: np.ndarray   # (n, 3)
    body_quat: np.ndarray  # (n, 4)
    stages: Tuple[FKStage, ...]


@dataclasses.dataclass(frozen=True)
class ContactPair:
    """A static candidate collision pair (precomputed at build time)."""
    geom1: int            # index into model.geoms; plane goes first if present
    geom2: int
    mu: float             # combined sliding friction
    solref: np.ndarray    # combined (timeconst, dampratio)
    solimp: np.ndarray    # combined (d0, dmax, width, midpoint, power)
    condim: int
    margin: float
    # combined 5-vector friction (slide, slide, torsion, roll, roll) — the
    # mjContact.friction layout used by the elliptic-cone solver rows
    friction5: np.ndarray = None
    # effective inertia (kg) seen by the contact along its normal at qpos0,
    # 1 / (J M^-1 J^T) — scales the solref/solimp impedance into a force,
    # the penalty analog of the constraint solver's diag(A) regularizer
    m_eff: float = 1.0
    # MuJoCo diagApprox base for the coupled QP regularizer R: sum of the
    # two bodies' translational invweight0 (trace(Jc M^-1 Jc^T)/3 at qpos0,
    # mj body_invweight0[:,0]). R_normal = (1-d)/d * invw0;
    # R_pyramid_facet = R_normal * 2 mu^2 (1 + mu^2) — formulas recovered
    # by controlled probes against mjData.efc_R (scripts/dev_frame_triage.py).
    # The pyramid-facet law applies the single slide coefficient `mu` to all
    # 4 facets (isotropic friction assumption — MuJoCo's mj_diagApprox uses
    # per-facet friction[j/2]; identical for the task robots, which all
    # declare equal tangential frictions). friction5 carries the full
    # anisotropic vector for the elliptic path.
    invw0: float = 1.0


@dataclasses.dataclass(frozen=True)
class PhysicsModel:
    nq: int
    nv: int
    nu: int
    nbody: int
    timestep: float
    gravity: np.ndarray           # (3,)

    body_parent: Tuple[int, ...]             # (nbody,)
    body_pos: np.ndarray                     # (nbody, 3)
    body_quat: np.ndarray                    # (nbody, 4)
    body_ipos: np.ndarray                    # (nbody, 3) inertial frame pos
    body_iquat: np.ndarray                   # (nbody, 4)
    body_mass: np.ndarray                    # (nbody,)
    body_inertia: np.ndarray                 # (nbody, 3) principal moments

    joints: Tuple[Joint, ...]
    body_joints: Tuple[Tuple[int, ...], ...]  # joint indices per body, in order
    ancestor_mask: np.ndarray                 # (nbody, nv) 1.0 if dof in chain
    # Sdot predecessor mask (nv, nv): P[j,d]=1 if dof d moves the frame in
    # which S_j is fixed (ancestors + earlier/equal same-body joints; for
    # free-joint rotational dofs the whole body chain). Free-joint
    # translational dofs have world-fixed S (Sdot = 0): sdot_zero mask.
    pred_mask: np.ndarray                     # (nv, nv)
    sdot_zero: np.ndarray                     # (nv,) 1.0 where Sdot == 0
    dof_bodyid: np.ndarray                    # (nv,) body carrying each dof
    dof_damping: np.ndarray                   # (nv,)
    dof_armature: np.ndarray                  # (nv,)
    dof_frictionloss: np.ndarray              # (nv,)
    dof_Mdiag0: np.ndarray                    # (nv,) mass-matrix diag at qpos0
                                              # (scales limit penalties per dof)

    actuators: Tuple[Actuator, ...]
    geoms: Tuple[Geom, ...]
    contact_pairs: Tuple[ContactPair, ...]

    # fixed tendons: length = offset + coef @ qpos_of_joints (hinge/slide dofs)
    # spatial (site-chain) tendons: see spatial_tendons / tendon_is_spatial;
    # their tendon_coef rows are zero and they are EXCLUDED from every
    # static-coef code path via the tendon_is_spatial mask
    tendon_coef: np.ndarray                   # (ntendon, nv)
    tendon_range: np.ndarray                  # (ntendon, 2)
    tendon_limited: np.ndarray                # (ntendon,) bool
    tendon_limit_solref: np.ndarray           # (ntendon, 2)
    tendon_limit_solimp: np.ndarray           # (ntendon, 5)
    tendon_limit_meff: np.ndarray             # (ntendon,)

    qpos0: np.ndarray                         # (nq,) reference configuration
    qpos_spring: np.ndarray                   # (nq,)

    body_names: Tuple[str, ...]
    joint_names: Tuple[str, ...]
    keyframes: Tuple[Tuple[str, np.ndarray], ...]

    # ---- packed arrays for vectorized force/integration kernels ----------
    # actuators
    act_dofadr: np.ndarray        # (nu,) int
    act_qposadr: np.ndarray       # (nu,) int
    act_gear: np.ndarray          # (nu,)
    act_gain: np.ndarray          # (nu,)
    act_bias: np.ndarray          # (nu, 3)
    act_ctrl_lo: np.ndarray       # (nu,) (+-inf when unlimited)
    act_ctrl_hi: np.ndarray
    act_force_lo: np.ndarray
    act_force_hi: np.ndarray
    # single-dof (hinge/slide) joints: qpos<->dof map
    hs_qposadr: np.ndarray        # (nhs,) int
    hs_dofadr: np.ndarray         # (nhs,) int
    # springs over single-dof joints
    hs_stiffness: np.ndarray      # (nhs,)
    hs_springref: np.ndarray      # (nhs,)
    # limits over single-dof joints: solref/solimp impedance force law with
    # the dof's apparent inertia 1/(M^-1)_dd at qpos0 as m_eff (the penalty
    # analog of the constraint solver's diag(A) regularizer — same as
    # contacts, see contact.py)
    hs_limited: np.ndarray        # (nhs,) 0/1
    hs_range: np.ndarray          # (nhs, 2)
    hs_limit_solref: np.ndarray   # (nhs, 2)
    hs_limit_solimp: np.ndarray   # (nhs, 5)
    hs_limit_meff: np.ndarray     # (nhs,)
    # free joints
    free_qposadr: np.ndarray      # (nfree,) int
    free_dofadr: np.ndarray       # (nfree,) int
    free_bodyid: np.ndarray       # (nfree,) int
    # level-synchronous FK plan (engine._fk): bodies grouped by tree depth,
    # joints grouped into vectorized (level, slot, type) stages
    fk_levels: Tuple[FKLevel, ...] = ()
    # per-dof S assembly masks: dof type one-hots (computed from joints)
    dof_type_hinge: np.ndarray = None   # (nv,) 1.0 where hinge dof
    dof_type_slide: np.ndarray = None
    dof_type_freet: np.ndarray = None   # free translational
    dof_type_freer: np.ndarray = None   # free rotational
    free_axis_idx: np.ndarray = None    # (nv,) 0/1/2 local axis index for free dofs
    # mj dof_invweight0 per single-dof joint (diag(M^-1) at qpos0; free/ball
    # blocks are triplet-averaged in MuJoCo but carry no limits) — the
    # diagApprox the coupled QP's limit-row regularizer R uses
    hs_limit_invw0: np.ndarray = None   # (nhs,)
    tendon_invweight0: np.ndarray = None  # (ntendon,) mj tendon_invweight0
    # mjOption constraint-solver semantics: cone (0=pyramidal, 1=elliptic)
    # and impratio (frictional-to-normal constraint impedance ratio; for
    # elliptic cones R_friction_i = R_normal * (mu1/mu_i)^2 / impratio —
    # recovered against mjData.efc_R, scripts/dev_go1_golden.py)
    cone: int = 0
    impratio: float = 1.0
    # mj dof_invweight0 for ALL dofs — diagApprox of the dof-friction
    # (frictionloss) constraint rows' regularizer
    dof_invweight0: np.ndarray = None   # (nv,)
    # per-dof friction-row solver parameters (mj dof_solref/dof_solimp)
    dof_solref: np.ndarray = None       # (nv, 2)
    dof_solimp: np.ndarray = None       # (nv, 5)

    # penalty-model tuning (see contact.py); derived defaults set at build
    contact_stiffness: float = 0.0
    contact_damping: float = 0.0
    # joint/tendon limit penalty: k = Mdiag0/tc^2, c = 2*zeta*Mdiag0/tc per dof
    limit_timeconst: float = 0.02
    limit_dampratio: float = 1.0
    # indices (into the nu ctrl slots) of single-dof joint actuators — the
    # vectorized actuator kernel covers these; multi-dof (ball/free) motor
    # transmissions are applied per-actuator in engine._actuator_forces
    act_single_idx: np.ndarray = None   # (n_single,)
    # ball-joint springs/limits (engine._passive_forces /
    # _limit_constraint_forces): tuples so the model stays hashable
    #   springs: (dofadr, qposadr, stiffness, springref_quat tuple)
    #   limits:  (dofadr, qposadr, max_angle_rad, solref t, solimp t, meff)
    ball_springs: Tuple = ()
    ball_limits: Tuple = ()
    # spatial tendons (round-5): straight site-chain tendons — tuples of
    # (tendon_id, site_bodyids (S,), site_pos (S,3) body-local). Length =
    # sum of segment lengths, moment = dL/dq via point jacobians
    # (engine.spatial_tendon_geometry). Geom wraps and pulleys refuse at
    # build. tendon_is_spatial masks them out of the static-coef paths.
    spatial_tendons: Tuple = ()
    tendon_is_spatial: np.ndarray = None      # (ntendon,) bool

    def body_id(self, name: str) -> int:
        return self.body_names.index(name)

    def ctrl_range(self) -> Tuple[np.ndarray, np.ndarray]:
        lo = np.array([a.ctrlrange[0] if a.ctrllimited else -np.inf for a in self.actuators])
        hi = np.array([a.ctrlrange[1] if a.ctrllimited else np.inf for a in self.actuators])
        return lo, hi


def _can_collide(g1, g2, contype, conaffinity, bodyid, parentid, i, j,
                 exclude_signature=()) -> bool:
    """MuJoCo's dynamic pair filter (contype/conaffinity + same-body/parent
    + MJCF <contact><exclude> body pairs)."""
    if bodyid[i] == bodyid[j]:
        return False
    # exclude parent-child body pairs (mujoco default filterparent)
    b1, b2 = bodyid[i], bodyid[j]
    if parentid[b1] == b2 or parentid[b2] == b1:
        # note: mujoco does not filter pairs involving the world body's
        # children via this rule when the parent is world
        if not (b1 == 0 or b2 == 0):
            return False
    for s in exclude_signature:
        eb1, eb2 = int(s) >> 16, int(s) & 0xFFFF
        if (b1, b2) in ((eb1, eb2), (eb2, eb1)):
            return False
    ok = (contype[i] & conaffinity[j]) or (contype[j] & conaffinity[i])
    return bool(ok)


def build_from_mjcf(
    path: Optional[str] = None,
    xml: Optional[str] = None,
    include_self_collisions: bool = False,
) -> PhysicsModel:
    """Compile an MJCF file with the host mujoco package and extract constants.

    Only joint types free/slide/hinge and collision geom types
    plane/sphere/capsule/box (+cylinder approximated as capsule) are
    supported — these cover all four task models.
    """
    import mujoco  # host-side only

    if xml is not None:
        m = mujoco.MjModel.from_xml_string(xml)
    else:
        m = mujoco.MjModel.from_xml_path(path)

    nbody, nq, nv, nu = m.nbody, m.nq, m.nv, m.nu

    # --- joints -----------------------------------------------------------
    joints: List[Joint] = []
    body_joints: List[List[int]] = [[] for _ in range(nbody)]
    for j in range(m.njnt):
        jt = int(m.jnt_type[j])
        if jt == BALL:
            # supported: FK (quaternion about the anchor), local-expmap
            # integration, mass/bias via the generic spatial machinery,
            # quaternion springs toward qpos_spring, and rotation-angle
            # limits (penalty-tier solref/solimp law on the total rotation
            # angle, MuJoCo jnt_range[1] convention) — engine._passive_forces
            # / _limit_constraint_forces.
            pass
        if jt == BALL:
            # engine FK builds ball S rows from the post-joint rotation; a
            # LATER rotational joint in the same body would change the final
            # body frame MuJoCo derives cdof from — guard loudly instead of
            # silently mismatching (round-3 ADVICE)
            later = [k for k in range(j + 1, m.njnt)
                     if int(m.jnt_bodyid[k]) == int(m.jnt_bodyid[j])
                     and int(m.jnt_type[k]) in (BALL, HINGE)]
            if later:
                raise NotImplementedError(
                    "ball joint followed by another rotational joint in the "
                    "same body is not supported (S-row frame mismatch)")
        ndof = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}[jt]
        joints.append(
            Joint(
                jtype=jt,
                bodyid=int(m.jnt_bodyid[j]),
                qposadr=int(m.jnt_qposadr[j]),
                dofadr=int(m.jnt_dofadr[j]),
                ndof=ndof,
                pos=m.jnt_pos[j].copy(),
                axis=m.jnt_axis[j].copy(),
                limited=bool(m.jnt_limited[j]),
                range=m.jnt_range[j].copy(),
                stiffness=float(m.jnt_stiffness[j]),
                springref=float(m.qpos_spring[m.jnt_qposadr[j]]) if jt in (SLIDE, HINGE) else 0.0,
                solref=m.jnt_solref[j].copy(),
                solimp=m.jnt_solimp[j].copy(),
                springref_quat=(m.qpos_spring[
                    m.jnt_qposadr[j]:m.jnt_qposadr[j] + 4].copy()
                    if jt == BALL else None),
            )
        )
        body_joints[int(m.jnt_bodyid[j])].append(j)

    # --- dof->body and ancestor mask -------------------------------------
    dof_bodyid = m.dof_bodyid.astype(np.int32).copy()
    parent = [int(p) for p in m.body_parentid]
    ancestor_mask = np.zeros((nbody, nv))
    for b in range(nbody):
        chain = []
        bb = b
        while bb != 0:
            chain.append(bb)
            bb = parent[bb]
        for d in range(nv):
            if dof_bodyid[d] in chain:
                ancestor_mask[b, d] = 1.0

    # --- Sdot predecessor mask -------------------------------------------
    pred_mask = np.zeros((nv, nv))
    sdot_zero = np.zeros(nv)
    for jj, jnt in enumerate(joints):
        b = jnt.bodyid
        strict_anc = ancestor_mask[parent[b]]  # dofs of strict ancestors
        if jnt.jtype == FREE:
            for i in range(3):
                sdot_zero[jnt.dofadr + i] = 1.0
            for i in range(3, 6):
                pred_mask[jnt.dofadr + i] = ancestor_mask[b]
        elif jnt.jtype == BALL:
            # like the free joint's rotational block: S rows are columns of
            # the post-joint rotation, carried by the velocity of the chain
            # up to AND including the ball's own 3 dofs (the axes are fixed
            # in the post-ball frame) — but NOT same-body dofs that come
            # after it (e.g. a trailing slide), matching mj_comVel's
            # dof-ordered cvel accumulation. ancestor_mask[b] would wrongly
            # include those later dofs when the ball shares a body.
            row = strict_anc.copy()
            for other in body_joints[b]:
                if other > jj:
                    break
                oj = joints[other]
                row[oj.dofadr : oj.dofadr + oj.ndof] = 1.0
            for i in range(3):
                pred_mask[jnt.dofadr + i] = row
        else:
            row = strict_anc.copy()
            for other in body_joints[b]:
                if other > jj:
                    break
                oj = joints[other]
                row[oj.dofadr : oj.dofadr + oj.ndof] = 1.0
            pred_mask[jnt.dofadr] = row

    # --- actuators --------------------------------------------------------
    actuators: List[Actuator] = []
    for a in range(nu):
        trntype = int(m.actuator_trntype[a])
        if trntype == int(mujoco.mjtTrn.mjTRN_TENDON):
            tid = int(m.actuator_trnid[a, 0])
            adr_t, num_t = int(m.tendon_adr[tid]), int(m.tendon_num[tid])
            if any(int(m.wrap_type[w]) not in (
                        int(mujoco.mjtWrap.mjWRAP_JOINT),
                        int(mujoco.mjtWrap.mjWRAP_SITE))
                   for w in range(adr_t, adr_t + num_t)):
                raise NotImplementedError(
                    "tendon-transmission actuators support fixed (joint-"
                    "wrap) and site-chain (spatial) tendons only")
            actuators.append(
                Actuator(
                    dofadr=-1, qposadr=-1,
                    gear=float(m.actuator_gear[a, 0]),
                    gain=float(m.actuator_gainprm[a, 0]),
                    bias=m.actuator_biasprm[a, :3].copy(),
                    ctrllimited=bool(m.actuator_ctrllimited[a]),
                    ctrlrange=m.actuator_ctrlrange[a].copy(),
                    forcelimited=bool(m.actuator_forcelimited[a]),
                    forcerange=m.actuator_forcerange[a].copy(),
                    ndof=0, gear6=m.actuator_gear[a].copy(),
                    tendon_id=tid,
                )
            )
            continue
        if trntype == int(mujoco.mjtTrn.mjTRN_SITE):
            sid = int(m.actuator_trnid[a, 0])
            if int(m.actuator_trnid[a, 1]) >= 0:
                raise NotImplementedError(
                    "site-transmission actuators with a refsite are not "
                    "supported (length is 0 only without one)")
            actuators.append(
                Actuator(
                    dofadr=-1, qposadr=-1,
                    gear=float(m.actuator_gear[a, 0]),
                    gain=float(m.actuator_gainprm[a, 0]),
                    bias=m.actuator_biasprm[a, :3].copy(),
                    ctrllimited=bool(m.actuator_ctrllimited[a]),
                    ctrlrange=m.actuator_ctrlrange[a].copy(),
                    forcelimited=bool(m.actuator_forcelimited[a]),
                    forcerange=m.actuator_forcerange[a].copy(),
                    ndof=0, gear6=m.actuator_gear[a].copy(),
                    site_bodyid=int(m.site_bodyid[sid]),
                    site_pos=tuple(float(x) for x in m.site_pos[sid]),
                    site_quat=tuple(float(x) for x in m.site_quat[sid]),
                )
            )
            continue
        if trntype != int(mujoco.mjtTrn.mjTRN_JOINT):
            raise NotImplementedError(
                "only joint-, fixed-tendon- and site-transmission "
                "actuators supported")
        jid = int(m.actuator_trnid[a, 0])
        jt_a = int(m.jnt_type[jid])
        a_ndof = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}[jt_a]
        if a_ndof > 1:
            # multi-dof transmission: qfrc[dofs] += gear[:ndof] * force.
            # MuJoCo defines actuator length only through the gear
            # projection of joint position, which is 0 for ball/free —
            # support force-type (motor) gain/bias only, where length
            # never enters
            if (float(m.actuator_biasprm[a, 1]) != 0.0
                    or float(m.actuator_biasprm[a, 0]) != 0.0):
                raise NotImplementedError(
                    "position/bias actuators on free/ball joints not "
                    "supported (motor-type only)")
        actuators.append(
            Actuator(
                dofadr=int(m.jnt_dofadr[jid]),
                qposadr=int(m.jnt_qposadr[jid]),
                gear=float(m.actuator_gear[a, 0]),
                gain=float(m.actuator_gainprm[a, 0]),
                bias=m.actuator_biasprm[a, :3].copy(),
                ctrllimited=bool(m.actuator_ctrllimited[a]),
                ctrlrange=m.actuator_ctrlrange[a].copy(),
                forcelimited=bool(m.actuator_forcelimited[a]),
                forcerange=m.actuator_forcerange[a].copy(),
                ndof=a_ndof,
                gear6=m.actuator_gear[a].copy(),
            )
        )

    # --- geoms & contact pairs -------------------------------------------
    geoms: List[Geom] = []
    geom_orig_idx: List[int] = []
    for g in range(m.ngeom):
        if m.geom_contype[g] == 0 and m.geom_conaffinity[g] == 0:
            continue  # visual-only
        gt_orig = int(m.geom_type[g])
        gt = gt_orig
        if gt == GEOM_CYLINDER:
            gt = GEOM_CAPSULE  # inscribed-capsule approximation (see Geom)
        if gt not in (GEOM_PLANE, GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX,
                      GEOM_MESH):
            raise NotImplementedError(f"geom type {gt} not supported")
        mesh_verts = None
        mesh_hull = None
        if gt == GEOM_MESH:
            did = int(m.geom_dataid[g])
            va, vn = int(m.mesh_vertadr[did]), int(m.mesh_vertnum[did])
            # mesh vertices are stored in the mesh frame = geom frame after
            # the compiler re-centers them; plane-vs-mesh narrowphase ranks
            # them by plane distance each step (contact.py). Deduplicate
            # near-coincident vertices (STL triangle soup repeats each
            # vertex per incident face) so the top-K row selection can't
            # burn several slots on one physical point.
            mv = m.mesh_vert[va:va + vn].copy()
            _, uidx = np.unique(np.round(mv / 1e-7).astype(np.int64),
                                axis=0, return_index=True)
            mesh_verts = mv[np.sort(uidx)]
            # convex-hull face planes for the hull SDF (see Geom.mesh_hull).
            # MuJoCo collides meshes as convex hulls, so the hull IS the
            # collision geometry; degenerate (planar) meshes refuse loudly.
            try:
                from scipy.spatial import ConvexHull
                mesh_hull = ConvexHull(mesh_verts).equations.copy()
            except Exception as e:
                raise NotImplementedError(
                    f"mesh geom {g}: convex hull construction failed "
                    f"({e}); degenerate/planar collision meshes are not "
                    "supported") from e
        geoms.append(
            Geom(
                gtype=gt,
                gtype_orig=gt_orig,
                bodyid=int(m.geom_bodyid[g]),
                pos=m.geom_pos[g].copy(),
                quat=m.geom_quat[g].copy(),
                size=m.geom_size[g].copy(),
                friction=m.geom_friction[g].copy(),
                solref=m.geom_solref[g].copy(),
                solimp=m.geom_solimp[g].copy(),
                margin=float(m.geom_margin[g]),
                priority=int(m.geom_priority[g]),
                condim=int(m.geom_condim[g]),
                mesh_verts=mesh_verts,
                mesh_hull=mesh_hull,
            )
        )
        geom_orig_idx.append(g)

    # host-side forward at qpos0: mass matrix (limit scaling, contact m_eff)
    d0 = mujoco.MjData(m)
    mujoco.mj_forward(m, d0)
    Mfull = np.zeros((nv, nv))
    mujoco.mj_fullM(m, d0, Mfull)
    dof_Mdiag0 = np.diag(Mfull).copy()

    def _pair_m_eff(oi: int, oj: int) -> float:
        """Effective inertia 1/(J M^-1 J^T) along the pair normal at qpos0
        (plane pairs: plane z-axis; else line between geom centers)."""
        jacp_i = np.zeros((3, nv))
        jacp_j = np.zeros((3, nv))
        mujoco.mj_jacGeom(m, d0, jacp_i, None, oi)
        mujoco.mj_jacGeom(m, d0, jacp_j, None, oj)
        if int(m.geom_type[oi]) == GEOM_PLANE:
            n = d0.geom_xmat[oi].reshape(3, 3)[:, 2]
        else:
            dvec = d0.geom_xpos[oj] - d0.geom_xpos[oi]
            nrm = np.linalg.norm(dvec)
            n = dvec / nrm if nrm > 1e-9 else np.array([0.0, 0.0, 1.0])
        Jn = n @ (jacp_j - jacp_i)
        a = float(Jn @ np.linalg.solve(Mfull, Jn))
        return 1.0 / max(a, 1e-8)

    pairs: List[ContactPair] = []
    for ii in range(len(geoms)):
        for jj in range(ii + 1, len(geoms)):
            gi, gj = geom_orig_idx[ii], geom_orig_idx[jj]
            if not _can_collide(
                None, None, m.geom_contype, m.geom_conaffinity, m.geom_bodyid,
                m.body_parentid, gi, gj,
                exclude_signature=m.exclude_signature,
            ):
                continue
            g1, g2 = geoms[ii], geoms[jj]
            a, b = ii, jj
            if g2.gtype == GEOM_PLANE and g1.gtype != GEOM_PLANE:
                a, b = jj, ii
                g1, g2 = g2, g1
            if g1.gtype == GEOM_PLANE and g2.gtype == GEOM_PLANE:
                continue
            if g1.gtype == GEOM_MESH and g2.gtype != GEOM_MESH:
                # order primitive-vs-mesh pairs with the mesh as geom2 (the
                # narrowphase ranks mesh vertices against the primitive's
                # signed-distance field — contact.collect_contact_rows)
                a, b = b, a
                g1, g2 = g2, g1
            # mesh-vs-mesh pairs are supported: vertex-vs-hull-SDF both
            # ways (contact.collect_contact_rows mesh branch)
            if (g1.gtype != GEOM_PLANE and g2.gtype != GEOM_MESH
                    and not include_self_collisions):
                continue  # round-1: floor contacts only (dominant for locomotion)
            # friction / sol-parameter combination (mujoco mj_contactParam:
            # priority wins outright; equal priority -> max friction/condim,
            # solmix-weighted average of solref/solimp = plain mean at the
            # default solmix=1)
            if g1.priority != g2.priority:
                hp = g1 if g1.priority > g2.priority else g2
                fri3 = hp.friction.copy()
                solref = hp.solref.copy()
                solimp = hp.solimp.copy()
                condim = hp.condim
            else:
                fri3 = np.maximum(g1.friction, g2.friction)
                solref = 0.5 * (g1.solref + g2.solref)
                solimp = 0.5 * (g1.solimp + g2.solimp)
                condim = max(g1.condim, g2.condim)
            mu = float(fri3[0])
            # mjContact.friction layout: (slide, slide, torsion, roll, roll)
            friction5 = np.array([fri3[0], fri3[0], fri3[1], fri3[2], fri3[2]])
            pairs.append(
                ContactPair(
                    geom1=a, geom2=b, mu=mu, solref=solref, solimp=solimp,
                    condim=condim, margin=max(g1.margin, g2.margin),
                    friction5=friction5,
                    m_eff=_pair_m_eff(geom_orig_idx[a], geom_orig_idx[b]),
                    invw0=float(
                        m.body_invweight0[m.geom_bodyid[geom_orig_idx[a]], 0]
                        + m.body_invweight0[m.geom_bodyid[geom_orig_idx[b]], 0]
                    ),
                )
            )

    # --- tendons (fixed only) --------------------------------------------
    ntendon = m.ntendon
    tendon_coef = np.zeros((ntendon, nv))
    tendon_range = np.zeros((ntendon, 2))
    tendon_limited = np.zeros(ntendon, dtype=bool)
    tendon_limit_solref = np.tile([0.02, 1.0], (ntendon, 1))
    tendon_limit_solimp = np.tile([0.9, 0.95, 0.001, 0.5, 2.0], (ntendon, 1))
    spatial_tendons = []
    tendon_is_spatial = np.zeros(ntendon, dtype=bool)
    for t in range(ntendon):
        adr = int(m.tendon_adr[t])
        num = int(m.tendon_num[t])
        wtypes = {int(m.wrap_type[w]) for w in range(adr, adr + num)}
        W_JOINT = int(mujoco.mjtWrap.mjWRAP_JOINT)
        W_SITE = int(mujoco.mjtWrap.mjWRAP_SITE)
        if wtypes == {W_JOINT}:
            for w in range(adr, adr + num):
                jid = int(m.wrap_objid[w])
                tendon_coef[t, int(m.jnt_dofadr[jid])] = float(m.wrap_prm[w])
        elif wtypes == {W_SITE}:
            # spatial site-chain tendon: straight segments between sites
            # (geom wraps / pulleys refuse below). Length/moment are
            # state-dependent — engine.spatial_tendon_geometry.
            sids = [int(m.wrap_objid[w]) for w in range(adr, adr + num)]
            spatial_tendons.append((
                t,
                tuple(int(m.site_bodyid[s]) for s in sids),
                np.stack([m.site_pos[s].copy() for s in sids]),
            ))
            tendon_is_spatial[t] = True
        else:
            raise NotImplementedError(
                f"tendon {t}: only pure joint-wrap (fixed) or pure "
                "site-chain (spatial) tendons supported — geom wraps, "
                "pulleys, and mixed wrap types are not")
        if float(m.tendon_stiffness[t]) or float(m.tendon_damping[t]):
            raise NotImplementedError(
                f"tendon {t}: passive tendon stiffness/damping not "
                "supported (refuse loudly rather than silently dropping "
                "the spring force)")
        tendon_range[t] = m.tendon_range[t]
        tendon_limited[t] = bool(m.tendon_limited[t])
        tendon_limit_solref[t] = m.tendon_solref_lim[t]
        tendon_limit_solimp[t] = m.tendon_solimp_lim[t]
    Minv0 = np.linalg.inv(Mfull)
    tendon_limit_meff = np.array([
        # spatial tendons: the coef row is zero, use MuJoCo's own
        # invweight0 (the same quantity evaluated on its geometry)
        1.0 / max(float(m.tendon_invweight0[t]), 1e-8)
        if tendon_is_spatial[t]
        else 1.0 / max(float(tendon_coef[t] @ Minv0 @ tendon_coef[t]), 1e-8)
        for t in range(ntendon)
    ]) if ntendon else np.zeros(0)
    # apparent inertia per dof (limits): 1/(M^-1)_dd at qpos0
    dof_meff0 = 1.0 / np.maximum(np.diag(Minv0), 1e-12)

    # --- keyframes --------------------------------------------------------
    keyframes = []
    for k in range(m.nkey):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_KEY, k) or f"key{k}"
        keyframes.append((name, m.key_qpos[k].copy()))

    body_names = tuple(
        mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b) or f"body{b}"
        for b in range(nbody)
    )
    joint_names = tuple(
        mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, j) or f"joint{j}"
        for j in range(m.njnt)
    )

    total_mass = float(np.sum(m.body_mass))
    # penalty-contact defaults: stiff enough for ~4 mm penetration under the
    # robot's full weight, near-critically damped against the total mass
    # (damping is handled implicitly in the engine, so stiffness here is
    # bounded by accuracy, not stability)
    weight = total_mass * 9.81
    contact_stiffness = float(weight / 0.004)
    # plain python float — a stray np.float64 scalar silently promotes every
    # downstream f32 array to f64 under jax_enable_x64
    contact_damping = float(2.0 * np.sqrt(contact_stiffness * total_mass))

    # ---- packed arrays ---------------------------------------------------
    inf = np.inf
    act_ctrl_lo = np.array([a.ctrlrange[0] if a.ctrllimited else -inf for a in actuators])
    act_ctrl_hi = np.array([a.ctrlrange[1] if a.ctrllimited else inf for a in actuators])
    act_force_lo = np.array([a.forcerange[0] if a.forcelimited else -inf for a in actuators])
    act_force_hi = np.array([a.forcerange[1] if a.forcelimited else inf for a in actuators])
    hs = [j for j in joints if j.jtype in (SLIDE, HINGE)]
    free_joints = [j for j in joints if j.jtype == FREE]
    limit_tc, limit_zeta = 0.02, 1.0

    # ---- level-synchronous FK plan ---------------------------------------
    depth = np.zeros(nbody, dtype=np.int32)
    for b in range(1, nbody):
        depth[b] = depth[parent[b]] + 1
    fk_levels = []
    for d in range(1, int(depth.max()) + 1 if nbody > 1 else 1):
        bids = np.where(depth == d)[0].astype(np.int32)
        if bids.size == 0:
            continue
        pids = np.array([parent[b] for b in bids], dtype=np.int32)
        max_slots = max(len(body_joints[b]) for b in bids)
        stages: List[FKStage] = []
        for slot in range(max_slots):
            for jt in (FREE, BALL, SLIDE, HINGE):
                rows, qadr, dadr, ax, jp, ref = [], [], [], [], [], []
                for r, b in enumerate(bids):
                    if slot >= len(body_joints[b]):
                        continue
                    jnt = joints[body_joints[b][slot]]
                    if jnt.jtype != jt:
                        continue
                    rows.append(r)
                    qadr.append(jnt.qposadr)
                    dadr.append(jnt.dofadr)
                    ax.append(jnt.axis)
                    jp.append(jnt.pos)
                    ref.append(m.qpos0[jnt.qposadr] if jt in (SLIDE, HINGE) else 0.0)
                if rows:
                    stages.append(FKStage(
                        jtype=jt,
                        rows=np.asarray(rows, dtype=np.int32),
                        qposadr=np.asarray(qadr, dtype=np.int32),
                        dofadr=np.asarray(dadr, dtype=np.int32),
                        axis=np.asarray(ax),
                        jpos=np.asarray(jp),
                        ref=np.asarray(ref),
                    ))
        fk_levels.append(FKLevel(
            body_ids=bids, parent_ids=pids,
            body_pos=m.body_pos[bids].copy(), body_quat=m.body_quat[bids].copy(),
            stages=tuple(stages),
        ))

    dof_type_hinge = np.zeros(nv)
    dof_type_slide = np.zeros(nv)
    dof_type_freet = np.zeros(nv)
    dof_type_freer = np.zeros(nv)
    free_axis_idx = np.zeros(nv, dtype=np.int32)
    for jnt in joints:
        if jnt.jtype == HINGE:
            dof_type_hinge[jnt.dofadr] = 1.0
        elif jnt.jtype == SLIDE:
            dof_type_slide[jnt.dofadr] = 1.0
        elif jnt.jtype == BALL:
            # quaternion-integrated rotational dofs, same S semantics as the
            # free joint's rotational block
            for i in range(3):
                dof_type_freer[jnt.dofadr + i] = 1.0
        elif jnt.jtype == FREE:
            for i in range(3):
                dof_type_freet[jnt.dofadr + i] = 1.0
                free_axis_idx[jnt.dofadr + i] = i
                dof_type_freer[jnt.dofadr + 3 + i] = 1.0
                free_axis_idx[jnt.dofadr + 3 + i] = i

    # --- ball-joint springs & rotation-angle limits -----------------------
    ball_springs = []
    ball_limits = []
    for jnt in joints:
        if jnt.jtype != BALL:
            continue
        if jnt.stiffness:
            ball_springs.append((jnt.dofadr, jnt.qposadr,
                                 float(jnt.stiffness),
                                 tuple(float(x) for x in jnt.springref_quat)))
        if jnt.limited:
            # MuJoCo ball limit: total rotation angle <= max(|range|); the
            # row's diagApprox regularizer uses the mean rotational
            # invweight0 of the ball's dofs (triplet-averaged in MuJoCo)
            meff_b = 1.0 / max(
                float(np.mean(m.dof_invweight0[
                    jnt.dofadr:jnt.dofadr + 3])), 1e-8)
            ball_limits.append((jnt.dofadr, jnt.qposadr,
                                float(np.max(np.abs(jnt.range))),
                                tuple(float(x) for x in jnt.solref),
                                tuple(float(x) for x in jnt.solimp),
                                meff_b))

    return PhysicsModel(
        nq=nq, nv=nv, nu=nu, nbody=nbody,
        timestep=float(m.opt.timestep),
        gravity=m.opt.gravity.copy(),
        body_parent=tuple(parent),
        body_pos=m.body_pos.copy(),
        body_quat=m.body_quat.copy(),
        body_ipos=m.body_ipos.copy(),
        body_iquat=m.body_iquat.copy(),
        body_mass=m.body_mass.copy(),
        body_inertia=m.body_inertia.copy(),
        joints=tuple(joints),
        body_joints=tuple(tuple(bj) for bj in body_joints),
        ancestor_mask=ancestor_mask,
        pred_mask=pred_mask,
        sdot_zero=sdot_zero,
        dof_bodyid=dof_bodyid,
        dof_damping=m.dof_damping.copy(),
        dof_armature=m.dof_armature.copy(),
        dof_frictionloss=m.dof_frictionloss.copy(),
        dof_Mdiag0=dof_Mdiag0,
        actuators=tuple(actuators),
        geoms=tuple(geoms),
        contact_pairs=tuple(pairs),
        tendon_coef=tendon_coef,
        tendon_range=tendon_range,
        tendon_limited=tendon_limited,
        tendon_limit_solref=tendon_limit_solref,
        tendon_limit_solimp=tendon_limit_solimp,
        tendon_limit_meff=tendon_limit_meff,
        qpos0=m.qpos0.copy(),
        qpos_spring=m.qpos_spring.copy(),
        body_names=body_names,
        joint_names=joint_names,
        keyframes=tuple(keyframes),
        contact_stiffness=contact_stiffness,
        contact_damping=contact_damping,
        limit_timeconst=limit_tc,
        limit_dampratio=limit_zeta,
        act_dofadr=np.array([a.dofadr for a in actuators], dtype=np.int32),
        act_qposadr=np.array([a.qposadr for a in actuators], dtype=np.int32),
        act_gear=np.array([a.gear for a in actuators]),
        act_gain=np.array([a.gain for a in actuators]),
        act_bias=np.stack([a.bias for a in actuators]) if actuators else np.zeros((0, 3)),
        act_ctrl_lo=act_ctrl_lo,
        act_ctrl_hi=act_ctrl_hi,
        act_force_lo=act_force_lo,
        act_force_hi=act_force_hi,
        hs_qposadr=np.array([j.qposadr for j in hs], dtype=np.int32),
        hs_dofadr=np.array([j.dofadr for j in hs], dtype=np.int32),
        hs_stiffness=np.array([j.stiffness for j in hs]),
        hs_springref=np.array([j.springref for j in hs]),
        hs_limited=np.array([1.0 if j.limited else 0.0 for j in hs]),
        hs_range=np.stack([j.range for j in hs]) if hs else np.zeros((0, 2)),
        hs_limit_solref=(np.stack([j.solref for j in hs])
                         if hs else np.zeros((0, 2))),
        hs_limit_solimp=(np.stack([j.solimp for j in hs])
                         if hs else np.zeros((0, 5))),
        hs_limit_meff=(np.array([dof_meff0[j.dofadr] for j in hs])
                       if hs else np.zeros(0)),
        free_qposadr=np.array([j.qposadr for j in free_joints], dtype=np.int32),
        free_dofadr=np.array([j.dofadr for j in free_joints], dtype=np.int32),
        free_bodyid=np.array([j.bodyid for j in free_joints], dtype=np.int32),
        fk_levels=tuple(fk_levels),
        dof_type_hinge=dof_type_hinge,
        dof_type_slide=dof_type_slide,
        dof_type_freet=dof_type_freet,
        dof_type_freer=dof_type_freer,
        free_axis_idx=free_axis_idx,
        hs_limit_invw0=(np.array([m.dof_invweight0[j.dofadr] for j in hs])
                        if hs else np.zeros(0)),
        tendon_invweight0=m.tendon_invweight0.copy(),
        cone=int(m.opt.cone),
        impratio=float(m.opt.impratio),
        dof_invweight0=m.dof_invweight0.copy(),
        dof_solref=m.dof_solref.copy(),
        dof_solimp=m.dof_solimp.copy(),
        act_single_idx=np.array(
            [i for i, a in enumerate(actuators) if a.ndof == 1],
            dtype=np.int32),
        ball_springs=tuple(ball_springs),
        ball_limits=tuple(ball_limits),
        spatial_tendons=tuple(spatial_tendons),
        tendon_is_spatial=tendon_is_spatial,
    )
