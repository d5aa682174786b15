"""Scalar struct-of-arrays physics step — the Pallas mega-kernel body.

Why this exists: the array-level engine (physics/engine.py) is semantically
exact but lowers to hundreds of small XLA kernels per step; at K=8192 on one
TPU chip that costs ~60 ms/step of launch overhead + HBM round-trips against
a ~0.1 ms speed-of-light. Here the entire step is re-expressed as *scalar*
math where every quantity (each qpos component, each mass-matrix entry) is a
(B,)-vector over the MPPI sample lanes, so the whole step fuses into one
Pallas kernel program: state lives in VMEM/vregs, the only HBM traffic per
rollout is the initial state, the noise stream, and the cost output.

TPU-native structure exploited at trace time (all indices/masks are Python):
- level/tree loops fully unrolled; model constants folded into the
  instruction stream as immediates;
- composite-rigid-body (CRBA) mass matrix over 21-component symmetric
  origin-frame spatial inertias, computing ONLY the tree-sparse entries
  M[d][e] != 0 (e in chain(d));
- implicit contact damping folded into the same composite pass: each
  contacting body's point-damping matrices sum into a 6x6 "damping inertia"
  D_b, so Mh = M + h*(D + diag-terms) costs one extra composite accumulation
  instead of a dense J^T C J product;
- tree-sparse Cholesky with zero fill-in (dofs are topologically ordered in
  MJCF models), unrolled over the sparsity pattern.

All functions take/return plain Python structures of jnp scalars-over-lanes;
physics/engine.py remains the oracle they are tested against.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.model import (
    BALL,
    FREE,
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_MESH,
    GEOM_PLANE,
    GEOM_SPHERE,
    HINGE,
    SLIDE,
    PhysicsModel,
)
from ..physics.contact import RESTITUTION_VCAP as _REST_VCAP

# ---------------------------------------------------------------------------
# tuple algebra over (B,) lanes; constants are python floats (folded)
# ---------------------------------------------------------------------------

Vec3 = Tuple  # 3-tuple of (B,) arrays or floats
Quat = Tuple  # 4-tuple


def _is_const(x) -> bool:
    return isinstance(x, (int, float))


def _czero(x) -> bool:
    return isinstance(x, (int, float)) and x == 0.0


def _cone(x) -> bool:
    return isinstance(x, (int, float)) and x == 1.0


def fmul(x, y):
    """Trace-time-folding multiply. The kernel jaxpr lowers to Mosaic
    WITHOUT XLA's algebraic simplifier, so `0.0 * lane` / `1.0 * lane`
    survive as real VPU ops unless folded here. Model constants (sparse
    free-joint S rows, unit joint axes, zero body offsets) make these
    common: folding removes ~17% of the humanoid step's equations."""
    if _czero(x) or _czero(y):
        return 0.0
    if _cone(x):
        return y
    if _cone(y):
        return x
    return x * y


def fadd(x, y):
    if _czero(x):
        return y
    if _czero(y):
        return x
    return x + y


def fsub(x, y):
    if _czero(y):
        return x
    if _czero(x):
        return -y
    return x - y


def fdot(xs, ys):
    """sum_i xs[i]*ys[i] with zero folding and a balanced reduction tree
    (short dependency chains pipeline better on the VPU than a serial
    left-fold; Mosaic does not reassociate)."""
    terms = [t for t in (fmul(x, y) for x, y in zip(xs, ys)) if not _czero(t)]
    if not terms:
        return 0.0
    while len(terms) > 1:
        nxt = [fadd(terms[i], terms[i + 1]) for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _imp_scalar(viol, solimp):
    """Scalar MuJoCo solimp impedance spline d(r); `viol` is a (B,) lane
    scalar, `solimp` a static (5,) numpy array (see physics.contact.impedance
    for the batched form this mirrors). Integer powers (the default
    power=2) lower to multiplies — `x ** 2.0` otherwise becomes a
    transcendental pow on the TPU VPU, and this spline runs per contact
    point per limit per step inside the mega-kernel."""
    d0, dmax, width, mid, power = [float(v) for v in solimp]

    if power == int(power) and 1 <= power <= 4:
        def powf(x):
            r = x
            for _ in range(int(power) - 1):
                r = r * x
            return r
    else:
        def powf(x):
            return x ** power

    x = jnp.clip(viol / width, 0.0, 1.0)
    lo = mid * powf(x / mid)
    hi = 1.0 - (1.0 - mid) * powf((1.0 - x) / (1.0 - mid))
    s = jnp.where(x < mid, lo, hi)
    return d0 + s * (dmax - d0)


def _solref_kb_scalar(solref, solimp):
    """Static (k_base, b_ref) floats from solref/solimp (see
    physics.contact.solref_kb)."""
    tau, zeta = float(solref[0]), float(solref[1])
    dmax = float(solimp[1])
    assert tau > 0, "direct (negative) solref not supported"
    return 1.0 / (dmax * dmax * tau * tau * zeta * zeta), 2.0 / (dmax * tau)


def qmul(a: Quat, b: Quat) -> Quat:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return (
        fsub(fsub(fsub(fmul(w1, w2), fmul(x1, x2)), fmul(y1, y2)), fmul(z1, z2)),
        fsub(fadd(fadd(fmul(w1, x2), fmul(x1, w2)), fmul(y1, z2)), fmul(z1, y2)),
        fadd(fadd(fsub(fmul(w1, y2), fmul(x1, z2)), fmul(y1, w2)), fmul(z1, x2)),
        fadd(fsub(fadd(fmul(w1, z2), fmul(x1, y2)), fmul(y1, x2)), fmul(z1, w2)),
    )


def qrot(q: Quat, v: Vec3) -> Vec3:
    """Rotate v by q: v + 2w(u x v) + 2u x (u x v)."""
    w, ux, uy, uz = q
    vx, vy, vz = v
    cx = fsub(fmul(uy, vz), fmul(uz, vy))
    cy = fsub(fmul(uz, vx), fmul(ux, vz))
    cz = fsub(fmul(ux, vy), fmul(uy, vx))
    dx = fsub(fmul(uy, cz), fmul(uz, cy))
    dy = fsub(fmul(uz, cx), fmul(ux, cz))
    dz = fsub(fmul(ux, cy), fmul(uy, cx))
    return (fadd(vx, fmul(2, fadd(fmul(w, cx), dx))),
            fadd(vy, fmul(2, fadd(fmul(w, cy), dy))),
            fadd(vz, fmul(2, fadd(fmul(w, cz), dz))))


def qconj(q: Quat) -> Quat:
    w, x, y, z = q
    return (w, -x if not _czero(x) else 0.0,
            -y if not _czero(y) else 0.0,
            -z if not _czero(z) else 0.0)


def qlog(q: Quat):
    """Rotation vector (axis*angle, folded to [-pi, pi]) of a unit
    quaternion — spatial.quat_log in scalar form. Uses the branchless
    kernel atan2 (no native atan2 in the Pallas TPU lowering)."""
    from .kernel_math import atan2

    w, x, y, z = q
    sin_half = jnp.sqrt(x * x + y * y + z * z + 1e-24)
    angle = 2.0 * atan2(sin_half, w, precise=True)
    angle = jnp.where(angle > math.pi, angle - 2 * math.pi, angle)
    s = angle / sin_half
    return (x * s, y * s, z * s)


def qmat(q: Quat):
    """3x3 rotation as nested tuples R[i][j]."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def cross(a: Vec3, b: Vec3) -> Vec3:
    ax, ay, az = a
    bx, by, bz = b
    return (fsub(fmul(ay, bz), fmul(az, by)),
            fsub(fmul(az, bx), fmul(ax, bz)),
            fsub(fmul(ax, by), fmul(ay, bx)))


def dot3(a: Vec3, b: Vec3):
    return fdot(a, b)


def add3(a: Vec3, b: Vec3) -> Vec3:
    return (fadd(a[0], b[0]), fadd(a[1], b[1]), fadd(a[2], b[2]))


def sub3(a: Vec3, b: Vec3) -> Vec3:
    return (fsub(a[0], b[0]), fsub(a[1], b[1]), fsub(a[2], b[2]))


def scl3(a: Vec3, s) -> Vec3:
    return (fmul(a[0], s), fmul(a[1], s), fmul(a[2], s))


def add6(a, b):
    return tuple(fadd(x, y) for x, y in zip(a, b))


def dot6(a, b):
    return fdot(a, b)


def scl6(a, s):
    return tuple(fmul(x, s) for x in a)


# ---------------------------------------------------------------------------
# symmetric 6x6 spatial operators, stored as 21-tuples (row-major upper tri):
# indices: (0,0)(0,1)..(0,5),(1,1)..(1,5),(2,2).. -> offset table
# ---------------------------------------------------------------------------

_SYM_IDX = {}
_k = 0
for _i in range(6):
    for _j in range(_i, 6):
        _SYM_IDX[(_i, _j)] = _k
        _SYM_IDX[(_j, _i)] = _k
        _k += 1


def sym_zero():
    return tuple(0.0 for _ in range(21))


def sym_add(a, b):
    return tuple(fadd(x, y) for x, y in zip(a, b))


def sym_scale(a, s):
    return tuple(fmul(x, s) for x in a)


def sym_mat_vec(Isym, v6):
    """I @ v for symmetric 21-tuple I and 6-tuple v."""
    return tuple(
        fdot([Isym[_SYM_IDX[(i, j)]] for j in range(6)], v6) for i in range(6))


def sym_rank1(u6, w):
    """w * u u^T as a 21-tuple."""
    out = []
    for i in range(6):
        for j in range(i, 6):
            out.append(fmul(fmul(w, u6[i]), u6[j]))
    return tuple(out)


def spatial_inertia_sym(mass: float, inertia_diag, com: Vec3, R) -> tuple:
    """21-tuple origin-frame spatial inertia ([w; v0] ordering):
        [[Ic - m cx cx, m cx], [-m cx, m I]]
    with Ic = R diag R^T about the com, cx = skew(com). Uses the identity
    -m cx cx = m(|c|^2 I - c c^T)."""
    cx_, cy_, cz_ = com
    m = mass
    d0, d1, d2 = [float(x) for x in inertia_diag]
    # Ic[i][j] = sum_k d_k R[i][k] R[j][k]
    Ic = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            Ic[i][j] = fdot((d0, d1, d2), (fmul(R[i][0], R[j][0]), fmul(R[i][1], R[j][1]), fmul(R[i][2], R[j][2])))
    c2 = cx_ * cx_ + cy_ * cy_ + cz_ * cz_
    c = (cx_, cy_, cz_)
    out = [0.0] * 21
    # top-left: Ic + m(|c|^2 I - c c^T)
    for i in range(3):
        for j in range(i, 3):
            v = Ic[i][j] - m * c[i] * c[j]
            if i == j:
                v = v + m * c2
            out[_SYM_IDX[(i, j)]] = v
    # top-right: m * skew(c):  [[0,-cz,cy],[cz,0,-cx],[-cy,cx,0]] * m
    sk = ((0.0, -cz_, cy_), (cz_, 0.0, -cx_), (-cy_, cx_, 0.0))
    for i in range(3):
        for j in range(3):
            out[_SYM_IDX[(i, j + 3)]] = m * sk[i][j]
    # note: m*skew(c) is antisymmetric; the SYMMETRIC 6x6 has top-right
    # m cx and bottom-left (m cx)^T = -m cx, consistent because
    # _SYM_IDX[(i, j+3)] == _SYM_IDX[(j+3, i)] stores the (i, j+3) entry and
    # the true matrix is symmetric as a whole: (I^O)^T = I^O holds since
    # bottom-left = -m cx = (m cx)^T. So storing top-right entries is exact.
    # bottom-right: m I
    for i in range(3):
        out[_SYM_IDX[(i + 3, i + 3)]] = m
    return tuple(out)


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------


class StepContext:
    """What cost functions see: scalar-SoA views of the post-step state."""

    def __init__(self):
        self.qpos: List = None        # nq scalars
        self.qvel: List = None        # nv scalars
        self.ctrl: List = None        # nu scalars (clipped, as applied)
        self.time = None              # scalar
        self.xpos: Dict[int, Vec3] = {}
        self.xquat: Dict[int, Quat] = {}
        self.body_vel: Dict[int, tuple] = {}   # 6-tuple [w; v0]
        self.params: List = []        # runtime cost parameters (episode goal)
        self.R: Dict[int, tuple] = {}          # per-body qmat cache

    def body_R(self, b: int):
        R = self.R.get(b)
        if R is None:
            R = self.R[b] = qmat(self.xquat[b])
        return R

    def body_com_linvel(self, model: PhysicsModel, b: int) -> Vec3:
        R = self.body_R(b)
        ip = [float(x) for x in model.body_ipos[b]]  # plain floats: np.float64
        # scalars would promote f32 lanes to f64 under jax_enable_x64
        xi = add3(self.xpos[b], tuple(
            R[i][0] * ip[0] + R[i][1] * ip[1] + R[i][2] * ip[2] for i in range(3)))
        V = self.body_vel[b]
        w = (V[0], V[1], V[2])
        v0 = (V[3], V[4], V[5])
        return add3(v0, cross(w, xi))


def _fk_scalar(model: PhysicsModel, qpos: List) -> Tuple[Dict, Dict, Dict, Dict]:
    """Unrolled FK. Returns xpos, xquat (dicts body->tuple), S (dict dof->
    6-tuple), and per-joint world (axis, anchor)."""
    xpos = {0: (0.0, 0.0, 0.0)}
    xquat = {0: (1.0, 0.0, 0.0, 0.0)}
    S: Dict[int, tuple] = {}

    qpos0 = model.qpos0

    for b in range(1, model.nbody):
        p = model.body_parent[b]
        bp = tuple(float(x) for x in model.body_pos[b])
        bq = tuple(float(x) for x in model.body_quat[b])
        pq = xquat[p]
        if bp == (0.0, 0.0, 0.0):
            pos = xpos[p]
        else:
            pos = add3(xpos[p], qrot(pq, bp))
        if bq == (1.0, 0.0, 0.0, 0.0):
            quat = pq
        else:
            quat = qmul(pq, bq)

        for jidx in model.body_joints[b]:
            jnt = model.joints[jidx]
            if jnt.jtype == FREE:
                a = jnt.qposadr
                pos = (qpos[a], qpos[a + 1], qpos[a + 2])
                qw, qx, qy, qz = qpos[a + 3], qpos[a + 4], qpos[a + 5], qpos[a + 6]
                inv = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz)
                quat = (qw * inv, qx * inv, qy * inv, qz * inv)
                d = jnt.dofadr
                for i in range(3):
                    e = [0.0, 0.0, 0.0]
                    e[i] = 1.0
                    S[d + i] = (0.0, 0.0, 0.0, e[0], e[1], e[2])
                R = qmat(quat)
                for i in range(3):
                    a_w = (R[0][i], R[1][i], R[2][i])
                    pxa = cross(pos, a_w)
                    S[d + 3 + i] = a_w + pxa
            elif jnt.jtype == BALL:
                # quaternion rotation about the joint anchor (mj_kinematics
                # ball semantics, matching engine FK's BALL stage): S rows =
                # columns of the post-joint rotation (body-local angular
                # axes) anchored at the joint anchor
                a = jnt.qposadr
                qw, qx, qy, qz = qpos[a], qpos[a + 1], qpos[a + 2], qpos[a + 3]
                inv = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz)
                q4 = (qw * inv, qx * inv, qy * inv, qz * inv)
                jp = tuple(float(x) for x in jnt.pos)
                anchor = add3(pos, qrot(quat, jp)) if jp != (0.0, 0.0, 0.0) else pos
                quat = qmul(quat, q4)
                if jp != (0.0, 0.0, 0.0):
                    pos = sub3(anchor, qrot(quat, jp))
                R = qmat(quat)
                d = jnt.dofadr
                for i in range(3):
                    a_w = (R[0][i], R[1][i], R[2][i])
                    S[d + i] = a_w + cross(anchor, a_w)
            elif jnt.jtype == SLIDE:
                q = qpos[jnt.qposadr] - float(qpos0[jnt.qposadr])
                ax = tuple(float(x) for x in jnt.axis)
                a_w = qrot(quat, ax)
                pos = add3(pos, scl3(a_w, q))
                S[jnt.dofadr] = (0.0, 0.0, 0.0) + a_w
            else:  # HINGE
                q = qpos[jnt.qposadr] - float(qpos0[jnt.qposadr])
                ax = tuple(float(x) for x in jnt.axis)
                jp = tuple(float(x) for x in jnt.pos)
                anchor = add3(pos, qrot(quat, jp)) if jp != (0.0, 0.0, 0.0) else pos
                half = 0.5 * q
                s, c = jnp.sin(half), jnp.cos(half)
                qloc = (c, ax[0] * s, ax[1] * s, ax[2] * s)
                quat = qmul(quat, qloc)
                if jp != (0.0, 0.0, 0.0):
                    pos = sub3(anchor, qrot(quat, jp))
                a_w = qrot(quat, ax)
                S[jnt.dofadr] = a_w + cross(anchor, a_w)

        xpos[b] = pos
        xquat[b] = quat

    return xpos, xquat, S


def _velocities_and_sdot(model: PhysicsModel, S, qvel):
    """One sweep: body spatial velocities V_b and per-dof Sdot*qd terms W_j
    (using the predecessor rule — see physics/engine.bias_forces)."""
    V = {0: (0.0,) * 6}
    W: Dict[int, tuple] = {}
    for b in range(1, model.nbody):
        p = model.body_parent[b]
        Vcur = V[p]
        free_dofs = []
        for jidx in model.body_joints[b]:
            jnt = model.joints[jidx]
            if jnt.jtype == FREE:
                d = jnt.dofadr
                for i in range(6):
                    Vcur = add6(Vcur, scl6(S[d + i], qvel[d + i]))
                free_dofs.append(d)
            elif jnt.jtype == BALL:
                # predecessor rule (model.pred_mask BALL branch): the three
                # S rows are fixed in the POST-ball frame, so Sdot uses the
                # chain velocity up to AND INCLUDING the ball's own dofs
                # (cross terms between the 3 dofs are nonzero, unlike the
                # single-dof case where S x S qd = 0)
                d = jnt.dofadr
                for i in range(3):
                    Vcur = add6(Vcur, scl6(S[d + i], qvel[d + i]))
                w1, l1 = Vcur[0:3], Vcur[3:6]
                for i in range(3):
                    w2, l2 = S[d + i][0:3], S[d + i][3:6]
                    cw = cross(w1, w2)
                    cl = add3(cross(w1, l2), cross(l1, w2))
                    W[d + i] = tuple(x * qvel[d + i] for x in (cw + cl))
            else:
                d = jnt.dofadr
                # motion cross Vcur x S_d, times qd
                w1 = Vcur[0:3]
                l1 = Vcur[3:6]
                w2 = S[d][0:3]
                l2 = S[d][3:6]
                cw = cross(w1, w2)
                cl = add3(cross(w1, l2), cross(l1, w2))
                W[d] = tuple(x * qvel[d] for x in (cw + cl))
                Vcur = add6(Vcur, scl6(S[d], qvel[d]))
        V[b] = Vcur
        for d in free_dofs:
            # trans dofs: world-fixed S => Sdot = 0
            for i in range(3):
                W[d + i] = (0.0,) * 6
            # rot dofs: S fixed in the body => Vbody x S
            w1 = Vcur[0:3]
            l1 = Vcur[3:6]
            for i in range(3, 6):
                w2 = S[d + i][0:3]
                l2 = S[d + i][3:6]
                cw = cross(w1, w2)
                cl = add3(cross(w1, l2), cross(l1, w2))
                W[d + i] = tuple(x * qvel[d + i] for x in (cw + cl))
    return V, W


def _chain_dofs(model: PhysicsModel, b: int) -> List[int]:
    return [d for d in range(model.nv) if model.ancestor_mask[b, d] > 0]


def _body_children(model: PhysicsModel) -> Dict[int, List[int]]:
    ch: Dict[int, List[int]] = {b: [] for b in range(model.nbody)}
    for b in range(1, model.nbody):
        ch[model.body_parent[b]].append(b)
    return ch


def scalar_forward(model: PhysicsModel, qpos: Sequence, qvel: Sequence):
    """FK + velocity sweep: everything state-dependent the dynamics and the
    cost functions need. Returned as a dict pytree (fori_loop-carriable)."""
    xpos, xquat, S = _fk_scalar(model, list(qpos))
    V, W = _velocities_and_sdot(model, S, list(qvel))
    return {"xpos": xpos, "xquat": xquat, "S": S, "V": V, "W": W}


def scalar_step(
    model: PhysicsModel,
    qpos: Sequence,
    qvel: Sequence,
    ctrl: Sequence,
    time,
    fwd: Optional[dict] = None,
) -> Tuple[List, List, StepContext]:
    """One physics step in scalar-SoA form. Matches physics/engine.step.

    qpos/qvel/ctrl: sequences of (B,) jnp arrays (or python floats).
    Returns (qpos', qvel', ctx) where ctx views the PRE-step kinematics with
    POST-step qpos/qvel; pass `fwd` (from scalar_forward) to reuse cached
    kinematics instead of recomputing FK.
    """
    h = model.timestep
    nv, nq, nu = model.nv, model.nq, model.nu
    qpos = list(qpos)
    qvel = list(qvel)

    if fwd is None:
        fwd = scalar_forward(model, qpos, qvel)
    xpos, xquat, S = fwd["xpos"], fwd["xquat"], fwd["S"]
    V, W = fwd["V"], fwd["W"]

    # per-body rotation matrices, computed at most once per step (qmat was
    # recomputed 46x/step on the humanoid before this cache — each is ~30
    # VPU ops that Mosaic will not CSE across call sites)
    Rcache: Dict[int, tuple] = {}

    def getR(b):
        R = Rcache.get(b)
        if R is None:
            R = Rcache[b] = qmat(xquat[b])
        return R

    # --- body spatial inertias (21-sym, origin frame) ---------------------
    Isym: Dict[int, tuple] = {}
    for b in range(1, model.nbody):
        R_b = getR(b)
        ip = tuple(float(x) for x in model.body_ipos[b])
        iq = tuple(float(x) for x in model.body_iquat[b])
        if ip != (0.0, 0.0, 0.0):
            xi = add3(xpos[b], qrot(xquat[b], ip))
        else:
            xi = xpos[b]
        if iq != (1.0, 0.0, 0.0, 0.0):
            R_i = qmat(qmul(xquat[b], iq))
        else:
            R_i = R_b
        Isym[b] = spatial_inertia_sym(
            float(model.body_mass[b]), model.body_inertia[b], xi, R_i)

    # --- forces -----------------------------------------------------------
    tau = [0.0] * nv
    g_diag = [0.0] * nv          # implicit diagonal damping terms
    Fext: Dict[int, tuple] = {b: (0.0,) * 6 for b in range(model.nbody)}
    Dcon: Dict[int, tuple] = {}  # per-body 6x6 contact damping (21-sym)

    # actuators (each transmission matches the corresponding branch of
    # engine._actuator_forces)
    dof2q = {j.dofadr: j.qposadr for j in model.joints
             if j.jtype in (SLIDE, HINGE)}
    for i, act in enumerate(model.actuators):
        u = ctrl[i]
        if act.ctrllimited:
            u = jnp.clip(u, float(act.ctrlrange[0]), float(act.ctrlrange[1]))
        b0, b1, b2 = [float(x) for x in act.bias]
        if act.site_bodyid >= 0:
            # site transmission (mjTRN_SITE, no refsite): world wrench from
            # the site-frame gear, moment = S-projection onto the site's
            # body chain — state-dependent, all available in scalar form
            b = act.site_bodyid
            R_b = getR(b)
            sp_l = tuple(float(x) for x in act.site_pos)
            p_s = (add3(xpos[b], qrot(xquat[b], sp_l))
                   if sp_l != (0.0, 0.0, 0.0) else xpos[b])
            sq = tuple(float(x) for x in act.site_quat)
            if sq != (1.0, 0.0, 0.0, 0.0):
                R_s = qmat(qmul(xquat[b], sq))
            else:
                R_s = R_b
            gv6 = [float(x) for x in act.gear6]
            Fw = tuple(fadd(fadd(fmul(R_s[r][0], gv6[0]),
                                 fmul(R_s[r][1], gv6[1])),
                            fmul(R_s[r][2], gv6[2])) for r in range(3))
            tq = tuple(fadd(fadd(fmul(R_s[r][0], gv6[3]),
                                 fmul(R_s[r][1], gv6[4])),
                            fmul(R_s[r][2], gv6[5])) for r in range(3))
            tau0 = add3(tq, cross(p_s, Fw))
            chain = _chain_dofs(model, b)
            moment = {d: fadd(dot3(S[d][0:3], tau0), dot3(S[d][3:6], Fw))
                      for d in chain}
            vel = sum(fmul(moment[d], qvel[d]) for d in chain)
            force = float(act.gain) * u
            if b0:
                force = force + b0
            if b2:
                force = force + b2 * vel
            if act.forcelimited:
                force = jnp.clip(force, float(act.forcerange[0]),
                                 float(act.forcerange[1]))
            for d in chain:
                tau[d] = fadd(tau[d], fmul(moment[d], force))
            continue
        if act.tendon_id >= 0:
            # fixed-tendon transmission: length/velocity are gear-scaled
            # tendon coordinates, moment = gear * coef row (mjTRN_TENDON)
            coef = model.tendon_coef[act.tendon_id]
            nz = np.nonzero(coef)[0]
            gear = float(act.gear)
            L = sum(float(coef[d]) * qpos[dof2q[d]] for d in nz)
            Ld = sum(float(coef[d]) * qvel[d] for d in nz)
            force = float(act.gain) * u
            if b0:
                force = force + b0
            if b1:
                force = force + b1 * (gear * L)
            if b2:
                force = force + b2 * (gear * Ld)
            if act.forcelimited:
                force = jnp.clip(force, float(act.forcerange[0]),
                                 float(act.forcerange[1]))
            for d in nz:
                tau[d] = fadd(tau[d], fmul(float(coef[d]) * gear, force))
            continue
        if act.ndof > 1:
            # motor on a ball/free joint: gear vector over the joint's
            # dofs; velocity bias = gear projection of qvel (motor-type
            # only — build guards position/bias servos on ball/free)
            gv = [float(x) for x in act.gear6[:act.ndof]]
            vel = sum(fmul(gv[k], qvel[act.dofadr + k])
                      for k in range(act.ndof))
            force = float(act.gain) * u
            if b2:
                force = force + b2 * vel
            if act.forcelimited:
                force = jnp.clip(force, float(act.forcerange[0]),
                                 float(act.forcerange[1]))
            for k in range(act.ndof):
                if gv[k]:
                    tau[act.dofadr + k] = fadd(tau[act.dofadr + k],
                                               fmul(gv[k], force))
            continue
        gear = float(act.gear)
        force = float(act.gain) * u
        if b0:
            force = force + b0
        if b1:
            force = force + b1 * (gear * qpos[act.qposadr])
        if b2:
            force = force + b2 * (gear * qvel[act.dofadr])
        if act.forcelimited:
            force = jnp.clip(force, float(act.forcerange[0]), float(act.forcerange[1]))
        tau[act.dofadr] = fadd(tau[act.dofadr], fmul(gear, force))

    # passive: damping, friction loss, springs, limits
    for d in range(nv):
        dmp = float(model.dof_damping[d])
        if dmp:
            tau[d] = fsub(tau[d], fmul(dmp, qvel[d]))
        fl = float(model.dof_frictionloss[d])
        if fl:
            w_fl = 0.05
            th = jnp.tanh(qvel[d] / w_fl)
            tau[d] = fsub(tau[d], fmul(fl, th))
            g_diag[d] = fadd(g_diag[d], fmul(fl / w_fl, 1.0 - th * th))
    hs_meff = {int(d): float(me)
               for d, me in zip(model.hs_dofadr, model.hs_limit_meff)}
    for jnt in model.joints:
        if jnt.jtype not in (SLIDE, HINGE):
            continue
        d, qa = jnt.dofadr, jnt.qposadr
        if jnt.stiffness:
            tau[d] = fsub(tau[d], float(jnt.stiffness) * (qpos[qa] - float(jnt.springref)))
        if jnt.limited:
            # solref/solimp-matched limit force with a0=0 (the "penalty"
            # engine tier — engine._limit_force with qacc0 dropped)
            meff = float(hs_meff[d])
            k_base, b_ref = _solref_kb_scalar(jnt.solref, jnt.solimp)
            lo, hi = float(jnt.range[0]), float(jnt.range[1])
            below = jnp.maximum(lo - qpos[qa], 0.0)
            above = jnp.maximum(qpos[qa] - hi, 0.0)
            viol = below + above
            s_dir = jnp.sign(below - above)
            active = (viol > 0).astype(viol.dtype)
            d_r = _imp_scalar(viol, jnt.solimp)
            f_l = jnp.maximum(
                meff * d_r * (d_r * k_base * viol - b_ref * (s_dir * qvel[d])),
                0.0) * active
            # restitution cap — matches engine._limit_force
            f_l = jnp.minimum(f_l, meff * jnp.maximum(
                _REST_VCAP - s_dir * qvel[d], 0.0) / float(h))
            c_l = meff * d_r * b_ref * active
            tau[d] = fadd(tau[d], s_dir * f_l)
            g_diag[d] = fadd(g_diag[d], c_l)

    # ball-joint quaternion springs: tau[dofs] -= k * subQuat(q, q_spring)
    # (engine mj_passive ball branch — local-frame rotation vector)
    for dofadr, qadr, k, qref in model.ball_springs:
        q4 = (qpos[qadr], qpos[qadr + 1], qpos[qadr + 2], qpos[qadr + 3])
        qr = tuple(float(x) for x in qref)
        vec = qlog(qmul(qconj(qr), q4))
        for i in range(3):
            tau[dofadr + i] = fsub(tau[dofadr + i], float(k) * vec[i])

    # ball-joint rotation-angle limits: constraint row J = -axis over the
    # ball's 3 dofs, same solref/solimp law as single-dof limits (matches
    # engine._limit_constraint_forces ball branch, penalty tier a0=0)
    ball_limit_G: List[Tuple[int, tuple, object]] = []
    for dofadr, qadr, max_angle, bl_solref, bl_solimp, bl_meff in model.ball_limits:
        q4 = (qpos[qadr], qpos[qadr + 1], qpos[qadr + 2], qpos[qadr + 3])
        rotvec = qlog(q4)
        angle = jnp.sqrt(dot3(rotvec, rotvec) + 1e-24)
        axis = scl3(rotvec, 1.0 / angle)
        viol = jnp.maximum(angle - float(max_angle), 0.0)
        v_row = -(dot3(axis, (qvel[dofadr], qvel[dofadr + 1],
                              qvel[dofadr + 2])))
        meff_b = float(bl_meff)
        k_base, b_ref = _solref_kb_scalar(bl_solref, bl_solimp)
        active = (viol > 0).astype(viol.dtype)
        d_r = _imp_scalar(viol, bl_solimp)
        f_b = jnp.maximum(
            meff_b * d_r * (d_r * k_base * viol - b_ref * v_row), 0.0) * active
        f_b = jnp.minimum(f_b, meff_b * jnp.maximum(
            _REST_VCAP - v_row, 0.0) / float(h))
        c_b = meff_b * d_r * b_ref * active
        for i in range(3):
            tau[dofadr + i] = fsub(tau[dofadr + i], axis[i] * f_b)
        ball_limit_G.append((dofadr, axis, c_b))

    # fixed tendons
    tendon_G: List[Tuple[np.ndarray, object]] = []
    for t in range(model.tendon_coef.shape[0]):
        if not model.tendon_limited[t]:
            continue
        if (model.tendon_is_spatial is not None
                and model.tendon_is_spatial[t]):
            raise NotImplementedError(
                "spatial-tendon limits are array-engine-only")
        coef = model.tendon_coef[t]
        nz = np.nonzero(coef)[0]
        # tendon length over qpos at single-dof joints
        dof2q = {j.dofadr: j.qposadr for j in model.joints if j.jtype in (SLIDE, HINGE)}
        L = sum(float(coef[d]) * qpos[dof2q[d]] for d in nz)
        Ldot = sum(float(coef[d]) * qvel[d] for d in nz)
        m_t = float(model.tendon_limit_meff[t])
        k_base, b_ref = _solref_kb_scalar(model.tendon_limit_solref[t],
                                          model.tendon_limit_solimp[t])
        lo, hi = float(model.tendon_range[t, 0]), float(model.tendon_range[t, 1])
        below = jnp.maximum(lo - L, 0.0)
        above = jnp.maximum(L - hi, 0.0)
        viol = below + above
        s_dir = jnp.sign(below - above)
        active = (viol > 0).astype(viol.dtype)
        d_r = _imp_scalar(viol, model.tendon_limit_solimp[t])
        f_t = s_dir * jnp.minimum(
            jnp.maximum(
                m_t * d_r * (d_r * k_base * viol - b_ref * (s_dir * Ldot)),
                0.0) * active,
            # restitution cap — matches engine._limit_force
            m_t * jnp.maximum(_REST_VCAP - s_dir * Ldot, 0.0) / float(h))
        c_t = m_t * d_r * b_ref * active
        for d in nz:
            tau[d] = fadd(tau[d], fmul(float(coef[d]), f_t))
        tendon_G.append((coef, c_t))

    # --- contacts ---------------------------------------------------------
    # plane-vs-primitive candidate points; normal force + regularized
    # friction as explicit forces, and per-body damping matrices D_b
    # (B_p^T C B_p summed over the body's points) for the implicit term.
    _VT_EPS = 5e-3
    for pair in model.contact_pairs:
        g1 = model.geoms[pair.geom1]
        g2 = model.geoms[pair.geom2]
        if g1.gtype != GEOM_PLANE:
            continue
        mu = pair.mu if pair.condim > 1 else 0.0
        # plane on the world body: constant frame (pure numpy — must not
        # touch the tracer)
        assert g1.bodyid == 0, "moving planes unsupported in the kernel"
        qw, qx, qy, qz = [float(v) for v in g1.quat]
        Rp = np.array([
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ])
        n_c = tuple(float(x) for x in Rp[:, 2])
        p0_dot_n = float(np.dot(np.asarray(g1.pos), Rp[:, 2]))

        b = g2.bodyid
        gpos_l = tuple(float(x) for x in g2.pos)
        gq_l = tuple(float(x) for x in g2.quat)
        gp = add3(xpos[b], qrot(xquat[b], gpos_l)) if gpos_l != (0, 0, 0) else xpos[b]
        gq = qmul(xquat[b], gq_l) if gq_l != (1.0, 0.0, 0.0, 0.0) else xquat[b]

        # mid-surface contact position + margin activation, matching the
        # array tier (physics.contact.collect_contact_rows): the contact
        # point sits at surface - n*phi/2 (mjContact.pos convention) and a
        # row activates when phi < margin with pen measured from the margin
        # surface. margin == 0 for humanoid/hopper (no behavior change).
        pts: List[Tuple[Vec3, object]] = []  # (point, phi)
        if g2.gtype == GEOM_SPHERE:
            r = float(g2.size[0])
            phi = dot3(n_c, gp) - p0_dot_n - r
            pts.append((sub3(gp, scl3(n_c, r + 0.5 * phi)), phi))
        elif g2.gtype == GEOM_CAPSULE and g2.gtype_orig == 5:
            # EXACT cylinder-vs-plane, matching the array tier (physics/
            # contact.py round-5): 3 rim points per cap — downhill extreme
            # + two at +-120 deg, downhill direction regularized toward the
            # cylinder's own x-axis near standing
            r, hl = float(g2.size[0]), float(g2.size[1])
            Rg = getR(b) if gq_l == (1.0, 0.0, 0.0, 0.0) else qmat(gq)
            axis = (Rg[0][2], Rg[1][2], Rg[2][2])
            adn = dot3(axis, n_c)
            d_cap = tuple(-(n_c[i] - adn * axis[i]) for i in range(3))
            dn2 = dot3(d_cap, d_cap)
            dn = jnp.sqrt(dn2 + 1e-30)
            ok = dn > 1e-6
            xax = (Rg[0][0], Rg[1][0], Rg[2][0])
            dhat = tuple(jnp.where(ok, d_cap[i] / dn, xax[i])
                         for i in range(3))
            dh_n = jax.lax.rsqrt(dot3(dhat, dhat))
            dhat = scl3(dhat, dh_n)
            perp = cross(axis, dhat)
            for sgn in (-1.0, 1.0):
                ce = add3(gp, scl3(axis, sgn * hl))
                for ca, sa in ((1.0, 0.0), (-0.5, 0.8660254037844386),
                               (-0.5, -0.8660254037844386)):
                    p_rim = add3(ce, add3(scl3(dhat, r * ca),
                                          scl3(perp, r * sa)))
                    phi = dot3(n_c, p_rim) - p0_dot_n
                    pts.append((sub3(p_rim, scl3(n_c, 0.5 * phi)), phi))
        elif g2.gtype == GEOM_CAPSULE:
            r, hl = float(g2.size[0]), float(g2.size[1])
            Rg = getR(b) if gq_l == (1.0, 0.0, 0.0, 0.0) else qmat(gq)
            axis = (Rg[0][2], Rg[1][2], Rg[2][2])
            for sgn in (-1.0, 1.0):
                ce = add3(gp, scl3(axis, sgn * hl))
                phi = dot3(n_c, ce) - p0_dot_n - r
                pts.append((sub3(ce, scl3(n_c, r + 0.5 * phi)), phi))
        elif g2.gtype == GEOM_BOX:
            sx, sy, sz = [float(x) for x in g2.size]
            Rg = getR(b) if gq_l == (1.0, 0.0, 0.0, 0.0) else qmat(gq)
            for cx in (-sx, sx):
                for cy in (-sy, sy):
                    for cz in (-sz, sz):
                        corner = add3(gp, tuple(
                            Rg[i][0] * cx + Rg[i][1] * cy + Rg[i][2] * cz
                            for i in range(3)))
                        phi = dot3(n_c, corner) - p0_dot_n
                        pts.append((sub3(corner, scl3(n_c, 0.5 * phi)), phi))
        elif g2.gtype == GEOM_MESH:
            # plane-vs-mesh: EVERY deduplicated mesh vertex is a candidate
            # point, penetration-gated like the box corners. (The array
            # tier ranks and keeps the 4 deepest — lane-local top-k would
            # serialize the kernel; with >4 simultaneously penetrating
            # vertices the tiers differ, documented.)
            Rg = getR(b) if gq_l == (1.0, 0.0, 0.0, 0.0) else qmat(gq)
            for v_loc in g2.mesh_verts:
                vx, vy, vz = [float(x) for x in v_loc]
                w = add3(gp, tuple(
                    Rg[i][0] * vx + Rg[i][1] * vy + Rg[i][2] * vz
                    for i in range(3)))
                phi = dot3(n_c, w) - p0_dot_n
                pts.append((sub3(w, scl3(n_c, 0.5 * phi)), phi))
        else:  # pragma: no cover
            raise NotImplementedError

        # solref/solimp-matched decoupled contact law (the "penalty" engine
        # tier — physics.contact.contact_terms with qacc0 dropped)
        k_base, b_ref = _solref_kb_scalar(pair.solref, pair.solimp)
        meff_c = float(pair.m_eff)
        Vb = V[b]
        wb, v0b = Vb[0:3], Vb[3:6]
        marg = float(pair.margin)
        for point, phi in pts:
            v_pt = add3(v0b, cross(wb, point))
            vn = dot3(n_c, v_pt)
            vt = sub3(v_pt, scl3(n_c, vn))
            pen = jnp.maximum(marg - phi, 0.0)
            active = (phi < marg).astype(pen.dtype)
            d_r = _imp_scalar(pen, pair.solimp)
            c_n = meff_c * d_r * b_ref
            fn = jnp.maximum(
                meff_c * d_r * d_r * k_base * pen - c_n * vn, 0.0) * active
            # restitution cap (physics.contact.RESTITUTION_VCAP): same law
            # as the array penalty tier — unlimited braking, outward push
            # only up to the cap separation velocity. Without it the planner
            # discovers foot-slam catapults at large K (VERDICT r1).
            fn = jnp.minimum(
                fn, meff_c * jnp.maximum(_REST_VCAP - vn, 0.0) / float(h))
            vt_norm = jnp.sqrt(dot3(vt, vt) + _VT_EPS * _VT_EPS)
            ct = mu * fn / vt_norm if mu else 0.0
            f = sub3(scl3(n_c, fn), scl3(vt, ct) if mu else (0.0, 0.0, 0.0))
            trq = cross(point, f)
            Fext[b] = add6(Fext[b], trq + f)
            # damping matrix: D += cn_eff u_z u_z^T + ct_eff (u_x u_x^T + u_y u_y^T)
            # with u_a = [row_a(-skew(p)); e_a] and C in the contact frame
            # (normal n): use world axes when n is world-z (the common case);
            # otherwise build the frame from n.
            cn_eff = c_n * active
            ct_eff = ct * active if mu else 0.0
            px, py, pz = point
            if n_c == (0.0, 0.0, 1.0):
                u_x = (0.0, pz, -py, 1.0, 0.0, 0.0)
                u_y = (-pz, 0.0, px, 0.0, 1.0, 0.0)
                u_z = (py, -px, 0.0, 0.0, 0.0, 1.0)
            else:
                # general orthonormal frame (t1, t2, n)
                nz_ = np.asarray(n_c)
                t1 = np.cross(nz_, [0.0, 0.0, 1.0])
                if np.linalg.norm(t1) < 1e-6:
                    t1 = np.cross(nz_, [0.0, 1.0, 0.0])
                t1 /= np.linalg.norm(t1)
                t2 = np.cross(nz_, t1)

                def u_of(a):
                    # row for "point velocity along axis a": [p x a; a]
                    ax, ay, az = [float(x) for x in a]
                    return (py * az - pz * ay,
                            pz * ax - px * az,
                            px * ay - py * ax,
                            ax, ay, az)
                u_x, u_y, u_z = u_of(t1), u_of(t2), u_of(n_c)
            D = Dcon.get(b, sym_zero())
            D = sym_add(D, sym_rank1(u_z, cn_eff))
            if mu:
                D = sym_add(D, sym_add(sym_rank1(u_x, ct_eff), sym_rank1(u_y, ct_eff)))
            Dcon[b] = D

    # --- bias forces: origin-frame Newton-Euler with qacc=0 ---------------
    children = _body_children(model)
    a_grav = (0.0, 0.0, 0.0) + tuple(-float(g) for g in model.gravity)
    a_bias: Dict[int, tuple] = {0: a_grav}
    order = list(range(1, model.nbody))
    for b in order:
        a = a_bias[model.body_parent[b]]
        for jidx in model.body_joints[b]:
            jnt = model.joints[jidx]
            for i in range(jnt.ndof):
                a = add6(a, W[jnt.dofadr + i])
        a_bias[b] = a

    f_net: Dict[int, tuple] = {}
    for b in order:
        IV = sym_mat_vec(Isym[b], V[b])
        Ia = sym_mat_vec(Isym[b], a_bias[b])
        # v x* f: [w x n + vl x fl; w x fl]
        w, vl = V[b][0:3], V[b][3:6]
        n_, fl_ = IV[0:3], IV[3:6]
        vxf = add3(cross(w, n_), cross(vl, fl_)) + cross(w, fl_)
        f_net[b] = add6(Ia, vxf)

    # accumulate F_hat = f_net - Fext up the tree, project onto S
    F_hat: Dict[int, tuple] = {}
    for b in reversed(order):
        F = add6(f_net[b], tuple(-x for x in Fext[b]))
        for c in children[b]:
            F = add6(F, F_hat[c])
        F_hat[b] = F
    rhs = [None] * nv  # tau - bias, assembled below
    for d in range(nv):
        b = int(model.dof_bodyid[d])
        rhs[d] = fsub(tau[d], dot6(S[d], F_hat[b]))

    # --- composite inertia pass: Mh entries (tree-sparse) -----------------
    # fold implicit contact damping: I_aug = I + h * D_contact
    IC: Dict[int, tuple] = {}
    for b in reversed(order):
        I_aug = Isym[b]
        if b in Dcon:
            I_aug = sym_add(I_aug, sym_scale(Dcon[b], h))
        for c in children[b]:
            I_aug = sym_add(I_aug, IC[c])
        IC[b] = I_aug

    Mh: Dict[Tuple[int, int], object] = {}
    for d in range(nv):
        b = int(model.dof_bodyid[d])
        Fd = sym_mat_vec(IC[b], S[d])
        for e in _chain_dofs(model, b):
            if e > d:
                continue
            Mh[(d, e)] = dot6(S[e], Fd)
    for d in range(nv):
        extra = float(model.dof_armature[d]) + h * float(model.dof_damping[d])
        Mh[(d, d)] = fadd(fadd(Mh[(d, d)], extra), fmul(h, g_diag[d]))
    for coef, c_act in tendon_G:
        nz = np.nonzero(coef)[0]
        for i_, d in enumerate(nz):
            for e in nz[: i_ + 1]:
                key = (max(d, e), min(d, e))
                Mh[key] = Mh[key] + h * float(coef[d]) * float(coef[e]) * c_act
    # ball-limit implicit damping: rank-1 c_b * axis axis^T over the ball's
    # 3 dofs (same chain -> all Mh entries exist)
    for dofadr, axis, c_b in ball_limit_G:
        for i_ in range(3):
            for j_ in range(i_ + 1):
                key = (dofadr + i_, dofadr + j_)
                Mh[key] = Mh[key] + h * c_b * axis[i_] * axis[j_]

    # --- tree-sparse Cholesky + solve -------------------------------------
    # MJCF dofs are topologically ordered parents-first; zero fill-in
    # requires eliminating LEAVES first (mujoco's LDL does the same), so the
    # factorization runs on the reverse ordering: elimination position
    # a = nv-1-d. The sparsity relation "d, e on one kinematic chain" is
    # symmetric, so L's pattern under this ordering is exactly the chain
    # pattern — no fill.
    chainset = [set(_chain_dofs(model, int(model.dof_bodyid[d]))) for d in range(nv)]

    def Mget(d, e):
        return Mh[(max(d, e), min(d, e))]

    # elimination order: dof nv-1 first ... dof 0 last
    elim = list(range(nv - 1, -1, -1))
    # chol_lower[(d, e)]: entry at (elim-pos of d, elim-pos of e), d
    # eliminated AFTER e (i.e. d < e in original index), both on one chain
    Lc: Dict[Tuple[int, int], object] = {}
    Ldiag_inv = [None] * nv

    def later_chain(d):
        """dofs eliminated before d whose L-row/col intersects d: the
        DESCENDANT dofs e > d on a chain through d (d in chainset[e])."""
        return [e for e in range(d + 1, nv) if d in chainset[e]]

    for d in elim:  # = descending original index
        lc = later_chain(d)
        s = fsub(Mget(d, d), fdot([Lc[(d, p)] for p in lc],
                                  [Lc[(d, p)] for p in lc]))
        dinv = jax.lax.rsqrt(s)
        Ldiag_inv[d] = dinv
        Lc[(d, d)] = s * dinv  # sqrt(s)
        # rows eliminated after d: original index i < d with chain relation
        for i in sorted(chainset[d]):
            if i >= d:
                break
            # common earlier-eliminated dofs: chain(d) with index > d
            # (chain(d) indices > d are in chain(i) iff also chained to i —
            # they are: chain(d) is totally ordered along the path, and any
            # e > d on d's chain lies below d, hence also on i's chain only
            # if i is an ancestor of e; i < d <= e and i,d chained, d,e
            # chained => i,e chained (tree path transitivity).)
            v = fsub(Mget(i, d), fdot([Lc[(i, p)] for p in lc],
                                      [Lc[(d, p)] for p in lc]))
            Lc[(i, d)] = v * dinv

    # solve (L L^T) x = rhs in elimination order
    y = {}
    for d in elim:
        lc = later_chain(d)
        v = fsub(rhs[d], fdot([Lc[(d, p)] for p in lc], [y[p] for p in lc]))
        y[d] = v * Ldiag_inv[d]
    qacc_d = {}
    for d in range(nv):  # reverse elimination order
        anc = [i for i in sorted(chainset[d]) if i < d]
        v = fsub(y[d], fdot([Lc[(i, d)] for i in anc],
                            [qacc_d[i] for i in anc]))
        qacc_d[d] = v * Ldiag_inv[d]
    qacc = [qacc_d[d] for d in range(nv)]

    # --- integrate --------------------------------------------------------
    qvel_new = [qvel[d] + h * qacc[d] for d in range(nv)]
    qpos_new = list(qpos)
    for jnt in model.joints:
        if jnt.jtype in (SLIDE, HINGE):
            qpos_new[jnt.qposadr] = qpos[jnt.qposadr] + h * qvel_new[jnt.dofadr]
        elif jnt.jtype == BALL:
            # local-frame quaternion integration, same dq form as the free
            # joint's rotational block (engine integrate BALL branch)
            qa, d = jnt.qposadr, jnt.dofadr
            wx, wy, wz = qvel_new[d], qvel_new[d + 1], qvel_new[d + 2]
            ang2 = wx * wx + wy * wy + wz * wz
            ang = jnp.sqrt(ang2 + 1e-30)
            half = 0.5 * h * ang
            sinc = jnp.sin(half) / ang
            dq = (jnp.cos(half), wx * sinc, wy * sinc, wz * sinc)
            qn = qmul((qpos[qa], qpos[qa + 1], qpos[qa + 2], qpos[qa + 3]), dq)
            norm_inv = jax.lax.rsqrt(qn[0] ** 2 + qn[1] ** 2
                                     + qn[2] ** 2 + qn[3] ** 2)
            for i in range(4):
                qpos_new[qa + i] = qn[i] * norm_inv
        else:  # FREE
            qa, d = jnt.qposadr, jnt.dofadr
            for i in range(3):
                qpos_new[qa + i] = qpos[qa + i] + h * qvel_new[d + i]
            wx, wy, wz = qvel_new[d + 3], qvel_new[d + 4], qvel_new[d + 5]
            ang2 = wx * wx + wy * wy + wz * wz
            ang = jnp.sqrt(ang2 + 1e-30)
            half = 0.5 * h * ang
            sinc = jnp.sin(half) / ang
            dq = (jnp.cos(half), wx * sinc, wy * sinc, wz * sinc)
            qn = qmul((qpos[qa + 3], qpos[qa + 4], qpos[qa + 5], qpos[qa + 6]), dq)
            norm_inv = jax.lax.rsqrt(qn[0] ** 2 + qn[1] ** 2 + qn[2] ** 2 + qn[3] ** 2)
            for i in range(4):
                qpos_new[qa + 3 + i] = qn[i] * norm_inv

    ctx = StepContext()
    ctx.qpos = qpos_new
    ctx.qvel = qvel_new
    ctx.ctrl = list(ctrl)
    ctx.time = time + h
    ctx.xpos = xpos
    ctx.xquat = xquat
    ctx.body_vel = V
    ctx._debug = {"Mh": Mh, "rhs": rhs, "qacc": qacc, "tau": tau}
    return qpos_new, qvel_new, ctx


def post_step_kinematics(model: PhysicsModel, ctx: StepContext) -> StepContext:
    """Recompute FK/velocities on the post-step state (cost functions read
    post-step body poses — reference evaluates costs after mj_step)."""
    xpos, xquat, S = _fk_scalar(model, ctx.qpos)
    V, _ = _velocities_and_sdot(model, S, ctx.qvel)
    out = StepContext()
    out.qpos, out.qvel, out.ctrl, out.time = ctx.qpos, ctx.qvel, ctx.ctrl, ctx.time
    out.xpos, out.xquat, out.body_vel = xpos, xquat, V
    return out


def ctx_from(model: PhysicsModel, fwd: dict, qpos, qvel, ctrl, time) -> StepContext:
    """StepContext view over cached scalar_forward internals."""
    ctx = StepContext()
    ctx.qpos = list(qpos)
    ctx.qvel = list(qvel)
    ctx.ctrl = list(ctrl)
    ctx.time = time
    ctx.xpos = fwd["xpos"]
    ctx.xquat = fwd["xquat"]
    ctx.body_vel = fwd["V"]
    return ctx
