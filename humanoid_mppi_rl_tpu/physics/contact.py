"""Smooth penalty contact model with solref/solimp-matched impedance and
implicit damping (floor contacts).

Replaces MuJoCo's constraint solver with compliant point contacts — the
standard trick for a vmappable, branch-free JAX step. Primitives vs a static
plane: sphere (1 point), capsule (2 endpoint spheres), box (8 corners).
Candidate pairs are precomputed statically (model.build_from_mjcf); every
point always contributes, gated to zero when separated.

Force law: MuJoCo's soft-constraint dynamics pursued at force level. MuJoCo
drives each contact toward the reference acceleration

    aref = -b vn + k(r) pen,   b = 2/(dmax tau),  k(r) = d(r)/(dmax^2 tau^2 zeta^2)

with (tau, zeta) = the pair's solref, d(r) the solimp impedance spline of the
penetration, and resolves it through the regularized solve
f = (aref - a0)/(A + R), A = J M^-1 J^T, R = (1-d)/d * A, which collapses to
f = d(r) * m_eff * aref with m_eff = 1/A. We evaluate exactly that, with
m_eff frozen at its qpos0 value (model.ContactPair.m_eff) and the
unconstrained acceleration a0 dropped — the penalty approximation. Matching
the per-pair impedance instead of a global stiffness heuristic roughly
halves the one-step qpos error vs the MuJoCo C oracle on contact-active
frames (scripts/dev_contact_fidelity.py).

Stability: stiff springs on light bodies (a ~1 kg humanoid foot supporting a
40 kg body) are explicitly unstable at dt=5 ms, so the damping part is
handled *implicitly*: each active contact point contributes

    force(v+) = fn_spring * n - C v+ ,   C = c_n n n^T + c_t (1 - n n^T)

with c_n = m_eff d(r) b and c_t = mu * fn / sqrt(|vt|^2 + eps^2) (regularized
Coulomb slope). The engine folds h * J^T C J into the same (M + h D)
factorization it already does for MuJoCo-style implicit joint damping, which
makes arbitrarily stiff contact damping unconditionally stable, while the
spring term stays explicit.

contact_terms() returns:
  tau    (nv,)       generalized explicit contact force sum_p J_p^T f_p
  G      (nv, nv)    sum_p J_p^T C_p J_p  to be added as  M += h * G

Contact sources: static-plane points (always-on candidate rows, gated by
penetration) and body-body "self" pairs (segment-segment narrowphase over
all candidate pairs, penetration-ranked top-K selection for a static row
count — see _self_rows).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from . import spatial as sp
from .model import (GEOM_BOX, GEOM_CAPSULE, GEOM_MESH, GEOM_PLANE,
                    GEOM_SPHERE, PhysicsModel)

_VT_EPS = 5e-3  # m/s tangential regularization (implicit => can be small)

# Restitution cap [m/s]: constraint rows may BRAKE an approaching contact
# without bound, but may only PUSH a row outward until its separation
# velocity reaches this value. Soft-constraint (Baumgarte) dynamics store
# deep penetration as spring energy and release it as a catapult — at
# pen=0.3 m the humanoid's solref gives aref ~ 700 m/s^2, a >10 m ballistic
# launch in one step. MuJoCo C has the same failure mode but the reference
# never visits those states (K<=75 MPPI can't find the exploit); at K=8192
# MPPI reliably discovers foot-slam energy injection (VERDICT r1: seed-0
# humanoid_walk flew to max_foot_z=16 m). The cap removes the exploit at
# the physics level in every tier (coupled QP aref, penalty force law,
# Pallas kernel scalar law) while leaving normal stance/impact forces
# untouched: stance needs separation velocity ~0 and braking is uncapped.
# Normal-walking exit velocities from Baumgarte stabilization are <~0.2 m/s.
RESTITUTION_VCAP = 0.5

# Environment (coupled/Newton) tier cap: the plant must match MuJoCo on
# golden replays, and legitimate deep-stance frames (humanoid golden frames
# 1117-1118: 4.7 cm foot penetration) need h*aref up to ~0.6 m/s that the
# 0.5 m/s planner cap distorts into an 8e-3 one-step error. 2.0 m/s still
# bounds a foot-slam bounce to ~0.2 m (the r1 exploit launched at >10 m/s)
# while leaving every observed MuJoCo-legitimate aref uncapped — the
# measured cap-free golden max is 1.7e-3 (scripts/dev_go1_golden.py triage).
RESTITUTION_VCAP_ENV = 2.0


def impedance(pen: jax.Array, solimp) -> jax.Array:
    """MuJoCo solimp impedance spline d(r) (mj docs "Solver parameters"):
    sigmoid from d0 to dmax over `width` of violation. `pen` (P,) traced,
    `solimp` (P, 5) static numpy."""
    import numpy as np

    si = np.asarray(solimp, dtype=np.float64)
    d0, dmax, width, mid, power = (si[:, 0], si[:, 1], si[:, 2], si[:, 3],
                                   si[:, 4])
    dt = pen.dtype
    x = jnp.clip(pen / jnp.asarray(width, dt), 0.0, 1.0)
    mid_j = jnp.asarray(mid, dt)
    # uniform integer power (the default 2.0) lowers to multiplies instead
    # of a transcendental pow
    p0 = float(power[0]) if power.size else 2.0
    if power.size and (power == p0).all() and p0 == int(p0) and 1 <= p0 <= 4:
        def powf(v):
            r = v
            for _ in range(int(p0) - 1):
                r = r * v
            return r
    else:
        pow_j = jnp.asarray(power, dt)

        def powf(v):
            return v ** pow_j
    lo = mid_j * powf(x / mid_j)
    hi = 1.0 - (1.0 - mid_j) * powf((1.0 - x) / (1.0 - mid_j))
    s = jnp.where(x < mid_j, lo, hi)
    return jnp.asarray(d0, dt) + s * jnp.asarray(dmax - d0, dt)


def solref_kb(solref, solimp):
    """Static per-point (k_base, b) numpy arrays from solref/solimp:
    aref = -b*vn + d(r)*k_base*pen (positive-solref convention only)."""
    import numpy as np

    sr = np.asarray(solref, dtype=np.float64)
    dmax = np.asarray(solimp, dtype=np.float64)[:, 1]
    tau, zeta = sr[:, 0], sr[:, 1]
    assert (tau > 0).all(), "direct (negative) solref not supported"
    b = 2.0 / (dmax * tau)
    k_base = 1.0 / (dmax * dmax * tau * tau * zeta * zeta)
    return k_base, b


def _geom_world(model: PhysicsModel, state, gidx: int, dtype):
    g = model.geoms[gidx]
    b = g.bodyid
    R_b = sp.quat_to_mat(state.xquat[b])
    pos = state.xpos[b] + R_b @ jnp.asarray(g.pos, dtype)
    R = R_b @ sp.quat_to_mat(jnp.asarray(g.quat, dtype))
    return pos, R


# ---------------------------------------------------------------------------
# body-body (self) contacts: batched segment-segment narrowphase + top-K
# ---------------------------------------------------------------------------

# static cap on simultaneously-active self contacts kept as QP/penalty rows;
# candidates are ranked by penetration depth each step (lax.top_k), so the
# row count stays shape-static while the candidate set can be large (697
# candidate pairs on Go1). Deeper-than-K pile-ups are a documented
# approximation.
SELF_TOPK = 8


def _self_pair_static(model: PhysicsModel):
    """Static numpy arrays for every capsule/sphere(-like) self pair.

    Spheres are segments of half-length 0; cylinders are approximated as
    capsules (documented — Go1 hip cylinders); box self pairs are skipped
    (Go1 trunk; MuJoCo box-capsule narrowphase is out of round scope)."""
    import numpy as np

    ok_types = (GEOM_SPHERE, GEOM_CAPSULE, 5)  # 5 = mjGEOM_CYLINDER
    idx, skipped = [], 0
    for k, pair in enumerate(model.contact_pairs):
        g1 = model.geoms[pair.geom1]
        g2 = model.geoms[pair.geom2]
        if g1.gtype == GEOM_PLANE or g2.gtype == GEOM_PLANE:
            continue
        if g1.gtype not in ok_types or g2.gtype not in ok_types:
            skipped += 1
            continue
        idx.append(k)
    if not idx:
        return None

    def _half_len(g):
        """Segment half-length: capsules as-is; cylinders INSCRIBED
        (half-length minus radius) so the round caps never extend past the
        flat faces (false trunk/thigh contact otherwise)."""
        if g.gtype != GEOM_CAPSULE:
            return 0.0
        if g.gtype_orig == 5:  # mjGEOM_CYLINDER
            return max(float(g.size[1]) - float(g.size[0]), 0.0)
        return float(g.size[1])

    def geom_arrs(which):
        gs = [model.geoms[getattr(model.contact_pairs[k], which)] for k in idx]
        return (
            np.array([g.bodyid for g in gs]),
            np.stack([g.pos for g in gs]),
            np.stack([g.quat for g in gs]),
            np.array([g.size[0] for g in gs]),                 # radius
            np.array([_half_len(g) for g in gs]),              # half-length
            np.array([g.gtype == GEOM_CAPSULE for g in gs]),
        )

    b1, pos1, quat1, r1, h1, iscap1 = geom_arrs("geom1")
    b2, pos2, quat2, r2, h2, iscap2 = geom_arrs("geom2")
    prs = [model.contact_pairs[k] for k in idx]
    solref = np.stack([p.solref for p in prs])
    solimp = np.stack([p.solimp for p in prs])
    return dict(
        b1=b1, b2=b2, pos1=pos1, quat1=quat1, r1=r1, h1=h1, iscap1=iscap1,
        pos2=pos2, quat2=quat2, r2=r2, h2=h2, iscap2=iscap2,
        mu=np.array([p.mu if p.condim > 1 else 0.0 for p in prs]),
        meff=np.array([p.m_eff for p in prs]),
        invw=np.array([p.invw0 for p in prs]),
        solref=solref, solimp=solimp, capcap=iscap1 & iscap2,
        margin=np.array([p.margin for p in prs]),
        condim=np.array([p.condim for p in prs], dtype=np.int64),
        friction5=np.stack([
            p.friction5 if p.friction5 is not None
            else np.array([p.mu, p.mu, 0.005, 1e-4, 1e-4]) for p in prs]),
    )


def _self_rows(model: PhysicsModel, state, S: jax.Array, dtype, topk: int):
    """Top-K self-contact rows: narrowphase over all candidate pairs,
    penetration-ranked static-shape selection, relative point jacobians.

    Narrowphase: every sphere/capsule is a segment + radius; closest points
    by the clamped two-pass segment-segment solve (matches the MuJoCo C
    oracle's capsule-capsule dist/pos/normal to ~1e-15, scripts/
    dev_contact_fidelity.py). Contact frame tangent t1 follows the oracle's
    conventions: capsule-capsule t1 = normalize(n x axis2), otherwise
    Gram-Schmidt of world z against n.
    """
    import numpy as np

    sp_ = _self_pair_static(model)
    if sp_ is None:
        return None
    Pc = sp_["b1"].shape[0]
    topk = min(topk, Pc)

    def world(bids, lpos, lquat):
        xq = state.xquat[jnp.asarray(bids)]                  # (Pc, 4)
        xp = state.xpos[jnp.asarray(bids)]
        q = sp.quat_mul(xq, jnp.asarray(lquat, dtype))
        p = xp + sp.quat_rotate(xq, jnp.asarray(lpos, dtype))
        ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
        u = sp.quat_rotate(q, jnp.broadcast_to(ez, (bids.shape[0], 3)))
        return p, u

    p1, u1 = world(sp_["b1"], sp_["pos1"], sp_["quat1"])
    p2, u2 = world(sp_["b2"], sp_["pos2"], sp_["quat2"])
    hh1 = jnp.asarray(sp_["h1"], dtype)
    hh2 = jnp.asarray(sp_["h2"], dtype)

    # clamped segment-segment closest points (two refinement passes)
    d12 = p2 - p1
    bb = jnp.sum(u1 * u2, axis=-1)
    dd = jnp.sum(u1 * d12, axis=-1)
    ee = jnp.sum(u2 * d12, axis=-1)
    den = jnp.maximum(1.0 - bb * bb, 1e-12)
    s = jnp.clip((dd - bb * ee) / den, -hh1, hh1)
    t = jnp.clip(jnp.sum(u2 * (p1 + s[:, None] * u1 - p2), -1), -hh2, hh2)
    s = jnp.clip(jnp.sum(u1 * (p2 + t[:, None] * u2 - p1), -1), -hh1, hh1)
    t = jnp.clip(jnp.sum(u2 * (p1 + s[:, None] * u1 - p2), -1), -hh2, hh2)
    c1 = p1 + s[:, None] * u1
    c2 = p2 + t[:, None] * u2

    dvec = c2 - c1
    dist = jnp.sqrt(jnp.sum(dvec * dvec, -1) + 1e-24)
    n = dvec / dist[:, None]                                  # geom1 -> geom2
    rr = jnp.asarray(sp_["r1"] + sp_["r2"], dtype)
    phi = dist - rr
    pos = c1 + n * (jnp.asarray(sp_["r1"], dtype) + 0.5 * phi)[:, None]

    # contact-frame tangent (oracle conventions, see docstring)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    ey = jnp.asarray([0.0, 1.0, 0.0], dtype)
    gs_z = ez - n[:, 2:3] * n
    gs_y = ey - n[:, 1:2] * n
    gs = jnp.where((jnp.linalg.norm(gs_z, axis=-1) > 1e-6)[:, None], gs_z, gs_y)
    gs = gs / jnp.linalg.norm(gs, axis=-1, keepdims=True)
    cx = jnp.cross(n, u2)
    cx_ok = (jnp.linalg.norm(cx, axis=-1) > 1e-8)[:, None]
    cx = jnp.where(cx_ok, cx, gs)
    cx = cx / jnp.linalg.norm(cx, axis=-1, keepdims=True)
    capcap = jnp.asarray(sp_["capcap"], bool)[:, None]
    t1 = jnp.where(capcap, cx, gs)

    # margin semantics (mjContact.includemargin, gap=0 for the task robots):
    # a row activates when dist < margin, and the impedance/spring position
    # is measured from the margin surface (verified against mjData.efc_aref,
    # scripts/dev_go1_golden.py). All-zero margins for humanoid/hopper keep
    # the original behavior bit-for-bit.
    marg = jnp.asarray(sp_["margin"], dtype)
    pen_all = jnp.maximum(marg - phi, 0.0)
    # pre-gather per-candidate impedance terms (static solimp handling)
    d_r_all = impedance(pen_all, sp_["solimp"]).astype(dtype)
    kb_all, br_all = solref_kb(sp_["solref"], sp_["solimp"])   # static np

    _, sel = jax.lax.top_k(pen_all, topk)                     # (K,) traced

    def g(x):
        return x[sel]

    pen, d_r = g(pen_all), g(d_r_all)
    active = (g(phi) < g(marg)).astype(dtype)
    n_k, t1_k, pos_k = g(n), g(t1), g(pos)
    t2_k = jnp.cross(n_k, t1_k)
    bid1 = jnp.asarray(sp_["b1"])[sel]
    bid2 = jnp.asarray(sp_["b2"])[sel]

    # relative point velocity and jacobian (force on body2 along +n,
    # reaction on body1): J = J_pt(b2) - J_pt(b1)
    V1 = state.body_vel[bid1]
    V2 = state.body_vel[bid2]
    v_rel = (V2[:, 3:] + jnp.cross(V2[:, :3], pos_k)
             - V1[:, 3:] - jnp.cross(V1[:, :3], pos_k))
    vn = jnp.sum(n_k * v_rel, -1)
    vt = v_rel - vn[:, None] * n_k
    vt1 = jnp.sum(t1_k * v_rel, -1)
    vt2 = jnp.sum(t2_k * v_rel, -1)

    Amask = jnp.asarray(model.ancestor_mask, dtype)
    Arel = Amask[bid2] - Amask[bid1]                          # (K, nv)
    S_ang, S_lin = S[:, :3], S[:, 3:]
    cross_Sp = jnp.cross(S_ang[None, :, :], pos_k[:, None, :])
    Jp = (S_lin[None] + cross_Sp) * Arel[:, :, None]          # (K, nv, 3)
    JpN = jnp.sum(Jp * n_k[:, None, :], -1)
    Jt1 = jnp.sum(Jp * t1_k[:, None, :], -1)
    Jt2 = jnp.sum(Jp * t2_k[:, None, :], -1)
    # relative angular jacobian rows (condim>=4 torsional/rolling friction)
    Jw = S_ang[None] * Arel[:, :, None]                       # (K, nv, 3)
    JwN = jnp.sum(Jw * n_k[:, None, :], -1)
    Jwt1 = jnp.sum(Jw * t1_k[:, None, :], -1)
    Jwt2 = jnp.sum(Jw * t2_k[:, None, :], -1)

    kb = jnp.asarray(kb_all, dtype)[sel]
    br = jnp.asarray(br_all, dtype)[sel]
    meff = jnp.asarray(sp_["meff"], dtype)[sel]
    invw = jnp.asarray(sp_["invw"], dtype)[sel]
    mu = jnp.asarray(sp_["mu"], dtype)[sel]
    fri5 = jnp.asarray(sp_["friction5"], dtype)[sel]          # (K, 5) traced
    c_n = meff * d_r * br
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, -1) + _VT_EPS * _VT_EPS)

    return dict(pen=pen, active=active, n=n_k, vn=vn, vt=vt, vt1=vt1,
                vt2=vt2, vt_norm=vt_norm, Jp=Jp, JpN=JpN, Jt1=Jt1, Jt2=Jt2,
                JwN=JwN, Jwt1=Jwt1, Jwt2=Jwt2,
                d_r=d_r, c_n=c_n, mu=mu, k_base=kb, b_ref=br, meff=meff,
                invw=invw, fri5=fri5,
                condim_max=int(sp_["condim"].max()) if len(sp_["condim"]) else 1)


def collect_contact_rows(model: PhysicsModel, state, S: jax.Array):
    """Stack all candidate plane-contact points into row arrays.

    Returns None when the model has no plane pairs, else a dict with traced
    arrays (p, pen, active, n, vn, vt, vt_norm, Jp, JpN, d_r, c_n) and static
    numpy arrays (bid, mu, k_base, b_ref, meff). P points, typically 20-40
    for the task robots, in one batched computation.
    """
    import numpy as np

    dtype = state.qpos.dtype

    body_ids: List[int] = []
    other_ids: List[int] = []    # reaction body per row (0 = world)
    points: List[jax.Array] = []
    phis: List[jax.Array] = []
    normals: List[jax.Array] = []
    mus: List[float] = []
    solrefs: List = []
    solimps: List = []
    meffs: List[float] = []
    invws: List[float] = []
    margins: List[float] = []
    condims: List[int] = []
    fri5s: List = []

    tangents: List[jax.Array] = []

    def _make_frame_tangent(n):
        """mju_makeFrame tangent convention: t1 = normalize(n x e_x), with
        e_y fallback when n ~ e_x (verified against the MuJoCo C oracle for
        sphere/plane contacts, scripts/dev_contact_fidelity.py)."""
        ex = jnp.asarray([1.0, 0.0, 0.0], dtype)
        ey = jnp.asarray([0.0, 1.0, 0.0], dtype)
        c1 = jnp.cross(n, ex)
        c2 = jnp.cross(n, ey)
        n1 = jnp.linalg.norm(c1)
        use1 = n1 > 1e-8
        t = jnp.where(use1, c1, c2)
        return t / jnp.linalg.norm(t)

    def _hull_sdf(g, g_pos, g_R, world):
        """Signed distance + gradient of a MESH geom's convex hull at each
        world point (V, 3): phi = max over hull face planes (exact inside
        and in the face regime outside; a lower bound near outside
        edges/corners — contact only cares about phi < margin, documented).
        Gradient = outward normal of the deepest face, rotated to world."""
        eq = jnp.asarray(g.mesh_hull, dtype)               # (F, 4)
        local = (world - g_pos[None, :]) @ g_R             # (V, 3)
        d_all = local @ eq[:, :3].T + eq[None, :, 3]       # (V, F)
        j = jnp.argmax(d_all, axis=-1)                     # (V,)
        phi = jnp.max(d_all, axis=-1)
        n_loc = eq[j, :3]                                  # (V, 3)
        return phi, n_loc @ g_R.T

    def _prim_sdf(g, p_pos, p_R, world):
        """Signed distance + outward gradient of a sphere/capsule/box/mesh
        geom at each world point (V, 3). Gradient points from the geom's
        surface toward the point (into the other-geom side)."""
        size = jnp.asarray(g.size, dtype)
        eps = jnp.asarray(1e-12, dtype)
        if g.gtype == GEOM_SPHERE:
            diff = world - p_pos[None, :]
            d = jnp.linalg.norm(diff, axis=-1)
            return d - size[0], diff / jnp.maximum(d, eps)[:, None]
        if g.gtype == GEOM_CAPSULE:
            hl = (jnp.maximum(size[1] - size[0], 0.0)
                  if g.gtype_orig == 5 else size[1])  # inscribed cylinder
            axis = p_R[:, 2]
            t = jnp.clip((world - p_pos[None, :]) @ axis, -hl, hl)
            diff = world - (p_pos[None, :] + t[:, None] * axis[None, :])
            d = jnp.linalg.norm(diff, axis=-1)
            return d - size[0], diff / jnp.maximum(d, eps)[:, None]
        if g.gtype == GEOM_BOX:
            u = (world - p_pos[None, :]) @ p_R                 # local coords
            s = size[:3]
            q = jnp.clip(u, -s, s)
            diff = u - q                                       # 0 when inside
            d = jnp.linalg.norm(diff, axis=-1)
            # inside: distance to the nearest face (negative), gradient
            # along that face's axis
            face = jnp.abs(u) - s[None, :]                     # (V, 3) <= 0
            j = jnp.argmax(face, axis=-1)
            phi_in = jnp.max(face, axis=-1)
            g_in = jax.nn.one_hot(j, 3, dtype=dtype) * jnp.sign(u)
            out = d > 1e-9
            phi = jnp.where(out, d, phi_in)
            g_loc = jnp.where(out[:, None],
                              diff / jnp.maximum(d, eps)[:, None], g_in)
            return phi, g_loc @ p_R.T
        if g.gtype == GEOM_MESH:
            return _hull_sdf(g, p_pos, p_R, world)
        raise NotImplementedError(f"mesh vs geom type {g.gtype}")

    for pair in model.contact_pairs:
        g1 = model.geoms[pair.geom1]
        g2 = model.geoms[pair.geom2]
        if g2.gtype == GEOM_MESH and g1.gtype != GEOM_PLANE:
            # geom-vs-mesh narrowphase, BOTH directions (either or both
            # bodies may be dynamic — rows carry a (body, other-body)
            # relative jacobian, so two-dynamic pairs apply equal-and-
            # opposite wrenches automatically):
            #   1. mesh(g2) vertices ranked by g1's SDF (primitive SDF,
            #      or g1's convex-hull SDF when g1 is itself a mesh) —
            #      exact when the deepest feature is a mesh vertex;
            #   2. g1's support points (sphere center / capsule endpoints /
            #      box corners / mesh vertices) ranked by g2's convex-hull
            #      SDF — resolves a primitive or mesh face pressing into a
            #      large flat facet of g2, the regime direction 1 misses.
            # Edge/corner regimes resolve with face-plane normals and the
            # hull SDF underestimates OUTSIDE distance near edges — both
            # documented approximations (activation only needs phi<margin).
            if g1.bodyid == 0 and g2.bodyid == 0:
                continue  # both static: no dynamics to resolve
            mu_m = pair.mu if pair.condim > 1 else 0.0
            fri5_m = (pair.friction5 if pair.friction5 is not None
                      else np.array([pair.mu, pair.mu, 0.005, 1e-4, 1e-4]))
            p_pos, p_R = _geom_world(model, state, pair.geom1, dtype)
            g_pos, g_R = _geom_world(model, state, pair.geom2, dtype)

            def add_mesh_rows(query_pts, radius, phi_all, grad_all,
                              bid, other):
                """Emit top-K deepest rows. `grad_all` points into the row
                body `bid`; contact position midway between surfaces.

                Near-coincident deepest points are deduplicated (ADVICE r4):
                STL meshes routinely store each vertex once per facet, so
                the raw top-k can spend every slot on copies of one point,
                leaving wide patches torque-under-constrained. Candidates
                = top 2k by depth; a candidate within `tol` of any deeper
                candidate is demoted behind all distinct ones, and if it
                is still selected (fewer than k distinct points exist) its
                row is deactivated via phi >> margin."""
                kk = min(4, int(query_pts.shape[0]))
                ncand = min(2 * kk, int(query_pts.shape[0]))
                tol2 = jnp.asarray(1e-6**2, dtype)   # coincident @ 1 um
                _, cidx = jax.lax.top_k(-phi_all, ncand)
                cand = query_pts[cidx]                         # (C, 3)
                d2 = jnp.sum((cand[:, None, :] - cand[None, :, :]) ** 2,
                             axis=-1)
                earlier = jnp.tril(jnp.ones((ncand, ncand), bool), k=-1)
                dup = jnp.any((d2 < tol2) & earlier, axis=1)   # (C,)
                big = jnp.asarray(1e9, dtype)
                rank_phi = phi_all[cidx] + dup * big
                _, order = jax.lax.top_k(-rank_phi, kk)
                idx = cidx[order]
                phi_sel = jnp.where(dup[order], big, phi_all[idx])
                for r_i in range(kk):
                    qp = query_pts[idx[r_i]]
                    phi_v = phi_sel[r_i] - radius
                    n_v = grad_all[idx[r_i]]
                    body_ids.append(bid)
                    other_ids.append(other)
                    points.append(qp - n_v * (radius + 0.5 * phi_v))
                    phis.append(phi_v)
                    normals.append(n_v)
                    tangents.append(_make_frame_tangent(n_v))
                    mus.append(mu_m)
                    solrefs.append(pair.solref)
                    solimps.append(pair.solimp)
                    meffs.append(pair.m_eff)
                    invws.append(pair.invw0)
                    margins.append(pair.margin)
                    condims.append(pair.condim)
                    fri5s.append(fri5_m)

            # direction 1: mesh(g2) vertices vs g1's SDF
            verts2 = jnp.asarray(g2.mesh_verts, dtype)         # (V, 3)
            world2 = g_pos[None, :] + verts2 @ g_R.T           # (V, 3)
            phi_all, grad_all = _prim_sdf(g1, p_pos, p_R, world2)
            add_mesh_rows(world2, 0.0, phi_all, grad_all,
                          g2.bodyid, g1.bodyid)

            # direction 2: g1's support points vs g2's hull SDF
            if g1.gtype == GEOM_MESH:
                verts1 = jnp.asarray(g1.mesh_verts, dtype)
                pts, rad = p_pos[None, :] + verts1 @ p_R.T, 0.0
            elif g1.gtype == GEOM_SPHERE:
                pts, rad = p_pos[None, :], float(g1.size[0])
            elif g1.gtype == GEOM_CAPSULE:
                hl = (max(float(g1.size[1]) - float(g1.size[0]), 0.0)
                      if g1.gtype_orig == 5 else float(g1.size[1]))
                axis = p_R[:, 2]
                pts = jnp.stack([p_pos - hl * axis, p_pos + hl * axis])
                rad = float(g1.size[0])
            else:  # GEOM_BOX: 8 corners
                s1 = jnp.asarray(g1.size[:3], dtype)
                corners = jnp.asarray(
                    np.array([[sx, sy, sz] for sx in (-1.0, 1.0)
                              for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]),
                    dtype) * s1[None, :]
                pts, rad = p_pos[None, :] + corners @ p_R.T, 0.0
            phi_h, grad_h = _hull_sdf(g2, g_pos, g_R, pts)
            add_mesh_rows(pts, rad, phi_h, grad_h, g1.bodyid, g2.bodyid)
            continue
        if g1.gtype != GEOM_PLANE:
            continue  # non-plane primitive pairs live in _self_rows
        mu = pair.mu if pair.condim > 1 else 0.0

        p_pos, p_R = _geom_world(model, state, pair.geom1, dtype)
        n = p_R[:, 2]
        g_pos, g_R = _geom_world(model, state, pair.geom2, dtype)
        b = g2.bodyid
        size = jnp.asarray(g2.size, dtype)

        def add(point, phi, t1):
            body_ids.append(b)
            other_ids.append(g1.bodyid)   # plane body (world-static)
            points.append(point)
            phis.append(phi)
            normals.append(n)
            tangents.append(t1)
            mus.append(mu)
            solrefs.append(pair.solref)
            solimps.append(pair.solimp)
            meffs.append(pair.m_eff)
            invws.append(pair.invw0)
            margins.append(pair.margin)
            condims.append(pair.condim)
            fri5s.append(pair.friction5 if pair.friction5 is not None
                         else np.array([pair.mu, pair.mu, 0.005, 1e-4, 1e-4]))

        # contact position convention: MuJoCo puts contact.pos MIDWAY
        # between the surfaces (pos = surface_point - n*dist/2) — the
        # jacobian lever arm and row velocities are measured there, which
        # shifts aref by ~1% per cm of penetration (frame-200 probe,
        # scripts/dev_go1_probe.py)
        if g2.gtype == GEOM_SPHERE:
            r = size[0]
            phi_s = jnp.dot(n, g_pos - p_pos) - r
            add(g_pos - n * (r + 0.5 * phi_s), phi_s,
                _make_frame_tangent(n))
        elif g2.gtype == GEOM_CAPSULE and g2.gtype_orig == 5:
            # EXACT cylinder-vs-plane (round-5; previously the inscribed-
            # capsule approximation rounded off the end-cap rim): per cap,
            # three rim points — the rim extreme in the most-downhill cap
            # direction plus two at +-120 degrees. Tilted: the downhill rim
            # point is the true deepest feature. Lying: both caps' downhill
            # points form the side line contact. Standing: the +-120 tripod
            # spans the flat face (any support set spanning the face gives
            # the same rest height). Near-standing the downhill direction
            # is regularized toward the cylinder's own x-axis (continuous,
            # body-fixed).
            r, hl = size[0], size[1]
            axis = g_R[:, 2]
            d = -(n - jnp.dot(axis, n) * axis)       # -n projected to cap
            dn = jnp.linalg.norm(d)
            dhat = jnp.where(dn > 1e-6, d / jnp.maximum(dn, 1e-30),
                             g_R[:, 0])
            dhat = dhat / jnp.linalg.norm(dhat)
            perp = jnp.cross(axis, dhat)
            t1_cyl = _make_frame_tangent(n)
            for sgn in (-1.0, 1.0):
                c_end = g_pos + sgn * hl * axis
                for ca, sa in ((1.0, 0.0), (-0.5, 0.8660254037844386),
                               (-0.5, -0.8660254037844386)):
                    p_rim = c_end + r * (ca * dhat + sa * perp)
                    phi_c = jnp.dot(n, p_rim - p_pos)
                    add(p_rim - n * (0.5 * phi_c), phi_c, t1_cyl)
        elif g2.gtype == GEOM_CAPSULE:
            r, hl = size[0], size[1]
            axis = g_R[:, 2]
            # MuJoCo plane-capsule frame: t1 = capsule axis projected onto
            # the plane (falls back to makeFrame when the capsule stands
            # perpendicular)
            proj = axis - jnp.dot(axis, n) * n
            pn = jnp.linalg.norm(proj)
            t1_cap = jnp.where(pn > 1e-8, proj / jnp.maximum(pn, 1e-30),
                               _make_frame_tangent(n))
            for sgn in (-1.0, 1.0):
                c_end = g_pos + sgn * hl * axis
                phi_c = jnp.dot(n, c_end - p_pos) - r
                add(c_end - n * (r + 0.5 * phi_c), phi_c, t1_cap)
        elif g2.gtype == GEOM_BOX:
            t1_box = _make_frame_tangent(n)
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    for sz in (-1.0, 1.0):
                        corner = g_pos + g_R @ (size * jnp.asarray([sx, sy, sz], dtype))
                        phi_b = jnp.dot(n, corner - p_pos)
                        add(corner - n * (0.5 * phi_b), phi_b, t1_box)
        elif g2.gtype == GEOM_MESH:
            # plane-vs-mesh: rank the geom-frame vertices by plane distance
            # and take the 4 deepest (MuJoCo's plane-convex narrowphase
            # also returns up to 4 support points); row count stays static
            t1_mesh = _make_frame_tangent(n)
            verts = jnp.asarray(g2.mesh_verts, dtype)          # (V, 3)
            world = g_pos[None, :] + verts @ g_R.T             # (V, 3)
            phi_all = world @ n - jnp.dot(n, p_pos)            # (V,)
            kk = min(4, int(verts.shape[0]))
            _, idx = jax.lax.top_k(-phi_all, kk)
            for r_i in range(kk):
                vtx = world[idx[r_i]]
                phi_v = phi_all[idx[r_i]]
                add(vtx - n * (0.5 * phi_v), phi_v, t1_mesh)
        else:  # pragma: no cover
            raise NotImplementedError(f"plane vs geom type {g2.gtype}")

    self_rows = _self_rows(model, state, S, dtype, SELF_TOPK)
    if not points and self_rows is None:
        return None

    plane = None
    if points:
        bid = np.asarray(body_ids)                        # (P,) static
        p = jnp.stack(points)                             # (P, 3)
        phi = jnp.stack(phis)                             # (P,)
        n = jnp.stack(normals)                            # (P, 3)

        t1 = jnp.stack(tangents)                          # (P, 3)
        t2 = jnp.cross(n, t1)                             # (P, 3)

        # relative point velocity: v(bid) - v(other) at the contact point
        # (other=world for plane rows -> body_vel[0]=0, the original form)
        oid = np.asarray(other_ids)                       # (P,) static
        V = state.body_vel[jnp.asarray(bid)]              # (P, 6)
        Vo = state.body_vel[jnp.asarray(oid)]             # (P, 6)
        v_pt = (V[:, 3:] + jnp.cross(V[:, :3], p)
                - Vo[:, 3:] - jnp.cross(Vo[:, :3], p))    # (P, 3)
        vn = jnp.sum(n * v_pt, axis=-1)                   # (P,)
        vt = v_pt - vn[:, None] * n
        vt1 = jnp.sum(t1 * v_pt, axis=-1)
        vt2 = jnp.sum(t2 * v_pt, axis=-1)

        marg = jnp.asarray(np.asarray(margins), dtype)     # (P,) static
        pen = jnp.maximum(marg - phi, 0.0)
        active = (phi < marg).astype(dtype)

        # point jacobians: J_p (P, nv, 3), J[:, d] = A[b,d] * (S_lin[d] +
        # S_ang[d] x p); JpN/Jt1/Jt2 (P, nv) the contact-frame rows.
        # RELATIVE mask (bid minus other) so two-dynamic-body mesh rows
        # apply equal-and-opposite wrenches; other=world keeps plane rows
        # bit-identical (ancestor_mask[0] = 0)
        Am = jnp.asarray(model.ancestor_mask, dtype)
        A = Am[jnp.asarray(bid)] - Am[jnp.asarray(oid)]    # (P, nv)
        S_ang, S_lin = S[:, :3], S[:, 3:]                  # (nv, 3)
        cross_Sp = jnp.cross(S_ang[None, :, :], p[:, None, :])   # (P, nv, 3)
        Jp = (S_lin[None] + cross_Sp) * A[:, :, None]      # (P, nv, 3)
        JpN = jnp.sum(Jp * n[:, None, :], axis=-1)         # (P, nv)
        Jt1 = jnp.sum(Jp * t1[:, None, :], axis=-1)        # (P, nv)
        Jt2 = jnp.sum(Jp * t2[:, None, :], axis=-1)        # (P, nv)
        # angular (torsional/rolling) jacobian rows for condim>=4 pairs
        Jw = S_ang[None] * A[:, :, None]                   # (P, nv, 3)
        JwN = jnp.sum(Jw * n[:, None, :], axis=-1)
        Jwt1 = jnp.sum(Jw * t1[:, None, :], axis=-1)
        Jwt2 = jnp.sum(Jw * t2[:, None, :], axis=-1)

        k_base, b_ref = solref_kb(solrefs, solimps)        # static (P,)
        d_r = impedance(pen, solimps).astype(dtype)
        meff = jnp.asarray(np.asarray(meffs), dtype)
        c_n = meff * d_r * jnp.asarray(b_ref, dtype)       # (P,) normal damping
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + _VT_EPS * _VT_EPS)

        plane = dict(pen=pen, active=active, n=n, vn=vn, vt=vt, vt1=vt1,
                     vt2=vt2, vt_norm=vt_norm, Jp=Jp, JpN=JpN, Jt1=Jt1,
                     Jt2=Jt2, JwN=JwN, Jwt1=Jwt1, Jwt2=Jwt2,
                     d_r=d_r, c_n=c_n,
                     mu=jnp.asarray(np.asarray(mus), dtype),
                     k_base=jnp.asarray(k_base, dtype),
                     b_ref=jnp.asarray(b_ref, dtype), meff=meff,
                     invw=jnp.asarray(np.asarray(invws), dtype),
                     fri5=jnp.asarray(np.stack(fri5s), dtype))

    # merge plane + self blocks; plane rows first so their static metadata
    # (mu_plane_static / condim_plane: the row-class split indices used by
    # the coupled solvers) indexes the prefix, the K self rows occupy the
    # static suffix positions with data-dependent contents
    self_condim_max = 1
    if self_rows is not None:
        self_condim_max = self_rows.pop("condim_max")
    if plane is None:
        rows = {k: v for k, v in self_rows.items()}
        rows["n_plane"] = 0
        rows["mu_plane_static"] = np.zeros(0)
        rows["condim_plane"] = np.zeros(0, dtype=np.int64)
        rows["n_self"] = self_rows["pen"].shape[0]
        rows["condim_self_max"] = self_condim_max
        return rows
    if self_rows is None:
        plane["n_plane"] = plane["pen"].shape[0]
        plane["mu_plane_static"] = np.asarray(mus)
        plane["condim_plane"] = np.asarray(condims, dtype=np.int64)
        plane["n_self"] = 0
        plane["condim_self_max"] = 1
        return plane
    merged = {
        k: jnp.concatenate([plane[k], self_rows[k]], axis=0)
        for k in plane
    }
    merged["n_plane"] = plane["pen"].shape[0]
    merged["mu_plane_static"] = np.asarray(mus)
    merged["condim_plane"] = np.asarray(condims, dtype=np.int64)
    merged["n_self"] = self_rows["pen"].shape[0]
    merged["condim_self_max"] = self_condim_max
    return merged


def contact_force_terms(model: PhysicsModel, rows, fn: jax.Array,
                        dtype) -> Tuple[jax.Array, jax.Array]:
    """Given solved normal forces fn (P,), produce the generalized contact
    force tau = sum_p J_p^T f_p (normal + regularized Coulomb friction; J is
    the RELATIVE point jacobian so body-body rows apply equal-and-opposite
    wrenches automatically) and the implicit damping matrix G = J^T C J
    (see module docstring)."""
    mu = jnp.asarray(rows["mu"], dtype)
    c_t = mu * fn / rows["vt_norm"]                   # Coulomb slope (P,)
    ft = -c_t[:, None] * rows["vt"]

    f = fn[:, None] * rows["n"] + ft                  # (P, 3) world force
    tau = jnp.einsum("pni,pi->n", rows["Jp"], f)      # (nv,)

    cn_eff = rows["c_n"] * rows["active"]
    ct_eff = c_t * rows["active"]
    JpN, Jp = rows["JpN"], rows["Jp"]
    # J^T C J = (c_n - c_t) (Jn)(Jn)^T + c_t J J^T
    G = jnp.einsum("p,pn,pm->nm", cn_eff - ct_eff, JpN, JpN)
    G = G + jnp.einsum("p,pni,pmi->nm", ct_eff, Jp, Jp)
    return tau, G


def contact_terms(model: PhysicsModel, state, S: jax.Array,
                  qacc0=None, r_form: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Decoupled per-point contact forces + implicit damping matrix (used by
    inverse dynamics and as the "penalty" solver tier; the forward coupled
    tier uses engine._coupled_constraint_terms):

        fn = max(gain (d(r) k_base pen - b vn - a_n), 0)

    with gain = d(r) m_eff and a_n the unconstrained a0 (forward reading of
    MuJoCo's f = (aref - a0)/(A + R)), or — r_form=True, the mj_inverse
    analog — gain = d/(1-d) m_eff and a_n the REALIZED acceleration J qacc,
    which determines the force uniquely given the motion."""
    dtype = state.qpos.dtype
    rows = collect_contact_rows(model, state, S)
    if rows is None:
        return (
            jnp.zeros(model.nv, dtype),
            jnp.zeros((model.nv, model.nv), dtype),
        )
    a0_n = rows["JpN"] @ qacc0 if qacc0 is not None else 0.0   # (P,)
    d_r, meff = rows["d_r"], rows["meff"]
    gain = meff * d_r
    if r_form:
        gain = gain / jnp.maximum(1.0 - d_r, 1e-6)
    fn = jnp.maximum(
        gain * (d_r * jnp.asarray(rows["k_base"], dtype) * rows["pen"]
                - jnp.asarray(rows["b_ref"], dtype) * rows["vn"] - a0_n), 0.0
    ) * rows["active"]
    if not r_form:
        # restitution cap (see RESTITUTION_VCAP): impulse fn*h changes the
        # point's normal velocity by fn*h/meff in the decoupled reading —
        # bound it so post-step separation never exceeds the cap. The
        # inverse (r_form) reading reconstructs forces from realized motion
        # and must stay the exact algebraic inverse, so no cap there.
        h = float(model.timestep)
        fn = jnp.minimum(
            fn, meff * jnp.maximum(RESTITUTION_VCAP - rows["vn"], 0.0) / h)
    return contact_force_terms(model, rows, fn, dtype)
