"""Smooth penalty contact model with implicit damping (floor contacts).

Replaces MuJoCo's constraint solver with compliant point contacts — the
standard trick for a vmappable, branch-free JAX step. Primitives vs a static
plane: sphere (1 point), capsule (2 endpoint spheres), box (8 corners).
Candidate pairs are precomputed statically (model.build_from_mjcf); every
point always contributes, gated to zero when separated.

Stability: stiff penalty springs on light bodies (a ~1 kg humanoid foot
supporting a 40 kg body) are explicitly unstable at dt=5 ms, so damping is
handled *implicitly*: each active contact point contributes

    force(v+) = k * pen * n - C v+ ,   C = c_n n n^T + c_t (1 - n n^T)

with c_t = mu * fn / sqrt(|vt|^2 + eps^2) (regularized Coulomb slope). The
engine folds h * J^T C J into the same (M + h D) factorization it already
does for MuJoCo-style implicit joint damping, which makes arbitrarily stiff
contact damping unconditionally stable, while the spring term stays explicit.

contact_terms() returns:
  F      (nbody, 6)  explicit spatial forces (spring + damping at current v)
  G      (nv, nv)    sum_p J_p^T C_p J_p  to be added as  M += h * G
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from . import spatial as sp
from .model import GEOM_BOX, GEOM_CAPSULE, GEOM_PLANE, GEOM_SPHERE, PhysicsModel

_VT_EPS = 5e-3  # m/s tangential regularization (implicit => can be small)


def _geom_world(model: PhysicsModel, state, gidx: int, dtype):
    g = model.geoms[gidx]
    b = g.bodyid
    R_b = sp.quat_to_mat(state.xquat[b])
    pos = state.xpos[b] + R_b @ jnp.asarray(g.pos, dtype)
    R = R_b @ sp.quat_to_mat(jnp.asarray(g.quat, dtype))
    return pos, R


def contact_terms(model: PhysicsModel, state, S: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Explicit contact forces per body + implicit damping matrix.

    All candidate points are stacked and processed in one batched computation
    (P points, typically 20-40 for the task robots).
    """
    dtype = state.qpos.dtype

    body_ids: List[int] = []
    points: List[jax.Array] = []
    phis: List[jax.Array] = []
    normals: List[jax.Array] = []
    mus: List[float] = []

    for pair in model.contact_pairs:
        g1 = model.geoms[pair.geom1]
        g2 = model.geoms[pair.geom2]
        if g1.gtype != GEOM_PLANE:
            continue  # only plane contacts in the round-1 pair set
        mu = pair.mu if pair.condim > 1 else 0.0

        p_pos, p_R = _geom_world(model, state, pair.geom1, dtype)
        n = p_R[:, 2]
        g_pos, g_R = _geom_world(model, state, pair.geom2, dtype)
        b = g2.bodyid
        size = jnp.asarray(g2.size, dtype)

        def add(point, phi):
            body_ids.append(b)
            points.append(point)
            phis.append(phi)
            normals.append(n)
            mus.append(mu)

        if g2.gtype == GEOM_SPHERE:
            r = size[0]
            add(g_pos - n * r, jnp.dot(n, g_pos - p_pos) - r)
        elif g2.gtype == GEOM_CAPSULE:
            r, hl = size[0], size[1]
            axis = g_R[:, 2]
            for sgn in (-1.0, 1.0):
                c_end = g_pos + sgn * hl * axis
                add(c_end - n * r, jnp.dot(n, c_end - p_pos) - r)
        elif g2.gtype == GEOM_BOX:
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    for sz in (-1.0, 1.0):
                        corner = g_pos + g_R @ (size * jnp.asarray([sx, sy, sz], dtype))
                        add(corner, jnp.dot(n, corner - p_pos))
        else:  # pragma: no cover
            raise NotImplementedError(f"plane vs geom type {g2.gtype}")

    if not points:
        return (
            jnp.zeros((model.nbody, 6), dtype),
            jnp.zeros((model.nv, model.nv), dtype),
        )

    bid = jnp.asarray(body_ids)                       # (P,)
    p = jnp.stack(points)                             # (P, 3)
    phi = jnp.stack(phis)                             # (P,)
    n = jnp.stack(normals)                            # (P, 3)
    mu = jnp.asarray(mus, dtype)                      # (P,)

    V = state.body_vel[bid]                           # (P, 6)
    v_pt = V[:, 3:] + jnp.cross(V[:, :3], p)          # (P, 3)
    vn = jnp.sum(n * v_pt, axis=-1)                   # (P,)
    vt = v_pt - vn[:, None] * n

    k = jnp.asarray(model.contact_stiffness, dtype)
    c_n = jnp.asarray(model.contact_damping, dtype)
    pen = jnp.maximum(-phi, 0.0)
    active = (phi < 0.0).astype(dtype)

    fn = jnp.maximum(k * pen - c_n * vn, 0.0) * active
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + _VT_EPS * _VT_EPS)
    c_t = mu * fn / vt_norm                            # Coulomb slope (P,)
    ft = -c_t[:, None] * vt

    f = fn[:, None] * n + ft                           # (P, 3)
    F_pts = sp.force_at_point(f, p)                    # (P, 6)
    F = jnp.zeros((model.nbody, 6), dtype).at[bid].add(F_pts)

    # --- implicit damping matrix ------------------------------------------
    # J_p (P, 3, nv): point velocity jacobian, J[:, :, d] = A[b,d] *
    # (S_lin[d] + S_ang[d] x p)
    A = jnp.asarray(model.ancestor_mask, dtype)[bid]   # (P, nv)
    S_ang, S_lin = S[:, :3], S[:, 3:]                  # (nv, 3)
    cross_Sp = jnp.cross(S_ang[None, :, :], p[:, None, :])   # (P, nv, 3)
    Jp = (S_lin[None] + cross_Sp) * A[:, :, None]      # (P, nv, 3)
    # C_p = c_n n n^T + c_t (1 - n n^T), both gated by `active`
    cn_eff = c_n * active
    ct_eff = c_t * active
    JpN = jnp.sum(Jp * n[:, None, :], axis=-1)         # (P, nv) normal rows
    # J^T C J = (c_n - c_t) (Jn)(Jn)^T + c_t J J^T
    G = jnp.einsum("p,pn,pm->nm", cn_eff - ct_eff, JpN, JpN)
    G = G + jnp.einsum("p,pni,pmi->nm", ct_eff, Jp, Jp)
    return F, G
