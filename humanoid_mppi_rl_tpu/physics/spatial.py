"""Quaternion and 6D spatial-vector algebra for the JAX rigid-body engine.

Conventions
-----------
- Quaternions are (w, x, y, z), matching MuJoCo.
- Spatial (Plucker) vectors are 6D ``[angular(3); linear(3)]`` expressed in the
  *world frame with moment taken about the world origin* ("origin frame").
  A rigid body with angular velocity ``w`` whose body-fixed point at the world
  origin moves with velocity ``v0`` has spatial velocity ``[w; v0]``; the
  velocity of the body-fixed point at world position ``p`` is
  ``v(p) = v0 + w x p``.
- Spatial forces are ``[torque-about-origin(3); force(3)]``.

Everything is shape-polymorphic over leading batch dimensions and jit/vmap
friendly (pure jnp, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_mul(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product q*p."""
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (active rotation, world = R(q) @ body)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit quaternion for rotation of `angle` about unit `axis`."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_log(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Rotation vector (axis * angle, in [0, 2pi) folded to [-pi, pi]) of a
    unit quaternion — MuJoCo mju_quat2Vel semantics at dt=1: the 3D
    velocity that reproduces q in unit time, expressed in the local frame."""
    w = q[..., 0]
    im = q[..., 1:]
    sin_half = jnp.linalg.norm(im, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # fold to the short way around (MuJoCo normalizes the quat sign so that
    # the angle is in [-pi, pi]; arctan2 of a +w quat already is)
    angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    axis = im / jnp.maximum(sin_half, eps)[..., None]
    return axis * angle[..., None]


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """MuJoCo mju_subQuat: the 3D rotation vector (local frame) taking qb
    to qa — log(qb^-1 * qa)."""
    return quat_log(quat_mul(quat_conj(qb), qa))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) from quaternion."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_integrate(q: jax.Array, omega_local: jax.Array, h: jax.Array) -> jax.Array:
    """Integrate quaternion by local-frame angular velocity over time h.

    Matches MuJoCo's mju_quatIntegrate (exponential map): q' = q * exp(h*w/2),
    with the angular velocity expressed in the body-local frame (MuJoCo free
    joints store local angular velocity in qvel[3:6]).
    """
    # AD-safe at omega == 0: norm's gradient is 0/0 there, so use
    # sqrt(|w|^2 + tiny) and the even function sin(half)/angle (-> 0.5*h as
    # angle -> 0); required for exact jacfwd linearization about rest states
    # (solver/lqr.py)
    a2 = jnp.sum(omega_local * omega_local, axis=-1, keepdims=True)
    angle = jnp.sqrt(a2 + 1e-24)
    half = 0.5 * h * angle
    sinc = jnp.sin(half) / angle            # smooth, = 0.5*h at angle=0
    dq = jnp.concatenate([jnp.cos(half), omega_local * sinc], axis=-1)
    return quat_normalize(quat_mul(q, dq))


# ---------------------------------------------------------------------------
# 3D / spatial helpers
# ---------------------------------------------------------------------------

def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix: skew(v) @ u = v x u."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def motion_cross(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Spatial motion cross product v1 x v2 (both motion vectors [w; v])."""
    w1, l1 = v1[..., :3], v1[..., 3:]
    w2, l2 = v2[..., :3], v2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, l2) + jnp.cross(l1, w2)], axis=-1
    )


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f (motion v=[w;vl], force f=[n;fl])."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia_origin(
    mass: jax.Array, inertia_diag: jax.Array, com_world: jax.Array, rot_world: jax.Array
) -> jax.Array:
    """6x6 spatial inertia about the world origin.

    mass: (...,), inertia_diag: (..., 3) principal moments about the com,
    com_world: (..., 3), rot_world: (..., 3, 3) rotation of the principal
    (inertial) frame into world. Ordering [w; v0]:

        I^O = [[ I_c - m cx cx,  m cx ],
               [     -m cx,      m 1  ]]
    with cx = skew(com) and I_c = R diag(i) R^T.
    """
    R = rot_world
    Ic = jnp.einsum("...ij,...j,...kj->...ik", R, inertia_diag, R)
    cx = skew(com_world)
    m = mass[..., None, None]
    eye = jnp.eye(3, dtype=Ic.dtype)
    top_left = Ic - m * (cx @ cx)
    top_right = m * cx
    bot_left = -m * cx
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def force_at_point(force: jax.Array, point: jax.Array) -> jax.Array:
    """Spatial force [torque_about_origin; force] of a pure force applied at
    world point `point`."""
    return jnp.concatenate([jnp.cross(point, force), force], axis=-1)
