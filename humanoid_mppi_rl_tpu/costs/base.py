"""Shared cost helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_rpy(q: jax.Array):
    """Roll/pitch/yaw from a (w,x,y,z) quaternion (reference
    src/Humanoid_datacollection_v2.jl:95-101 formulas)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def body_com_linvel(state, model, bodyid: int) -> jax.Array:
    """World linear velocity of a body's com (mujoco cvel-linear analog used
    by the reference's get_body_vx, src/Humanoid_datacollection_v2.jl:84-87)."""
    from ..physics import spatial as sp

    R = sp.quat_to_mat(state.xquat[bodyid])
    xipos = state.xpos[bodyid] + R @ jnp.asarray(model.body_ipos[bodyid], state.qpos.dtype)
    V = state.body_vel[bodyid]
    return V[3:] + jnp.cross(V[:3], xipos)
