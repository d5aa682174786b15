"""Math primitives missing from the Pallas TPU lowering (atan2, asin).

Branchless polynomial implementations (the Pallas guide's rule: implement
what the lowering lacks). Accuracy ~1e-5 rad — far below any cost-shaping
noise floor for the orientation penalty terms these feed
(costs/humanoid.py roll/pitch/yaw)."""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.14159265358979
_HALF_PI = 1.5707963267948966


def _atan_poly(t):
    """atan on [0, 1] (minimax-style odd polynomial in t)."""
    s = t * t
    p = 0.0208351
    p = p * s - 0.0851330
    p = p * s + 0.1801410
    p = p * s - 0.3302995
    p = p * s + 0.9998660
    return p * t


def atan2(y, x, precise: bool = False):
    """Four-quadrant arctangent, branchless (jnp.where).

    precise=True adds one Newton step on tan(r)=t over the reduced range
    [0, pi/4] (sin/cos DO lower in Pallas), squaring the polynomial's
    ~1e-5 error to ~1e-10 — needed where atan2 feeds the physics
    (ball-joint quaternion springs/limits, scalar_physics.qlog), not just
    cost shaping."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    r = _atan_poly(t)
    if precise:
        s, c = jnp.sin(r), jnp.cos(r)
        r = r + (t * c - s) * c
    r = jnp.where(ay > ax, _HALF_PI - r, r)
    r = jnp.where(x < 0, _PI - r, r)
    return jnp.where(y < 0, -r, r)


def asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    return atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-30)))
