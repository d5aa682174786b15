"""Cartpole swing-up cost (reference src/cartpole_mppi.py:44-53).

running = 1*x^2 + 20*(cos(theta)-1)^2 + 0.1*xdot^2 + 0.1*thetadot^2 + 0.01*u^2
terminal = 10 * running(u=0)
"""

from __future__ import annotations

import jax.numpy as jnp


def running_from_values(x_pos, theta, x_vel, theta_vel, u):
    return (
        1.0 * x_pos**2
        + 20.0 * (jnp.cos(theta) - 1.0) ** 2
        + 0.1 * x_vel**2
        + 0.1 * theta_vel**2
        + 0.01 * jnp.sum(u**2)
    )


def make_costs(model=None):
    """Costs over PhysicsState (qpos=[x, theta], qvel=[xdot, thetadot])."""

    def running(state, u, t):
        return running_from_values(
            state.qpos[0], state.qpos[1], state.qvel[0], state.qvel[1], u
        )

    def terminal(state, t):
        return 10.0 * running_from_values(
            state.qpos[0], state.qpos[1], state.qvel[0], state.qvel[1],
            jnp.zeros(1, state.qpos.dtype),
        )

    return running, terminal


def make_costs_flat(state_dim: int = 4):
    """Same costs over flat state vectors [x, theta, xdot, thetadot] — used by
    the learned-dynamics estimator path (reference src/cartpole_mppi_estimator.py:46-55)."""

    def running(x, u, t):
        return running_from_values(x[..., 0], x[..., 1], x[..., 2], x[..., 3], u)

    def terminal(x, t):
        return 10.0 * running_from_values(
            x[..., 0], x[..., 1], x[..., 2], x[..., 3], jnp.zeros(1, x.dtype)
        )

    return running, terminal
