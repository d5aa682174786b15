"""Reach cost for the arm5 generality robot (NEW task — no reference
analog; arm5 exists to exercise engine features the four task robots never
touch: ball joints/springs/limits, multi-dof motors, mesh collision — see
assets/arm5.xml). Drive the hand body to a world target point, regularize
arm joint velocity and control.

running = w_reach*|hand - target|^2 + w_vel*|qvel_arm|^2 + w_ctrl*|u|^2
terminal = 10 * reach term
"""

from __future__ import annotations

import jax.numpy as jnp

TARGET = (0.35, 0.15, 0.55)
N_ARM_DOFS = 7  # shoulder ball (3) + elbow (1) + wrist ball (3)


def make_costs(model, target=TARGET, w_reach=10.0, w_vel=0.05, w_ctrl=0.01):
    hand = model.body_names.index("hand")
    tgt = jnp.asarray(target)

    def running(state, u, t):
        d = state.xpos[hand] - tgt
        return (w_reach * jnp.sum(d * d)
                + w_vel * jnp.sum(state.qvel[:N_ARM_DOFS] ** 2)
                + w_ctrl * jnp.sum(u ** 2))

    def terminal(state, t):
        d = state.xpos[hand] - tgt
        return 10.0 * w_reach * jnp.sum(d * d)

    return running, terminal
