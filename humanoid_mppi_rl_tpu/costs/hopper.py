"""Planar hopper cost (new — the reference ships hopper.xml as a task asset
but no script uses it, SURVEY.md §2.3). Designed in the same style as the
reference costs: hop forward at a target speed, keep torso height and
orientation, regularize control."""

from __future__ import annotations

import jax.numpy as jnp


def make_costs(model, target_vel_x=1.0, target_height=1.0,
               w_pitch=4.0, w_pitch_rate=0.3, **_kernel_only):
    # _kernel_only: param_gait etc. — runtime-delta flags consumed by the
    # kernel twin (ops/kernel_costs.hopper); ignored by this jnp oracle
    def running(state, u, t):
        qpos, qvel = state.qpos, state.qvel
        # planar root: qpos = [rootx, rootz, rooty, waist, hip, knee, ankle]
        cost = 2.0 * (qvel[0] - target_vel_x) ** 2
        # keep the torso above ~0.7 m absolute (z = 1 + rootz offset)
        cost += 5.0 * jnp.maximum(target_height - 0.3 - qpos[1] - 1.0, 0.0) ** 2
        cost += w_pitch * qpos[2] ** 2        # torso pitch
        cost += w_pitch_rate * qvel[2] ** 2
        cost += 0.01 * jnp.sum(u**2)
        return cost

    def terminal(state, t):
        return 10.0 * running(state, jnp.zeros(model.nu, state.qpos.dtype), t)

    return running, terminal
