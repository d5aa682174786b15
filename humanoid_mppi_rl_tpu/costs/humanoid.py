"""Humanoid locomotion costs.

`make_costs` ports the v2/v3 collection cost (reference
src/Humanoid_datacollection_v2.jl:90-160, same cost as src/Humanoid_mppi_v3.jl)
term by term, with one documented semantic fix: the reference evaluates all
body-frame terms (xpos/cvel gait terms) on the *global* simulator state inside
rollout costs (SURVEY.md §3.1 fidelity caveat), so they were constant across
samples; here they are evaluated on the rollout's own state and actually
discriminate between samples. Weights and functional forms are identical.

`make_costs_v1` ports the time-phased-gait v1 cost
(reference src/Humanoid_mppi.jl:31-121).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .base import body_com_linvel, quat_rpy


def make_costs(model, target=(2.0, 0.0, 1.28), target_vel=(0.3, 0.0), **_unused):
    id_shin_l = model.body_id("shin_left")
    id_shin_r = model.body_id("shin_right")
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")

    tgt = jnp.asarray(target)
    tvel = jnp.asarray(target_vel)

    def running(state, u, t):
        qpos, qvel = state.qpos, state.qvel
        root = qpos[0:3]
        quat = qpos[3:7]
        vel_xy = qvel[0:2]

        roll, pitch, yaw = quat_rpy(quat)
        cost = 5.0 * (roll**2 + pitch**2) + 0.075 * yaw**2

        cost += 12.5 * jnp.linalg.norm(root[0:2] - tgt[0:2])
        cost += 5.0 * jnp.abs(tgt[2] - root[2])
        cost += 1.0 * jnp.linalg.norm(vel_xy - tvel)

        # gait phase from shin forward velocity comparison
        vx_l = body_com_linvel(state, model, id_shin_l)[0]
        vx_r = body_com_linvel(state, model, id_shin_r)[0]
        left_swings = vx_l > vx_r

        swing_id = jnp.where(left_swings, id_foot_l, id_foot_r)
        stance_id = jnp.where(left_swings, id_foot_r, id_foot_l)
        knee_id = jnp.where(left_swings, id_shin_l, id_shin_r)

        foot_targetx = root[0] + 0.5
        swing_foot = state.xpos[swing_id]
        stance_foot = state.xpos[stance_id]
        cost += 8.0 * jnp.abs(swing_foot[0] - foot_targetx)

        vx_swing = jnp.where(left_swings,
                             body_com_linvel(state, model, id_foot_l)[0],
                             body_com_linvel(state, model, id_foot_r)[0])
        cost += -0.15 * vx_swing

        swing_knee_x = state.xpos[knee_id][0]
        cost += 3.0 * (swing_knee_x - foot_targetx) ** 2

        clearance = swing_foot[2] - stance_foot[2]
        cost += jnp.where(clearance < 0.05, 2.0 * clearance**2, 0.0)

        leg_clearance = state.xpos[id_foot_l][1] - state.xpos[id_foot_r][1]
        cost += jnp.where(leg_clearance < 0.0, 0.5 * leg_clearance**2, 0.0)

        cost += 0.01 * jnp.sum(u**2)
        return cost

    def terminal(state, t):
        return 10.0 * running(state, jnp.zeros(model.nu, state.qpos.dtype), t)

    return running, terminal


def make_costs_hard_penalty(model, target=(2.0, 0.0, 1.28),
                            target_vel=(0.3, 0.0), **_unused):
    """Hard-penalty gait cost variant (reference
    src/Humanoid_datacollection.py:57-186, the live post-comment branch):
    same base terms as v2/v3 plus aggressive shaping — 1000x swing-foot
    forward-velocity reward, 10000x swing-foot-above-knee band penalty, and
    100x clearance/lateral-band penalties on feet and knees. Note the
    reference's height term here is LINEAR (5*(h_t - z), :77), not an
    absolute value, and the lateral bands use a [0.15, 0.21] dead-zone."""
    id_shin_l = model.body_id("shin_left")
    id_shin_r = model.body_id("shin_right")
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")
    tgt = jnp.asarray(target)
    tvel = jnp.asarray(target_vel)

    def running(state, u, t):
        qpos, qvel = state.qpos, state.qvel
        root = qpos[0:3]
        roll, pitch, yaw = quat_rpy(qpos[3:7])
        cost = 5.0 * (roll**2 + pitch**2) + 0.075 * yaw**2
        cost += 12.5 * jnp.linalg.norm(root[0:2] - tgt[0:2])
        cost += 5.0 * (tgt[2] - root[2])          # [sic] linear, not abs
        cost += 1.0 * jnp.linalg.norm(qvel[0:2] - tvel)

        vx_l = body_com_linvel(state, model, id_shin_l)[0]
        vx_r = body_com_linvel(state, model, id_shin_r)[0]
        left_swings = vx_l > vx_r
        swing_id = jnp.where(left_swings, id_foot_l, id_foot_r)
        stance_id = jnp.where(left_swings, id_foot_r, id_foot_l)
        knee_id = jnp.where(left_swings, id_shin_l, id_shin_r)

        foot_targetx = root[0] + 0.5
        swing_foot = state.xpos[swing_id]
        cost += 8.0 * jnp.abs(swing_foot[0] - foot_targetx)
        vx_swing = jnp.where(left_swings,
                             body_com_linvel(state, model, id_foot_l)[0],
                             body_com_linvel(state, model, id_foot_r)[0])
        cost += -1000.0 * vx_swing
        cost += 3.0 * (state.xpos[knee_id][0] - foot_targetx) ** 2

        swing_knee_z = state.xpos[knee_id][2]
        cost += jnp.where(swing_foot[2] >= swing_knee_z - 0.3,
                          10000.0 * (swing_foot[2] - swing_knee_z) ** 2, 0.0)
        clearance = swing_foot[2] - state.xpos[stance_id][2]
        cost += jnp.where(clearance < 0.005, 100.0 * clearance**2, 0.0)

        leg_cl = jnp.abs(state.xpos[id_foot_l][1] - state.xpos[id_foot_r][1])
        cost += jnp.where((leg_cl <= 0.15) | (leg_cl >= 0.21),
                          100.0 * leg_cl**2, 0.0)
        knee_cl = jnp.abs(state.xpos[id_shin_l][1] - state.xpos[id_shin_r][1])
        cost += jnp.where((knee_cl <= 0.15) | (knee_cl >= 0.21),
                          100.0 * knee_cl**2, 0.0)
        cost += 0.01 * jnp.sum(u**2)
        return cost

    def terminal(state, t):
        return 10.0 * running(state, jnp.zeros(model.nu, state.qpos.dtype), t)

    return running, terminal


def make_costs_v1(model, target=(2.0, 0.0), target_vel=0.5, step_period=100):
    """Time-phased gait cost (reference src/Humanoid_mppi.jl:31-121): a
    square-wave gait clock alternates swing/stance targets every
    `step_period` rollout steps."""
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")
    tgt = jnp.asarray(target)

    def running(state, u, t):
        qpos, qvel = state.qpos, state.qvel
        root = qpos[0:3]
        roll, pitch, yaw = quat_rpy(qpos[3:7])
        cost = 5.0 * (roll**2 + pitch**2) + 0.1 * yaw**2
        cost += 10.0 * jnp.linalg.norm(root[0:2] - tgt)
        cost += 5.0 * jnp.abs(1.28 - root[2])
        cost += 1.0 * jnp.abs(qvel[0] - target_vel)

        phase = (t // step_period) % 2
        left_swings = phase == 0
        swing = jnp.where(left_swings, id_foot_l, id_foot_r)
        stance = jnp.where(left_swings, id_foot_r, id_foot_l)
        clearance = state.xpos[swing][2] - state.xpos[stance][2]
        cost += jnp.where(clearance < 0.05, 5.0 * (0.05 - clearance) ** 2, 0.0)
        cost += 0.01 * jnp.sum(u**2)
        return cost

    def terminal(state, t):
        return 10.0 * running(state, jnp.zeros(model.nu, state.qpos.dtype), t)

    return running, terminal
