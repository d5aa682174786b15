"""Go1 quadruped goal-reaching trot cost.

`make_costs` ports reference src/quadruped_datacollection.py:57-138 verbatim —
including the reference's state indexing quirks (it indexes qpos[2],
qpos[5], ... as "calf joints" and qpos[6:9] as "orientation", which for a
free-joint model are actually root-z / quaternion components / the first leg
joints). Those indices are the reproduction contract: the published gaits and
logged datasets were produced under exactly this cost, so we keep them
bit-compatible rather than "fixing" them. The goal term and velocity terms
(correctly indexed in the reference) do the real work; MPPI is robust to the
rest acting as odd regularizers.

`make_costs_mppi_jl` ports the simpler cost of reference src/mppi.jl:18-62.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_costs(model, goal_xy=(2.0, 0.0), **_unused):
    goal = jnp.asarray(goal_xy)

    # weights: reference src/quadruped_datacollection.py:66-80
    w_pos, w_height, w_vel = 50000.0, 500.0, 30000.0
    w_ori, w_ang, w_ctrl = 500.0, 20.0, 0.01
    w_goal, w_trot = 3000.0, 34000.0
    w_front, w_back = 4400.0, 10000.0
    w_knee, w_posture = 2000.0, 5.0

    target_height = 0.4
    base_target_vel_x = 0.9
    osc_amp = 0.1
    neutral_knee = 0.5
    trot_period = 0.5

    def running(state, u, t):
        qpos, qvel = state.qpos, state.qvel
        time = state.time

        phase = (time % trot_period) / trot_period * 2 * jnp.pi
        trot_symmetry = jnp.sin(phase)
        target_vel_x = base_target_vel_x + osc_amp * jnp.sin(phase)

        current_pos = qpos[0:3]
        current_vel = qvel[0:3]
        current_ori = qpos[6:9]      # [sic] reference indexing
        current_ang = qvel[6:9]      # [sic]
        current_xy = qpos[0:2]

        FL_calf = qpos[2]            # [sic] reference leg-joint indexing
        FR_calf = qpos[5]
        RL_calf = qpos[8]
        RR_calf = qpos[11]

        height_cost = w_height * (current_pos[2] - target_height) ** 2
        vel_cost = w_vel * (current_vel[0] - target_vel_x) ** 2
        ori_cost = w_ori * (current_ori[0] ** 2 + current_ori[1] ** 2)
        ang_cost = w_ang * jnp.sum(current_ang**2)
        lateral_cost = w_pos * (current_pos[1] ** 2 + current_vel[1] ** 2)
        ctrl_cost = w_ctrl * jnp.sum(u**2)
        goal_cost = w_goal * jnp.sum((current_xy - goal) ** 2)

        FL_RR_phase = (FL_calf - RR_calf) * trot_symmetry
        FR_RL_phase = (FR_calf - RL_calf) * -trot_symmetry
        trot_phase_cost = w_trot * (FL_RR_phase**2 + FR_RL_phase**2)

        front_hip_cost = -w_front * (u[1] ** 2 + u[4] ** 2)
        front_leg_cost = w_front * (u[2] ** 2 + u[5] ** 2)
        back_hip_cost = -w_back * (u[7] ** 2 + u[10] ** 2)
        back_leg_cost = w_back * (u[8] ** 2 + u[11] ** 2)

        knee_cost = w_knee * (
            (FL_calf - neutral_knee) ** 2
            + (FR_calf - neutral_knee) ** 2
            + (RL_calf - neutral_knee) ** 2
            + (RR_calf - neutral_knee) ** 2
        )
        posture_cost = w_posture * jnp.sum(qpos[0:12] ** 2)

        return (
            height_cost + vel_cost + ori_cost + ang_cost
            + lateral_cost + ctrl_cost + goal_cost
            + trot_phase_cost + front_leg_cost + back_leg_cost
            + knee_cost + posture_cost + front_hip_cost + back_hip_cost
        )

    def terminal(state, t):
        return jnp.asarray(0.0, state.qpos.dtype)  # reference adds none

    return running, terminal


# Sweep-selected runtime gait-shaping deltas (ops.kernel_costs.quadruped
# param_gait slots 4..12) for the kernel planner tier: w_height 500 -> 10k,
# home-posture shaping 3k on the TRUE leg joints, sigma x0.6. The reference
# cost verbatim (all-zero deltas) belly-crawls against the penalty planner
# model at large K — the optimizer exploits planner-model error with crawl
# lunges MuJoCo C never rewarded; shrinking exploration noise and anchoring
# height/posture restores a reference-grade trot (0.44 m/s, z 0.27-0.34 vs
# the reference's committed 0.39-0.62 m/s, z 0.21-0.45 — quad_data_goal).
# Sweep evidence: scripts/dev_quad_gait.py, round-4.
GAIT_TUNED = (0.0, 0.0,            # d_target_vel_x, d_target_height
              3.0, 0.0, 0.0, 0.0,  # ln(w_h/500)=ln 20, w_v, w_tr, w_g logs
              3000.0,              # home-posture weight (true 12 joints)
              -0.5108256237659907,  # ln 0.6: sigma scale
              0.0)                 # temperature scale


def make_costs_mppi_jl(model, target_vel_x=0.5):
    """Simpler Go1 cost (reference src/mppi.jl:18-62): track forward velocity,
    stay upright (roll/pitch from quaternion), regularize joints and ctrl."""
    from .base import quat_rpy

    def running(state, u, t):
        qpos, qvel = state.qpos, state.qvel
        cost = 1.0 * (qvel[0] - target_vel_x) ** 2
        cost += 2.0 * qvel[1] ** 2
        roll, pitch, _ = quat_rpy(qpos[3:7])
        cost += 2.0 * (roll**2 + pitch**2)
        cost += 0.1 * jnp.sum(qvel[6:] ** 2)
        cost += 0.01 * jnp.sum(u**2)
        return cost

    def terminal(state, t):
        return jnp.asarray(0.0, state.qpos.dtype)

    return running, terminal
