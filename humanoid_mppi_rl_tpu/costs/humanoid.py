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
from flax import struct

from .base import body_com_linvel, quat_rpy


# Weight presets for make_costs / ops.kernel_costs.humanoid. Defaults are the
# reference v3 weights (src/Humanoid_mppi_v3.jl); "walk" is NEW — found by a
# runtime-params sweep on TPU (scripts/dev_gait_sweep.py): the per-sample
# velocity-gait terms are disabled (in the reference they were sample-constant
# and never actually optimized, SURVEY.md §3.1) and posture dominates the
# goal-distance drive. Sampling noise sigma = 0.5*exp(-0.35) ~= 0.352 is part
# of the preset (see the humanoid_walk task; sigma=0.5 falls within 1.5 s).
# Measured at K=8192, H=64 on one v5e chip (committed evidence:
# artifacts/walk_seeds/{seed0..5}.npz + summary.json, re-scored by
# tests/test_walk_seeds.py): with the restitution cap and the baked
# combo_slowgoal weights, 6/6 seeds complete the full 3 s run upright at
# 0.29-0.47 m/s with 0.85-1.42 m forward progress. The reference v3
# weights fell by ~1.35 s on every setting of the sweep.
WEIGHTS_V3 = dict(w_orient=5.0, w_goal_xy=12.5, w_height=5.0,
                  w_swing_x=8.0, w_swing_vel=0.15, w_knee_x=3.0,
                  w_clearance=2.0)
WEIGHTS_WALK = dict(w_orient=15.0, w_goal_xy=2.5, w_height=20.0,
                    w_swing_x=0.0, w_swing_vel=0.0, w_knee_x=0.0,
                    w_clearance=0.0)


def make_costs(model, target=(2.0, 0.0, 1.28), target_vel=(0.3, 0.0),
               w_orient=5.0, w_goal_xy=12.5, w_height=5.0, w_swing_x=8.0,
               w_swing_vel=0.15, w_knee_x=3.0, w_clearance=2.0,
               w_foot_lift=0.0, **_unused):
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
        cost = w_orient * (roll**2 + pitch**2) + 0.075 * yaw**2

        cost += w_goal_xy * jnp.linalg.norm(root[0:2] - tgt[0:2])
        cost += w_height * jnp.abs(tgt[2] - root[2])
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
        cost += w_swing_x * jnp.abs(swing_foot[0] - foot_targetx)

        vx_swing = jnp.where(left_swings,
                             body_com_linvel(state, model, id_foot_l)[0],
                             body_com_linvel(state, model, id_foot_r)[0])
        cost += -w_swing_vel * vx_swing

        swing_knee_x = state.xpos[knee_id][0]
        cost += w_knee_x * (swing_knee_x - foot_targetx) ** 2

        clearance = swing_foot[2] - stance_foot[2]
        cost += jnp.where(clearance < 0.05, w_clearance * clearance**2, 0.0)

        leg_clearance = state.xpos[id_foot_l][1] - state.xpos[id_foot_r][1]
        cost += jnp.where(leg_clearance < 0.0, 0.5 * leg_clearance**2, 0.0)

        # NEW (no reference analog, default weight 0): penalize foot lift
        # above a walking band — without it large-K MPPI kicks ~1 m high
        lift_l = jnp.maximum(state.xpos[id_foot_l][2] - 0.25, 0.0)
        lift_r = jnp.maximum(state.xpos[id_foot_r][2] - 0.25, 0.0)
        cost += w_foot_lift * (lift_l**2 + lift_r**2)

        cost += 0.01 * jnp.sum(u**2)
        return cost

    def terminal(state, t):
        return 10.0 * running(state, jnp.zeros(model.nu, state.qpos.dtype), t)

    return running, terminal


def make_costs_walk(model, target=(2.0, 0.0, 1.28), target_vel=(0.3, 0.0),
                    **kw):
    """The `humanoid_walk` preset (NEW, not in the reference): v3 functional
    form with WEIGHTS_WALK."""
    merged = dict(WEIGHTS_WALK)
    merged.update(kw)
    return make_costs(model, target=target, target_vel=target_vel, **merged)


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


# ---------------------------------------------------------------------------
# v2.py variant: finite-difference velocities + hysteresis gait phase
# (reference src/Humanoid_datacollection_v2.py)
# ---------------------------------------------------------------------------

@struct.dataclass
class GaitFDState:
    """Physics state augmented with the v2.py controller-threaded extras:

    - ``prev_qpos``: previous-step qpos, so costs/logging can use the
      finite-difference velocity estimate ``(qpos - prev_qpos)/dt`` the
      reference uses in place of qvel (src/Humanoid_datacollection_v2.py:68-83,
      :250-256 "joint-vel mask").
    - hysteresis gait phase (:45-55, :133-162): the instantaneously higher
      foot is the candidate swing side; only after ``PHASE_DELAY`` consecutive
      frames of agreement does the *committed* side switch. The reference
      keeps this in module globals mutated inside the cost (so it is
      sample-constant per replan, SURVEY.md §3.1 caveat); here it is explicit
      state threaded through the dynamics, updated once per step — rollout
      samples carry their own phase state and discriminate per sample.

    All extras are f32 scalars/vectors so the struct stays a uniform pytree.
    """

    phys: object            # PhysicsState
    prev_qpos: jax.Array    # (nq,)
    committed_left: jax.Array   # 1.0 = left swing committed
    last_left: jax.Array        # last instantaneous side
    count: jax.Array            # consecutive-agreement counter
    goal: jax.Array             # (3,) current target Position — mutated at
    # runtime by the goal-advance logic (reference :307-312), so it is state,
    # not a baked cost constant; rollout dynamics leaves it untouched

    # passthroughs so drivers treat this like a PhysicsState
    @property
    def qpos(self):
        return self.phys.qpos

    @property
    def qvel(self):
        return self.phys.qvel

    @property
    def time(self):
        return self.phys.time

    @property
    def xpos(self):
        return self.phys.xpos

    @property
    def xquat(self):
        return self.phys.xquat


def make_gait_fd_wrapper(model, phase_delay: int = 3,
                         target=(2.0, 0.0, 1.28)):
    """(base_dynamics, init_phys) -> (dynamics, init) over GaitFDState.

    The hysteresis update runs after every step (plant and rollout alike):
    inst = foot_left higher; count increments on agreement with the last
    frame else resets to 1; commit switches once count >= phase_delay
    (reference src/Humanoid_datacollection_v2.py:139-162).
    """
    id_fl = model.body_id("foot_left")
    id_fr = model.body_id("foot_right")

    def wrap(base_dynamics, init_phys):
        def dynamics(st: GaitFDState, ctrl, t):
            phys = base_dynamics(st.phys, ctrl, t)
            one = jnp.asarray(1.0, phys.qpos.dtype)
            inst_left = (phys.xpos[id_fl, 2] > phys.xpos[id_fr, 2]).astype(
                phys.qpos.dtype)
            same = inst_left == st.last_left
            count = jnp.where(same, st.count + one, one)
            committed = jnp.where(count >= phase_delay, inst_left,
                                  st.committed_left)
            return GaitFDState(phys=phys, prev_qpos=st.phys.qpos,
                               committed_left=committed, last_left=inst_left,
                               count=count, goal=st.goal)

        z = jnp.asarray(0.0, init_phys.qpos.dtype)
        init = GaitFDState(phys=init_phys, prev_qpos=init_phys.qpos,
                           committed_left=z + 1.0, last_left=z, count=z,
                           goal=jnp.asarray(target, init_phys.qpos.dtype))
        return dynamics, init

    return wrap


def advance_goal_v2py(st: GaitFDState, goal_step=(2.0, 0.0, 0.0),
                      threshold: float = 0.15) -> GaitFDState:
    """Reference goal-advance (:307-312): when the FULL 3D root-to-goal
    distance (z included — requires standing at target height) drops below
    the threshold, the target steps forward by ``goal_step``. Applied to the
    plant state once per control step by the collection driver."""
    root = st.phys.qpos[0:3]
    near = jnp.linalg.norm(root - st.goal) < threshold
    step = jnp.asarray(goal_step, st.goal.dtype)
    return st.replace(goal=jnp.where(near, st.goal + step, st.goal))


def make_costs_v2py(model, target=(2.0, 0.0, 1.28), target_vel=(0.3, 0.0),
                    **_unused):
    """Cost of reference src/Humanoid_datacollection_v2.py:86-216 (the live,
    post-comment branch), term by term on a GaitFDState.

    Ported quirks, kept verbatim and documented:
    - velocities are the FD estimate ``(qpos - prev_qpos)/dt`` (nq-sized, not
      qvel), zeroed on the first rollout frame (:250-256);
    - ``knee_vel = vel_q[swing_foot_BODY_id]`` — the reference passes a body
      id where a joint index is expected (:185), so an arbitrary qpos row's
      FD velocity is rewarded; we reproduce the indexing;
    - forward axis = torso rotation's first column, targets projected onto it
      (:167-194) rather than the world x used by v3;
    - height/goal weights differ from v3: 4/1/12/10 (:102-106).
    The gait side comes from the committed hysteresis state (see
    GaitFDState), not recomputed in the cost.
    """
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")
    id_shin_l = model.body_id("shin_left")
    id_shin_r = model.body_id("shin_right")
    id_torso = model.body_id("torso")
    del target  # the live goal rides in GaitFDState.goal (runtime-mutable)
    tvel = jnp.asarray(target_vel)
    inv_dt = 1.0 / model.timestep

    from ..physics import spatial as sp

    def _core(st: GaitFDState, vel_q, u):
        qpos = st.phys.qpos
        root = qpos[0:3]
        tgt = st.goal
        roll, pitch, yaw = quat_rpy(qpos[3:7])
        cost = 4.0 * (roll**2 + pitch**2) + 1.0 * yaw**2
        cost += 12.0 * jnp.linalg.norm(root[0:2] - tgt[0:2])
        cost += 10.0 * jnp.abs(tgt[2] - root[2])
        cost += 1.0 * jnp.linalg.norm(vel_q[0:2] - tvel)

        left = st.committed_left > 0.5
        swing_id = jnp.where(left, id_foot_l, id_foot_r)
        stance_id = jnp.where(left, id_foot_r, id_foot_l)
        knee_id = jnp.where(left, id_shin_l, id_shin_r)

        R = sp.quat_to_mat(st.phys.xquat[id_torso])
        fwd = R[:, 0]
        root_proj = jnp.dot(fwd, root)
        desired = root_proj + 0.5
        cost += 8.0 * jnp.abs(jnp.dot(fwd, st.phys.xpos[swing_id]) - desired)

        knee_vel = vel_q[swing_id]          # [sic] body id indexes vel_q
        cost += jnp.where(knee_vel > 0, -0.25 * knee_vel, 0.05 * (-knee_vel))

        cost += 4.0 * jnp.abs(jnp.dot(fwd, st.phys.xpos[knee_id]) - desired)
        cost += 0.005 * jnp.abs(st.phys.xpos[stance_id][2])

        leg_clearance = (st.phys.xpos[id_foot_l][1]
                         - st.phys.xpos[id_foot_r][1])
        cost += jnp.where(leg_clearance < 0.05, 1.0 * leg_clearance**2, 0.0)

        cost += 0.01 * jnp.sum(u**2)
        return cost

    def running(st: GaitFDState, u, t):
        vel_q = (st.phys.qpos - st.prev_qpos) * inv_dt
        vel_q = jnp.where(t == 0, jnp.zeros_like(vel_q), vel_q)
        return _core(st, vel_q, u)

    def terminal(st: GaitFDState, t):
        # reference terminal passes zero velocities (:215-216)
        return 10.0 * _core(st, jnp.zeros_like(st.phys.qpos),
                            jnp.zeros(model.nu, st.phys.qpos.dtype))

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
