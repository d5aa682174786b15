"""Estimator MPPI: closed-loop control with MPPI planning on a learned
surrogate while the physics engine plays the real plant.

Mirrors the reference estimator scripts (src/cartpole_mppi_estimator.py,
src/quadruped_mppi_estimator.py): K=2048 lockstep neural rollouts, lambda=10,
replace-mode control update (U := sum w*eps), MuJoCo used only as the
evaluation plant — here our JAX engine plays that role, so the whole loop
(plan on surrogate + step true plant) is one jitted device program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..costs import cartpole as cartpole_cost
from ..dynamics.learned import flat_state_from_physics, make_learned_dynamics
from ..physics import build_from_mjcf, forward, step
from ..solver.mppi import MPPIConfig, MPPIState, make_mppi
from .logging import TrajectoryLogger

ESTIMATOR_CONFIGS = {
    # reference src/cartpole_mppi_estimator.py:37-40
    "cartpole": MPPIConfig(n_samples=2048, horizon=100, temperature=10.0,
                           sigma=0.5, update_mode="replace", tail_decay=0.1),
    # reference src/quadruped_mppi_estimator.py:38-41
    "quadruped": MPPIConfig(n_samples=2048, horizon=50, temperature=10.0,
                            sigma=0.4, update_mode="replace", tail_decay=0.1),
    # humanoid surrogate (new — the reference trains the humanoid predictor,
    # learning/train.py:71-77, but never closes the loop on it; same
    # replace-mode MPPI pattern as its two estimator scripts)
    "humanoid": MPPIConfig(n_samples=2048, horizon=50, temperature=10.0,
                           sigma=0.4, update_mode="replace", tail_decay=0.1),
}


def humanoid_estimator_costs(goal_pos=(2.0, 0.0, 1.28), action_dim=21):
    """Goal-reaching cost over the humanoid surrogate's 30-dim state
    [qpos(28); foot_l_z; foot_r_z] (the training state_idxes,
    learning/train.py PRESET_CONFIGS['humanoid']). Same structure as
    quadruped_estimator_costs (reference src/quadruped_mppi_estimator.py:
    48-55): drive the root toward the goal, keep standing height,
    regularize control."""
    goal = jnp.asarray(goal_pos)

    def running(x, u, t):
        return (jnp.sum((x[..., :3] - goal) ** 2)
                + 0.1 * jnp.sum(u ** 2))

    def terminal(x, t):
        return 10.0 * jnp.sum((x[..., :3] - goal) ** 2)

    return running, terminal


def make_fd_time_augmented(base_dyn, nx: int, dt: float):
    """Wrap a flat-state surrogate dynamics with [x_t; x_{t-1}; t_abs]
    augmentation so estimator costs can finite-difference velocities and
    keep an absolute gait clock across receding-horizon replans — the same
    trick the reference's v2.py collector uses against the REAL plant
    (src/Humanoid_datacollection_v2.py:68-83 FD velocities; the surrogate
    state has no velocities at all, reference learning/train.py:36-45)."""

    def dyn(x_aug, u, t):
        x = x_aug[..., :nx]
        tau = x_aug[..., 2 * nx:]
        nxt = base_dyn(x, u, t)
        return jnp.concatenate([nxt, x, tau + dt], axis=-1)

    def augment_state(x, t_abs):
        return jnp.concatenate([x, x, jnp.reshape(t_abs, (1,))])

    return dyn, augment_state


def humanoid_gait_estimator_costs(goal_pos=(3.0, 0.0, 1.28), nx: int = 30,
                                  dt: float = 0.005,
                                  target_vel: float = 0.35,
                                  gait_period: float = 0.9,
                                  foot_lift: float = 0.10,
                                  w_vel=10.0, w_height=22.0, w_orient=17.0,
                                  w_goal=1.0, w_lat=2.0, w_gait=60.0,
                                  w_ctrl=0.1):
    """Gait-shaped cost over the FD/time-augmented humanoid surrogate state
    [qpos(28); foot_l_z; foot_r_z; prev...; t_abs].

    Round-3's estimator loop used a bare goal-distance cost and the
    surrogate-planned humanoid just stood (0.105 m/100 steps): on the TRUE
    dynamics the humanoid also only walks under gait-shaped costs
    (costs/humanoid.WEIGHTS_WALK), so the surrogate planner gets the same
    treatment — forward-velocity tracking from FD root x, a time-phased
    alternating foot-lift clock on the two predicted foot heights (v1 gait
    semantics, reference src/Humanoid_mppi.jl:76-98), orientation/height
    anchors from the predicted quaternion."""
    import math

    goal = jnp.asarray(goal_pos)
    om = 2.0 * math.pi / gait_period

    def running(x_aug, u, t):
        x = x_aug[..., :nx]
        xp = x_aug[..., nx:2 * nx]
        tau = x_aug[..., 2 * nx]
        vx = (x[..., 0] - xp[..., 0]) / dt
        vy = (x[..., 1] - xp[..., 1]) / dt
        qw, qx, qy, qz = x[..., 3], x[..., 4], x[..., 5], x[..., 6]
        roll = jnp.arctan2(2 * (qw * qx + qy * qz),
                           1 - 2 * (qx * qx + qy * qy))
        pitch = jnp.arcsin(jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
        fl, fr = x[..., 28], x[..., 29]
        s = jnp.sin(om * tau)
        tl = 0.07 + foot_lift * jnp.maximum(s, 0.0)
        tr = 0.07 + foot_lift * jnp.maximum(-s, 0.0)
        c = w_vel * (vx - target_vel) ** 2 + w_vel * vy ** 2
        c += w_height * (x[..., 2] - goal[2]) ** 2
        c += w_orient * (roll ** 2 + pitch ** 2)
        c += w_lat * x[..., 1] ** 2
        c += w_goal * jnp.sum((x[..., :2] - goal[:2]) ** 2, axis=-1)
        c += w_gait * ((fl - tl) ** 2 + (fr - tr) ** 2)
        c += w_ctrl * jnp.sum(u ** 2, axis=-1)
        return c

    def terminal(x_aug, t):
        x = x_aug[..., :nx]
        return 10.0 * (w_goal * jnp.sum((x[..., :2] - goal[:2]) ** 2, axis=-1)
                       + w_height * (x[..., 2] - goal[2]) ** 2)

    return running, terminal


def humanoid_fk_estimator_costs(model, dt: float = 0.005, nx: int = 30,
                                cost_kwargs: Optional[dict] = None):
    """Evaluate the PROVEN full-state walking cost on surrogate rollouts by
    reconstructing full kinematics from the predicted qpos via FK.

    Round-5 control experiment (scripts/dev_estimator_cost_truth.py): the
    position-only time-phased estimator cost CROUCHES even on TRUE dynamics
    (0.19 m / 240 steps, torso sinks to 0.61 m) at the estimator operating
    point, while the humanoid_walk task cost walks 0.38-0.60 m there — the
    cost, not the surrogate, was the round-4 blocker. The surrogate
    predicts qpos (+ foot heights); everything the walking cost reads
    (xpos of shins/feet, body velocities for the gait phase) is a pure
    function of qpos + FD(qpos): reconstruct qvel by finite differences
    (root linear from xyz, root angular from the local quaternion
    difference — the same FD trick the reference's v2.py collector applies
    to the REAL plant, src/Humanoid_datacollection_v2.py:68-83 — joint
    rates directly), run the engine's forward() kinematics (FK + body
    velocities, no dynamics), and apply costs/humanoid.make_costs with the
    humanoid_walk preset weights on the reconstructed PhysicsState.

    Operates on the [x; x_prev; t_abs] FD/time augmentation
    (make_fd_time_augmented with fd_time_augment=nx)."""
    from ..costs import humanoid as humc
    from ..physics import spatial as _sp
    from ..physics.engine import forward as _fk_forward

    kw = dict(humc.WEIGHTS_WALK, target=(10.0, 0.0, 1.28),
              w_height=22.0, w_orient=17.0, w_goal_xy=1.0,
              w_clearance=1.0, w_foot_lift=10.0,
              w_swing_vel=0.20, target_vel=(0.4, 0.0))
    kw.update(cost_kwargs or {})
    run_full, term_full = humc.make_costs(model, **kw)
    nv = model.nv

    def reconstruct(x_aug):
        q = x_aug[:28]
        prev = x_aug[nx:nx + 28]
        tau = x_aug[2 * nx]
        v_lin = (q[0:3] - prev[0:3]) / dt
        w_loc = _sp.quat_sub(q[3:7], prev[3:7]) / dt
        v_jnt = (q[7:28] - prev[7:28]) / dt
        qvel = jnp.concatenate([v_lin, w_loc, v_jnt])[:nv]
        return _fk_forward(model, q, qvel, time=tau)

    def _run1(x_aug, u, t):
        return run_full(reconstruct(x_aug), u, t)

    def _term1(x_aug, t):
        return term_full(reconstruct(x_aug), t)

    def running(x, u, t):
        if x.ndim == 2:       # batched rollouts (flash kernel path)
            return jax.vmap(lambda xa, ua: _run1(xa, ua, t))(x, u)
        return _run1(x, u, t)

    def terminal(x, t):
        if x.ndim == 2:
            return jax.vmap(lambda xa: _term1(xa, t))(x)
        return _term1(x, t)

    return running, terminal


def humanoid_predvel_estimator_costs(model, nx: int = 57,
                                     cost_kwargs: Optional[dict] = None):
    """The proven full-state walking cost over a VELOCITY-SUPERVISED
    surrogate state [qpos(28); qvel(27); foot_l_z; foot_r_z] — the round-5
    "named next training contract" (PERF.md): the surrogate predicts qvel
    alongside qpos, so the cost reads real velocities instead of
    finite-differencing compounding position error (the FD-SNR failure
    measured for both the humanoid FK loop and the Go1 loop).

    Identical cost to humanoid_fk_estimator_costs (costs/humanoid
    make_costs, humanoid_walk weights) but the PhysicsState is
    reconstructed from the PREDICTED qpos + PREDICTED qvel via the
    engine's forward() kinematics — no FD anywhere. Operates on the
    [x; x_prev; t_abs] augmentation only for the absolute gait clock
    (x_prev is unused)."""
    from ..costs import humanoid as humc
    from ..physics.engine import forward as _fk_forward

    kw = dict(humc.WEIGHTS_WALK, target=(10.0, 0.0, 1.28),
              w_height=22.0, w_orient=17.0, w_goal_xy=1.0,
              w_clearance=1.0, w_foot_lift=10.0,
              w_swing_vel=0.20, target_vel=(0.4, 0.0))
    kw.update(cost_kwargs or {})
    run_full, term_full = humc.make_costs(model, **kw)
    nv = model.nv

    def reconstruct(x_aug):
        q = x_aug[:28]
        qvel = x_aug[28:28 + nv]
        tau = x_aug[2 * nx]
        return _fk_forward(model, q, qvel, time=tau)

    def _run1(x_aug, u, t):
        return run_full(reconstruct(x_aug), u, t)

    def _term1(x_aug, t):
        return term_full(reconstruct(x_aug), t)

    def running(x, u, t):
        if x.ndim == 2:       # batched rollouts (flash kernel path)
            return jax.vmap(lambda xa, ua: _run1(xa, ua, t))(x, u)
        return _run1(x, u, t)

    def terminal(x, t):
        if x.ndim == 2:
            return jax.vmap(lambda xa: _term1(xa, t))(x)
        return _term1(x, t)

    return running, terminal


def quadruped_estimator_costs(goal_pos=(2.0, 0.0, 0.35), action_dim=12):
    """reference src/quadruped_mppi_estimator.py:48-55"""
    goal = jnp.asarray(goal_pos)

    def running(x, u, t):
        return jnp.sum((x[..., :3] - goal) ** 2) + 0.1 * jnp.sum(u**2)

    def terminal(x, t):
        return 10.0 * jnp.sum((x[..., :3] - goal) ** 2)

    return running, terminal


def quadruped_gait_estimator_costs(home12, goal_xy=(2.0, 0.0), nx: int = 37,
                                   target_vel: float = 0.45,
                                   w_home: float = 3000.0):
    """The trot cost that demonstrably works on the TRUE Go1 plant
    (costs/quadruped.make_costs + GAIT_TUNED shaping), evaluated on the
    surrogate's predicted [qpos(19); qvel(18)] state over the FD/time
    augmentation — the reference's estimator cost is bare goal distance
    (src/quadruped_mppi_estimator.py:48-55), under which the surrogate
    planner just stands. `home12` is the home-keyframe leg pose
    (model.keyframes['home'][7:19])."""
    import math

    gx, gy = float(goal_xy[0]), float(goal_xy[1])
    home = jnp.asarray(home12)

    def running(x_aug, u, t):
        x = x_aug[..., :nx]
        tau = x_aug[..., 2 * nx]
        q = x[..., :19]
        v = x[..., 19:37]
        phase = (tau % 0.5) / 0.5 * 2 * math.pi
        trot = jnp.sin(phase)
        tv = target_vel + 0.1 * jnp.sin(phase)
        c = 10000.0 * (q[..., 2] - 0.4) ** 2          # GAIT_TUNED w_height
        c += 30000.0 * (v[..., 0] - tv) ** 2
        c += 500.0 * (q[..., 6] ** 2 + q[..., 7] ** 2)   # [sic] reference idx
        c += 20.0 * jnp.sum(v[..., 6:9] ** 2, axis=-1)
        c += 50000.0 * (q[..., 1] ** 2 + v[..., 1] ** 2)
        c += 0.01 * jnp.sum(u ** 2, axis=-1)
        c += 3000.0 * ((q[..., 0] - gx) ** 2 + (q[..., 1] - gy) ** 2)
        f1 = (q[..., 2] - q[..., 11]) * trot          # [sic] reference idx
        f2 = (q[..., 5] - q[..., 8]) * (-trot)
        c += 34000.0 * (f1 * f1 + f2 * f2)
        c += w_home * jnp.sum((q[..., 7:19] - home) ** 2, axis=-1)
        nk = 0.5
        c += 2000.0 * ((q[..., 2] - nk) ** 2 + (q[..., 5] - nk) ** 2
                       + (q[..., 8] - nk) ** 2 + (q[..., 11] - nk) ** 2)
        c += 5.0 * jnp.sum(q[..., 0:12] ** 2, axis=-1)
        return c

    def terminal(x_aug, t):
        x = x_aug[..., :nx]
        return 10.0 * 3000.0 * ((x[..., 0] - gx) ** 2 + (x[..., 1] - gy) ** 2)

    return running, terminal


def quadruped_fd_gait_estimator_costs(home12, goal_xy=(2.0, 0.0),
                                      nx: int = 19, dt: float = 0.002,
                                      w_home: float = 3000.0):
    """The PROVEN collection trot cost over a POSITION-ONLY quad surrogate
    state [qpos(19)] with FD velocities from the [x; x_prev; t_abs]
    augmentation — the humanoid FK-cost recipe applied to the Go1.

    Term-for-term this is costs/quadruped.make_costs (the reference
    src/quadruped_datacollection.py:66-80 cost) PLUS the GAIT_TUNED
    runtime deltas that demonstrably trot on the true plant (w_height
    500 -> exp(3)*500, home-posture 3000 on the true 12 leg joints), with
    every velocity read replaced by its finite difference over the
    augmentation (the position-only surrogate has no velocities — same as
    the humanoid contract, reference learning/train.py:36-45)."""
    import math

    goal = jnp.asarray([float(goal_xy[0]), float(goal_xy[1])])
    home = jnp.asarray(home12)
    w_pos, w_height, w_vel = 50000.0, 500.0 * math.exp(3.0), 30000.0
    w_ori, w_ang, w_ctrl = 500.0, 20.0, 0.01
    w_goal, w_trot = 3000.0, 34000.0
    w_front, w_back = 4400.0, 10000.0
    w_knee, w_posture = 2000.0, 5.0
    target_height, base_tv, osc, nk, period = 0.4, 0.9, 0.1, 0.5, 0.5

    def running(x_aug, u, t):
        q = x_aug[..., :nx]
        qp = x_aug[..., nx:2 * nx]
        tau = x_aug[..., 2 * nx]
        vel3 = (q[..., 0:3] - qp[..., 0:3]) / dt
        ang3 = (q[..., 6:9] - qp[..., 6:9]) / dt   # [sic] reference idx
        phase = (tau % period) / period * 2 * math.pi
        trot = jnp.sin(phase)
        tv = base_tv + osc * jnp.sin(phase)
        FL, FR = q[..., 2], q[..., 5]              # [sic] reference leg idx
        RL, RR = q[..., 8], q[..., 11]
        c = w_height * (q[..., 2] - target_height) ** 2
        c += w_vel * (vel3[..., 0] - tv) ** 2
        c += w_ori * (q[..., 6] ** 2 + q[..., 7] ** 2)   # [sic]
        c += w_ang * jnp.sum(ang3 ** 2, axis=-1)
        c += w_pos * (q[..., 1] ** 2 + vel3[..., 1] ** 2)
        c += w_ctrl * jnp.sum(u ** 2, axis=-1)
        c += w_goal * jnp.sum((q[..., 0:2] - goal) ** 2, axis=-1)
        f1 = (FL - RR) * trot
        f2 = (FR - RL) * (-trot)
        c += w_trot * (f1 * f1 + f2 * f2)
        c += -w_front * (u[..., 1] ** 2 + u[..., 4] ** 2)
        c += w_front * (u[..., 2] ** 2 + u[..., 5] ** 2)
        c += -w_back * (u[..., 7] ** 2 + u[..., 10] ** 2)
        c += w_back * (u[..., 8] ** 2 + u[..., 11] ** 2)
        c += w_knee * ((FL - nk) ** 2 + (FR - nk) ** 2
                       + (RL - nk) ** 2 + (RR - nk) ** 2)
        c += w_posture * jnp.sum(q[..., 0:12] ** 2, axis=-1)
        c += w_home * jnp.sum((q[..., 7:19] - home) ** 2, axis=-1)
        return c

    def terminal(x_aug, t):
        # reference adds no terminal (costs/quadruped.make_costs)
        return jnp.zeros(x_aug.shape[:-1], x_aug.dtype)

    return running, terminal


class EstimatorRunner:
    """Plan on the surrogate; execute on the engine plant."""

    def __init__(self, asset_path: str, apply_fn, params,
                 cfg: MPPIConfig, running, terminal,
                 state_slice: Optional[int] = None, seed: int = 0,
                 state_fn: Optional[Callable] = None,
                 batched_dynamics: bool = False,
                 fd_time_augment: Optional[int] = None,
                 ego_cols=None):
        """`state_fn(plant) -> x` overrides the default [qpos; qvel]
        estimator state (e.g. the humanoid surrogate plans on
        [qpos; foot heights] — the 30 columns it was trained on).
        `batched_dynamics=True` routes rollouts through
        rollout_costs_batched for Pallas-kernel surrogates
        (ops/estimator_kernel).
        `fd_time_augment=nx` wraps the surrogate in the
        [x; x_prev; t_abs] augmentation (make_fd_time_augmented) so the
        cost can FD velocities and keep an absolute gait clock."""
        # full-fidelity plant: coupled constraint tier + body-body contacts
        # (the reference's evaluation plant is MuJoCo itself)
        self.plant_model = build_from_mjcf(asset_path,
                                           include_self_collisions=True)
        self.cfg = cfg
        net_dyn = make_learned_dynamics(apply_fn, params,
                                        state_slice=state_slice,
                                        ego_cols=ego_cols)
        plant_model = self.plant_model
        extract = state_fn or (lambda plant: flat_state_from_physics(plant))
        if fd_time_augment is not None:
            net_dyn, _augment = make_fd_time_augmented(
                net_dyn, fd_time_augment, float(plant_model.timestep))
            base_extract = extract
            extract = lambda plant: _augment(base_extract(plant), plant.time)
        plan = make_mppi(net_dyn, running, cfg, terminal_fn=terminal,
                         batched_dynamics=batched_dynamics)

        def control_step(ms: MPPIState, plant_state):
            x = extract(plant_state)
            action, ms, diag = plan(ms, x)
            new_plant = step(plant_model, plant_state, action)
            return action, ms, new_plant, diag

        self.control_step = jax.jit(control_step)
        self.seed = seed

    def run(self, n_steps: int = 200, init_qpos=None, init_qvel=None,
            seed: Optional[int] = None, init_plan=None) -> TrajectoryLogger:
        """`init_plan` (nu,) seeds every horizon row of the initial plan —
        essential for position-servo robots (Go1): a zero-initialized
        replace-mode plan commands zero joint targets, collapsing the
        stance (the r4/r5 backward-drift cause — the r5 truth-control
        reproduced the drift with a PERFECT model,
        scripts/dev_quad_cost_truth.py)."""
        m = self.plant_model
        qpos = jnp.asarray(init_qpos if init_qpos is not None else m.qpos0)
        qvel = jnp.asarray(init_qvel if init_qvel is not None else np.zeros(m.nv))
        plant = forward(m, qpos, qvel)
        ms = MPPIState.seeded(self.seed if seed is None else seed,
                              self.cfg.T, m.nu)
        if init_plan is not None:
            ms = ms.replace(U=jnp.tile(jnp.asarray(init_plan, jnp.float32),
                                       (self.cfg.T, 1)))
        log = TrajectoryLogger()
        for _ in range(n_steps):
            action, ms, new_plant, _ = self.control_step(ms, plant)
            log.log(np.concatenate([np.asarray(plant.qpos), np.asarray(plant.qvel)]),
                    np.asarray(action), float(plant.time))
            plant = new_plant
        return log


def make_cartpole_estimator(apply_fn, params, asset_path: str,
                            seed: int = 0) -> EstimatorRunner:
    running, terminal = cartpole_cost.make_costs_flat()
    return EstimatorRunner(asset_path, apply_fn, params,
                           ESTIMATOR_CONFIGS["cartpole"], running, terminal,
                           seed=seed)
