"""Scalar-SoA task costs for the Pallas rollout kernel.

Same formulas as costs/* (which operate on PhysicsState arrays and remain
the oracle these are tested against), re-expressed over StepContext scalar
views so they fuse into the rollout mega-kernel. Each factory returns
(running(ctx, t) -> (B,), terminal(ctx) -> (B,)) with ctrl read from ctx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.model import PhysicsModel
from .scalar_physics import StepContext, add3, cross, dot3, qmat, sub3


from .kernel_math import asin as _asin
from .kernel_math import atan2 as _atan2


def _rpy(q):
    w, x, y, z = q
    roll = _atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = _asin(2 * (w * y - z * x))
    yaw = _atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def _sumsq(xs):
    acc = 0.0
    for x in xs:
        acc = acc + x * x
    return acc


def cartpole(model: PhysicsModel):
    """reference src/cartpole_mppi.py:44-53 (see costs/cartpole.py)."""

    def running_vals(x_pos, theta, x_vel, theta_vel, u):
        return (
            1.0 * x_pos**2
            + 20.0 * (jnp.cos(theta) - 1.0) ** 2
            + 0.1 * x_vel**2
            + 0.1 * theta_vel**2
            + 0.01 * _sumsq(u)
        )

    def running(ctx: StepContext, t):
        return running_vals(ctx.qpos[0], ctx.qpos[1], ctx.qvel[0], ctx.qvel[1],
                            ctx.ctrl)

    def terminal(ctx: StepContext):
        return 10.0 * running_vals(ctx.qpos[0], ctx.qpos[1], ctx.qvel[0],
                                   ctx.qvel[1], [0.0])

    return running, terminal


# Runtime cost-parameter slot layout (ctx.params, padded to NP=16 by the
# rollout kernel; see also solver/kernel_mppi.py which reads the solver
# scales). Slots 4+ are DELTAS added to the reference defaults, so an
# all-zero params vector reproduces the reference cost bit-for-bit while a
# sweep over gait shaping needs NO recompile (kernel compiles cost minutes
# through the remote-compile service).
PARAM_SLOTS = {
    0: "goal_x (absolute; param_target=True)",
    1: "goal_y",
    2: "goal_z",
    3: "goal-advance counter (collect_humanoid_jl driver state)",
    4: "d_target_vel_x   (+0.3)",
    5: "d_foot_offset    (+0.5 m swing-foot target ahead of root)",
    6: "d_swing_vel_w    (+0.15 swing-foot forward-velocity reward)",
    7: "d_height_w       (+5.0)",
    8: "d_goal_xy_w      (+12.5)",
    9: "d_clearance_w    (+2.0)",
    10: "d_orient_w      (+5.0 roll/pitch)",
    11: "d_log_sigma     (solver: sigma *= exp(p11))",
    12: "d_log_temperature (solver: lambda *= exp(p12))",
    13: "d_swing_x_w     (+8.0 swing-foot x-target)",
    14: "d_knee_x_w      (+3.0 swing-knee x-target)",
    15: "d_foot_lift_w   (+0.0 foot-lift-above-0.25m penalty)",
}


def humanoid(model: PhysicsModel, target=(2.0, 0.0, 1.28), target_vel=(0.3, 0.0),
             param_target: bool = False, param_gait: bool = False,
             w_orient=5.0, w_goal_xy=12.5, w_height=5.0, w_swing_x=8.0,
             w_swing_vel=0.15, w_knee_x=3.0, w_clearance=2.0,
             w_foot_lift=0.0):
    """reference src/Humanoid_datacollection_v2.jl:90-160 (see costs/humanoid.py).

    param_target=True reads the goal from ctx.params[0:3] at runtime (no
    recompile per collection episode). param_gait=True additionally reads the
    PARAM_SLOTS[4..10] deltas, so gait-shaping sweeps reuse one compile;
    zero deltas == the baked weights exactly. The w_* kwargs set the BAKED
    base weights (defaults = reference v3; costs/humanoid.WEIGHTS_WALK is
    the tuned walking preset) — runtime deltas add on top of these."""
    id_shin_l = model.body_id("shin_left")
    id_shin_r = model.body_id("shin_right")
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")
    tx0, ty0, tz0 = [float(v) for v in target]
    tvx, tvy = [float(v) for v in target_vel]

    def _run(ctx: StepContext, u):
        if param_target:
            tx, ty, tz = ctx.params[0], ctx.params[1], ctx.params[2]
        else:
            tx, ty, tz = tx0, ty0, tz0
        p = ctx.params
        if param_gait:
            tvx_e = tvx + p[4]
            foot_off = 0.5 + p[5]
            swing_vel_w = w_swing_vel + p[6]
            height_w = w_height + p[7]
            goal_xy_w = w_goal_xy + p[8]
            clearance_w = w_clearance + p[9]
            orient_w = w_orient + p[10]
            swing_x_w = w_swing_x + p[13]
            knee_x_w = w_knee_x + p[14]
            foot_lift_w = w_foot_lift + p[15]
        else:
            tvx_e, foot_off, swing_vel_w = tvx, 0.5, w_swing_vel
            height_w, goal_xy_w = w_height, w_goal_xy
            clearance_w, orient_w = w_clearance, w_orient
            swing_x_w, knee_x_w = w_swing_x, w_knee_x
            foot_lift_w = w_foot_lift
        q = ctx.qpos
        rx, ry, rz = q[0], q[1], q[2]
        roll, pitch, yaw = _rpy((q[3], q[4], q[5], q[6]))
        cost = orient_w * (roll * roll + pitch * pitch) + 0.075 * yaw * yaw

        dx, dy = rx - tx, ry - ty
        cost = cost + goal_xy_w * jnp.sqrt(dx * dx + dy * dy + 1e-12)
        cost = cost + height_w * jnp.abs(tz - rz)
        vx, vy = ctx.qvel[0] - tvx_e, ctx.qvel[1] - tvy
        cost = cost + 1.0 * jnp.sqrt(vx * vx + vy * vy + 1e-12)

        vxl = ctx.body_com_linvel(model, id_shin_l)[0]
        vxr = ctx.body_com_linvel(model, id_shin_r)[0]
        left = (vxl > vxr).astype(rx.dtype)

        def sel(a, b):
            return left * a + (1.0 - left) * b

        foot_tx = rx + foot_off
        fl, fr = ctx.xpos[id_foot_l], ctx.xpos[id_foot_r]
        swing_x = sel(fl[0], fr[0])
        swing_z = sel(fl[2], fr[2])
        stance_z = sel(fr[2], fl[2])
        cost = cost + swing_x_w * jnp.abs(swing_x - foot_tx)

        vfl = ctx.body_com_linvel(model, id_foot_l)[0]
        vfr = ctx.body_com_linvel(model, id_foot_r)[0]
        cost = cost - swing_vel_w * sel(vfl, vfr)

        knee_x = sel(ctx.xpos[id_shin_l][0], ctx.xpos[id_shin_r][0])
        cost = cost + knee_x_w * (knee_x - foot_tx) ** 2

        clearance = swing_z - stance_z
        cost = cost + jnp.where(clearance < 0.05, clearance_w * clearance**2, 0.0)
        leg_cl = fl[1] - fr[1]
        cost = cost + jnp.where(leg_cl < 0.0, 0.5 * leg_cl**2, 0.0)
        # foot-lift-above-band penalty (costs/humanoid.py, default weight 0)
        liftl = jnp.maximum(fl[2] - 0.25, 0.0)
        liftr = jnp.maximum(fr[2] - 0.25, 0.0)
        cost = cost + foot_lift_w * (liftl * liftl + liftr * liftr)
        cost = cost + 0.01 * _sumsq(u)
        return cost

    def running(ctx, t):
        return _run(ctx, ctx.ctrl)

    def terminal(ctx):
        return 10.0 * _run(ctx, [0.0] * model.nu)

    return running, terminal


def humanoid_v1(model: PhysicsModel, target=(2.0, 0.0), target_vel=0.5,
                step_period: int = 100, horizon: int = 0):
    """Time-phased-gait v1 cost (reference src/Humanoid_mppi.jl:31-121; the
    jnp oracle is costs/humanoid.make_costs_v1): a square-wave gait clock
    alternates the swing side every `step_period` rollout steps. `horizon`
    is injected by build_rollout_kernel so the terminal's gait clock reads
    t=T exactly like the array solver (solver/mppi.py:165)."""
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")
    tx, ty = [float(v) for v in target]

    def running(ctx: StepContext, t):
        q, v, u = ctx.qpos, ctx.qvel, ctx.ctrl
        roll, pitch, yaw = _rpy((q[3], q[4], q[5], q[6]))
        cost = 5.0 * (roll * roll + pitch * pitch) + 0.1 * yaw * yaw
        dx, dy = q[0] - tx, q[1] - ty
        cost = cost + 10.0 * jnp.sqrt(dx * dx + dy * dy + 1e-12)
        cost = cost + 5.0 * jnp.abs(1.28 - q[2])
        cost = cost + 1.0 * jnp.abs(v[0] - target_vel)

        left_swings = ((t // step_period) % 2 == 0)
        left = jnp.asarray(left_swings).astype(q[0].dtype)
        fl, fr = ctx.xpos[id_foot_l], ctx.xpos[id_foot_r]
        swing_z = left * fl[2] + (1.0 - left) * fr[2]
        stance_z = left * fr[2] + (1.0 - left) * fl[2]
        clearance = swing_z - stance_z
        cost = cost + jnp.where(clearance < 0.05,
                                5.0 * (0.05 - clearance) ** 2, 0.0)
        cost = cost + 0.01 * _sumsq(u)
        return cost

    def terminal(ctx: StepContext):
        # oracle: terminal_fn(final_state, T) with zero controls — the gait
        # clock reads the (static) horizon injected at build time
        saved = ctx.ctrl
        ctx.ctrl = [jnp.zeros_like(ctx.qpos[0])] * model.nu
        c = 10.0 * running(ctx, jnp.asarray(horizon, jnp.int32))
        ctx.ctrl = saved
        return c

    return running, terminal


def humanoid_hard(model: PhysicsModel, target=(2.0, 0.0, 1.28),
                  target_vel=(0.3, 0.0)):
    """Hard-penalty gait cost (reference src/Humanoid_datacollection.py:57-186;
    jnp oracle costs/humanoid.make_costs_hard_penalty), including the [sic]
    LINEAR height term and the [0.15, 0.21] lateral dead-zone bands."""
    id_shin_l = model.body_id("shin_left")
    id_shin_r = model.body_id("shin_right")
    id_foot_l = model.body_id("foot_left")
    id_foot_r = model.body_id("foot_right")
    tx, ty, tz = [float(v) for v in target]
    tvx, tvy = [float(v) for v in target_vel]

    def _run(ctx: StepContext, u):
        q, v = ctx.qpos, ctx.qvel
        roll, pitch, yaw = _rpy((q[3], q[4], q[5], q[6]))
        cost = 5.0 * (roll * roll + pitch * pitch) + 0.075 * yaw * yaw
        dx, dy = q[0] - tx, q[1] - ty
        cost = cost + 12.5 * jnp.sqrt(dx * dx + dy * dy + 1e-12)
        cost = cost + 5.0 * (tz - q[2])          # [sic] linear, not abs
        vx, vy = v[0] - tvx, v[1] - tvy
        cost = cost + 1.0 * jnp.sqrt(vx * vx + vy * vy + 1e-12)

        vxl = ctx.body_com_linvel(model, id_shin_l)[0]
        vxr = ctx.body_com_linvel(model, id_shin_r)[0]
        left = (vxl > vxr).astype(q[0].dtype)

        def sel(a, b):
            return left * a + (1.0 - left) * b

        foot_tx = q[0] + 0.5
        fl, fr = ctx.xpos[id_foot_l], ctx.xpos[id_foot_r]
        sl, sr = ctx.xpos[id_shin_l], ctx.xpos[id_shin_r]
        swing_x = sel(fl[0], fr[0])
        swing_z = sel(fl[2], fr[2])
        stance_z = sel(fr[2], fl[2])
        cost = cost + 8.0 * jnp.abs(swing_x - foot_tx)

        vfl = ctx.body_com_linvel(model, id_foot_l)[0]
        vfr = ctx.body_com_linvel(model, id_foot_r)[0]
        cost = cost - 1000.0 * sel(vfl, vfr)

        knee_x = sel(sl[0], sr[0])
        cost = cost + 3.0 * (knee_x - foot_tx) ** 2

        swing_knee_z = sel(sl[2], sr[2])
        cost = cost + jnp.where(swing_z >= swing_knee_z - 0.3,
                                10000.0 * (swing_z - swing_knee_z) ** 2, 0.0)
        clearance = swing_z - stance_z
        cost = cost + jnp.where(clearance < 0.005, 100.0 * clearance**2, 0.0)

        leg_cl = jnp.abs(fl[1] - fr[1])
        cost = cost + jnp.where((leg_cl <= 0.15) | (leg_cl >= 0.21),
                                100.0 * leg_cl**2, 0.0)
        knee_cl = jnp.abs(sl[1] - sr[1])
        cost = cost + jnp.where((knee_cl <= 0.15) | (knee_cl >= 0.21),
                                100.0 * knee_cl**2, 0.0)
        cost = cost + 0.01 * _sumsq(u)
        return cost

    def running(ctx: StepContext, t):
        return _run(ctx, ctx.ctrl)

    def terminal(ctx: StepContext):
        return 10.0 * _run(ctx, [jnp.zeros_like(ctx.qpos[0])] * model.nu)

    return running, terminal


def quadruped(model: PhysicsModel, goal_xy=(2.0, 0.0), param_goal: bool = False,
              param_gait: bool = False):
    """reference src/quadruped_datacollection.py:57-138 verbatim, including
    its indexing quirks (see costs/quadruped.py docstring).

    param_gait=True additionally reads runtime gait-shaping DELTAS from
    ctx.params (same design as the humanoid's param_gait — an all-zero
    params vector reproduces the reference cost exactly while a sweep over
    shaping reuses one compile):
      4: d_target_vel_x      5: d_target_height
      6: d_log_w_height      7: d_log_w_vel
      8: d_log_w_trot        9: d_log_w_goal
      10: d_home_posture_w — NEW term weight on the TRUE 12 leg joints
          (qpos[7:19]) toward the home-stance keyframe pose; the
          reference's "calf"/posture terms act on misindexed state
          (docstring) and provide no real leg shaping on our planner
          tier, which otherwise prefers a belly-crawl minimum."""
    home12 = [float(x) for x in np.asarray(
        dict(model.keyframes)["home"])[7:19]]
    gx0, gy0 = [float(v) for v in goal_xy]

    def running(ctx: StepContext, t):
        gx, gy = (ctx.params[0], ctx.params[1]) if param_goal else (gx0, gy0)
        q, v, u = ctx.qpos, ctx.qvel, ctx.ctrl
        time = ctx.time
        if param_gait:
            p = ctx.params
            d_vel, d_h = p[4], p[5]
            w_h = 500.0 * jnp.exp(p[6])
            w_v = 30000.0 * jnp.exp(p[7])
            w_tr = 34000.0 * jnp.exp(p[8])
            w_g = 3000.0 * jnp.exp(p[9])
            w_knee_true = p[10]
        else:
            d_vel = d_h = 0.0
            w_h, w_v, w_tr, w_g = 500.0, 30000.0, 34000.0, 3000.0
            w_knee_true = 0.0
        phase = (time % 0.5) / 0.5 * 2 * np.pi
        trot = jnp.sin(phase)
        target_vel_x = 0.9 + d_vel + 0.1 * jnp.sin(phase)

        FL_calf, FR_calf, RL_calf, RR_calf = q[2], q[5], q[8], q[11]
        cost = w_h * (q[2] - (0.4 + d_h)) ** 2
        cost = cost + w_v * (v[0] - target_vel_x) ** 2
        cost = cost + 500.0 * (q[6] ** 2 + q[7] ** 2)
        cost = cost + 20.0 * _sumsq(v[6:9])
        cost = cost + 50000.0 * (q[1] ** 2 + v[1] ** 2)
        cost = cost + 0.01 * _sumsq(u)
        cost = cost + w_g * ((q[0] - gx) ** 2 + (q[1] - gy) ** 2)
        f1 = (FL_calf - RR_calf) * trot
        f2 = (FR_calf - RL_calf) * (-trot)
        cost = cost + w_tr * (f1 * f1 + f2 * f2)
        cost = cost - 4400.0 * (u[1] ** 2 + u[4] ** 2)
        cost = cost + 4400.0 * (u[2] ** 2 + u[5] ** 2)
        cost = cost - 10000.0 * (u[7] ** 2 + u[10] ** 2)
        cost = cost + 10000.0 * (u[8] ** 2 + u[11] ** 2)
        nk = 0.5
        cost = cost + 2000.0 * ((FL_calf - nk) ** 2 + (FR_calf - nk) ** 2
                                + (RL_calf - nk) ** 2 + (RR_calf - nk) ** 2)
        cost = cost + 5.0 * _sumsq(q[0:12])
        if param_gait:
            # true-leg-joint stance shaping toward the home keyframe pose:
            # prevents the belly-crawl minimum (collapsed thighs) the
            # penalty planner tier otherwise prefers; zero weight ==
            # reference cost
            ck = 0.0
            for k in range(12):
                ck = ck + (q[7 + k] - home12[k]) ** 2
            cost = cost + w_knee_true * ck
        return cost

    def terminal(ctx):
        return jnp.zeros_like(ctx.qpos[0])

    return running, terminal


def quadruped_jl(model: PhysicsModel, target_vel_x=0.5):
    """reference src/mppi.jl:18-62 (see costs/quadruped.make_costs_mppi_jl)."""

    def running(ctx: StepContext, t):
        q, v, u = ctx.qpos, ctx.qvel, ctx.ctrl
        cost = 1.0 * (v[0] - target_vel_x) ** 2 + 2.0 * v[1] ** 2
        roll, pitch, _ = _rpy((q[3], q[4], q[5], q[6]))
        cost = cost + 2.0 * (roll * roll + pitch * pitch)
        cost = cost + 0.1 * _sumsq(v[6:])
        cost = cost + 0.01 * _sumsq(u)
        return cost

    def terminal(ctx):
        return jnp.zeros_like(ctx.qpos[0])

    return running, terminal


def hopper(model: PhysicsModel, target_vel_x=1.0, target_height=1.0,
           w_pitch=4.0, w_pitch_rate=0.3, param_gait: bool = False):
    """see costs/hopper.py (new task).

    param_gait=True reads runtime shaping DELTAS from ctx.params (zero ==
    the baked cost exactly; same design as the quadruped/humanoid gaits):
      4: d_target_vel_x
      5: w_land — landing-preparation penalty: squared excess descent
         speed, gated on the torso being low. The decoupled penalty
         planner over-trusts hard single-foot landings (the r3-diagnosed
         hopper failure mode) — penalizing fast low-altitude descent makes
         the planner arrive at touchdown at speeds where its contact model
         and the coupled plant agree.
      6: d_log_w_pitch (scales w_pitch AND w_pitch_rate)
      7: d_knee_w — knee-angle anchor toward 1.2 + slot9 rad (landing
         readiness / anti-crouch: the observed failure mode is landing,
         staying crouched at knee ~2 rad, and pitching over)
      8: w_clock — hop-clock term: track a sinusoid torso-height profile
         z*(tau) = 0.92 + 0.18 sin(2 pi tau / 0.75 s), forcing a periodic
         rebound instead of the ad-hoc hops that die out
      9: d_knee_anchor — shifts the knee anchor angle
    """

    def running(ctx: StepContext, t):
        q, v, u = ctx.qpos, ctx.qvel, ctx.ctrl
        if param_gait:
            p = ctx.params
            d_vel, w_land = p[4], p[5]
            pitch_scale = jnp.exp(p[6])
            w_knee = p[7]
            w_clock, d_anchor = p[8], p[9]
        else:
            d_vel, w_land, pitch_scale, w_knee = 0.0, 0.0, 1.0, 0.0
            w_clock, d_anchor = 0.0, 0.0
        cost = 2.0 * (v[0] - (target_vel_x + d_vel)) ** 2
        cost = cost + 5.0 * jnp.maximum(target_height - 0.3 - q[1] - 1.0, 0.0) ** 2
        cost = cost + (w_pitch * q[2] ** 2 + w_pitch_rate * v[2] ** 2) * pitch_scale
        cost = cost + 0.01 * _sumsq(u)
        if param_gait:
            # landing prep: torso absolute z = 1 + q[1]; gate in [0,1]
            # below 0.85 m, penalize descent speed beyond 0.4 m/s
            gate = jnp.clip((0.85 - (q[1] + 1.0)) * 4.0, 0.0, 1.0)
            over = jnp.maximum(-v[1] - 0.4, 0.0)
            cost = cost + w_land * gate * over * over
            # knee anchored near mid-range for touchdown / anti-crouch
            cost = cost + w_knee * (q[5] - (1.2 + d_anchor)) ** 2
            # hop clock: periodic torso-height target (absolute z)
            zstar = 0.92 + 0.18 * jnp.sin(ctx.time * (2 * np.pi / 0.75))
            cost = cost + w_clock * (q[1] + 1.0 - zstar) ** 2
        return cost

    def terminal(ctx):
        return 10.0 * running(ctx, 0)

    return running, terminal


def arm5(model: PhysicsModel, target=(0.35, 0.15, 0.55),
         w_reach=10.0, w_vel=0.05, w_ctrl=0.01):
    """Reach cost for the arm5 generality robot — kernel port of
    costs/arm5.make_costs (round-5 kernel-path generality: ball joints,
    multi-dof motors, and plane-vs-mesh contacts run in the mega-kernel)."""
    hand = model.body_names.index("hand")
    tx, ty, tz = [float(v) for v in target]
    n_arm = 7

    def reach(ctx: StepContext):
        px, py, pz = ctx.xpos[hand]
        return ((px - tx) ** 2 + (py - ty) ** 2 + (pz - tz) ** 2)

    def running(ctx: StepContext, t):
        return (w_reach * reach(ctx)
                + w_vel * _sumsq(ctx.qvel[:n_arm])
                + w_ctrl * _sumsq(ctx.ctrl))

    def terminal(ctx: StepContext):
        return 10.0 * w_reach * reach(ctx)

    return running, terminal


KERNEL_COSTS = {
    "cartpole": cartpole,
    "arm5": arm5,
    "humanoid": humanoid,
    "humanoid_v1": humanoid_v1,
    "humanoid_hard": humanoid_hard,
    "quadruped": quadruped,
    "quadruped_jl": quadruped_jl,
    "hopper": hopper,
}
