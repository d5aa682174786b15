"""Task registry: every reference operating point as a named preset.

The reference hard-codes hyperparameters as module constants in ~12 scripts
(SURVEY.md §2.1 table — those constants are the reproduction contract). Here
each (robot, cost, MPPI config, initial state) tuple is a TaskSpec preset.

Config provenance (reference file:line):
  cartpole            K=30  T=100 lam=1.0 sigma=1.0   src/cartpole_mppi.py:12-15
  cartpole_collect    K=75  T=100 lam=1.0 sigma=0.75  src/cartpole_datacollection.jl:19-22
  humanoid            K=50  T=100 lam=1.0 sigma=1.0   src/Humanoid_mppi.jl:22-25
  humanoid_v3         K=30  T=75  lam=1.0 sigma=0.75  src/Humanoid_mppi_v3.jl:13-16
  humanoid_collect    K=50  T=100 lam=1.0 sigma=0.5   src/Humanoid_datacollection_v2.jl:46-49
  go1                 K=50  H=30  lam=0.2 sigma=0.3   src/mppi.jl:10-13
  go1_collect         K=50  H=30  lam=0.2 sigma=0.3   src/quadruped_datacollection.py:24-27
  cartpole_estimator  K=2048 T=100 lam=10.0 sigma=0.5 src/cartpole_mppi_estimator.py:37-40
  go1_estimator       K=2048 T=50  lam=10.0 sigma=0.4 src/quadruped_mppi_estimator.py:38-41
  hopper              (new task; asset shipped unused by the reference)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional, Tuple

import numpy as np

from ..costs import arm5 as arm5_cost
from ..costs import cartpole as cartpole_cost
from ..costs import hopper as hopper_cost
from ..costs import humanoid as humanoid_cost
from ..costs import quadruped as quadruped_cost
from ..solver.mppi import MPPIConfig

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    name: str
    asset: str                         # xml file in assets/
    mppi: MPPIConfig
    cost_factory: Callable             # (model, **cost_kwargs) -> (running, terminal)
    cost_kwargs: dict = dataclasses.field(default_factory=dict)
    init_qpos: Optional[Tuple[float, ...]] = None   # None -> model qpos0/keyframe
    init_keyframe: Optional[str] = None
    clamp_ctrl_to_range: bool = False  # clip to actuator ctrlrange (go1 scripts)
    ctrl_clamp_abs: Optional[float] = None  # e.g. +-10 in src/mppi.jl:93
    kernel_cost: Optional[str] = None  # ops.kernel_costs.KERNEL_COSTS key
    state_wrapper: Optional[Callable] = None  # (model) -> ((dyn, init) ->
    # (dyn', init')) for tasks whose dynamics state is augmented beyond
    # PhysicsState (e.g. the v2.py FD-velocity + gait-hysteresis carry)

    def asset_path(self) -> str:
        return os.path.join(ASSET_DIR, self.asset)


def _mk(name, asset, cost_factory, K, T, lam, sigma, tail=0.1, terminal_scale=0.0,
        **kw):
    extra = {k: kw.pop(k) for k in list(kw) if k in (
        "cost_kwargs", "init_qpos", "init_keyframe", "clamp_ctrl_to_range",
        "ctrl_clamp_abs", "kernel_cost", "state_wrapper")}
    cfg = MPPIConfig(n_samples=K, horizon=T, temperature=lam, sigma=sigma,
                     tail_decay=tail, terminal_scale=terminal_scale, **kw)
    return TaskSpec(name=name, asset=asset, mppi=cfg, cost_factory=cost_factory,
                    **extra)


TASKS = {
    t.name: t
    for t in [
        _mk("cartpole", "cartpole.xml", cartpole_cost.make_costs,
            K=30, T=100, lam=1.0, sigma=1.0, init_qpos=(0.0, np.pi),
            kernel_cost="cartpole"),
        _mk("cartpole_collect", "cartpole.xml", cartpole_cost.make_costs,
            K=75, T=100, lam=1.0, sigma=0.75, init_qpos=(0.0, np.pi),
            kernel_cost="cartpole"),
        _mk("humanoid", "humanoid.xml", humanoid_cost.make_costs_v1,
            K=50, T=100, lam=1.0, sigma=1.0, kernel_cost="humanoid_v1"),
        _mk("humanoid_v3", "humanoid.xml", humanoid_cost.make_costs,
            K=30, T=75, lam=1.0, sigma=0.75, kernel_cost="humanoid"),
        # reference src/Humanoid_datacollection.py:35-38 (hard-penalty cost)
        _mk("humanoid_hard", "humanoid.xml", humanoid_cost.make_costs_hard_penalty,
            K=30, T=75, lam=1.0, sigma=0.75, kernel_cost="humanoid_hard"),
        _mk("humanoid_collect", "humanoid.xml", humanoid_cost.make_costs,
            K=50, T=100, lam=1.0, sigma=0.5, kernel_cost="humanoid"),
        # reference src/Humanoid_datacollection.jl:19-23 — v3 cost, K=75,
        # advancing goal (collect.runner.collect_humanoid_jl)
        _mk("humanoid_collect_jl", "humanoid.xml", humanoid_cost.make_costs,
            K=75, T=100, lam=1.0, sigma=0.5, kernel_cost="humanoid"),
        # NEW (no reference analog): tuned walking gait found by runtime
        # PARAM_SLOTS sweeps on TPU (scripts/dev_gait_sweep.py) — the v3
        # functional form, WEIGHTS_WALK posture base, sampling noise
        # sigma = 0.5*exp(-0.35), plus the round-2 "combo_slowgoal" deltas:
        # height 22, orient 17, goal_xy 1.0 (reduced pull stops overspeed
        # trip-falls at ~0.65 m/s), clearance 1.0, foot-lift 10 (kills ~1 m
        # kick-steps). With the restitution cap closing the contact-catapult
        # exploit, 6/6 seeds walk the full 3 s run at 0.30-0.39 m/s with
        # max foot lift 0.18-0.33 m at K=8192, H=64 (PARITY.md gap 3)
        _mk("humanoid_walk", "humanoid.xml", humanoid_cost.make_costs,
            K=8192, T=64, lam=1.0, sigma=0.5 * float(np.exp(-0.35)),
            kernel_cost="humanoid",
            cost_kwargs=dict(humanoid_cost.WEIGHTS_WALK,
                             target=(10.0, 0.0, 1.28),
                             w_height=22.0, w_orient=17.0, w_goal_xy=1.0,
                             w_clearance=1.0, w_foot_lift=10.0,
                             # round-4 stride continuation (sv020_fast01):
                             # swing-foot velocity reward turned the r3
                             # shuffle seeds into strides; round-5 ratchets
                             # the velocity target 0.4 -> 0.5 (the
                             # reference target, src/Humanoid_mppi.jl:42):
                             # 6/6 seeds at 0.43-0.63 m/s, fleet mean 0.54
                             # (walk_tv05 sweep, scripts/dev_gait_sweep).
                             # Tradeoff: seed 0 double-support rises to
                             # ~0.32 at the faster target (fleet median
                             # stays < 0.2) — tests/test_walk_seeds.py
                             w_swing_vel=0.20, target_vel=(0.5, 0.0))),
        # reference src/Humanoid_datacollection_v2.py:37-40 — FD-velocity
        # cost, hysteresis gait phase, double replan per control step
        _mk("humanoid_collect_v2py", "humanoid.xml",
            humanoid_cost.make_costs_v2py,
            K=30, T=75, lam=1.0, sigma=0.75, replans_per_step=2,
            state_wrapper=humanoid_cost.make_gait_fd_wrapper),
        _mk("go1", "go1.xml", quadruped_cost.make_costs_mppi_jl,
            K=50, T=30, lam=0.2, sigma=0.3, tail=0.0,
            init_keyframe="home", ctrl_clamp_abs=10.0,
            kernel_cost="quadruped_jl"),
        _mk("go1_collect", "go1.xml", quadruped_cost.make_costs,
            K=50, T=30, lam=0.2, sigma=0.3, tail=0.0,
            init_keyframe="home", clamp_ctrl_to_range=True,
            kernel_cost="quadruped"),
        _mk("hopper", "hopper.xml", hopper_cost.make_costs,
            K=64, T=50, lam=0.5, sigma=0.6, kernel_cost="hopper"),
        # NEW (no reference analog): the fifth robot plans on the kernel
        # path too — ball joints, multi-dof motors, and plane-vs-mesh
        # contacts in the mega-kernel (round-5 kernel-path generality)
        _mk("arm5_reach", "arm5.xml", arm5_cost.make_costs,
            K=64, T=40, lam=0.5, sigma=0.8, kernel_cost="arm5"),
    ]
}

# Benchmark/scale variants (driver-supplied north star, BASELINE.json):
TASKS["cartpole_pr1"] = dataclasses.replace(
    TASKS["cartpole"], name="cartpole_pr1",
    mppi=dataclasses.replace(TASKS["cartpole"].mppi, n_samples=256, horizon=30),
)
TASKS["humanoid_bench"] = dataclasses.replace(
    TASKS["humanoid_collect"], name="humanoid_bench",
    mppi=dataclasses.replace(TASKS["humanoid_collect"].mppi,
                             n_samples=8192, horizon=64),
)


def load_task(name: str):
    """Build (spec, physics_model, dynamics, running, terminal, init_state)."""
    import jax
    import jax.numpy as jnp

    from ..dynamics.physics import make_physics_dynamics
    from ..physics import build_from_mjcf, forward

    spec = TASKS[name]
    model = build_from_mjcf(spec.asset_path())

    cfg = spec.mppi
    if spec.clamp_ctrl_to_range:
        lo, hi = model.ctrl_range()
        cfg = dataclasses.replace(
            cfg, ctrl_low=tuple(lo), ctrl_high=tuple(hi), clamp_plan=True)
    elif spec.ctrl_clamp_abs is not None:
        c = spec.ctrl_clamp_abs
        cfg = dataclasses.replace(
            cfg, ctrl_low=(-c,) * model.nu, ctrl_high=(c,) * model.nu,
            clamp_plan=True)

    running, terminal = spec.cost_factory(model, **spec.cost_kwargs)
    # planner-tier dynamics: decoupled penalty constraints, floor contacts
    # only — the law the Pallas rollout kernel implements, cheap across
    # K-lane rollouts. The environment plant uses the full-fidelity coupled
    # tier with body-body contacts (load_plant).
    dynamics = make_physics_dynamics(model, solver="penalty")

    if spec.init_keyframe is not None:
        qpos0 = dict(model.keyframes)[spec.init_keyframe]
    elif spec.init_qpos is not None:
        qpos0 = np.asarray(spec.init_qpos, dtype=np.float64)
    else:
        qpos0 = model.qpos0
    # jit the init FK: eager op-by-op execution is pathologically slow on
    # remote-tunneled devices (each tiny op is a host round-trip)
    init_state = jax.jit(lambda qp, qv: forward(model, qp, qv))(
        jnp.asarray(qpos0), jnp.zeros(model.nv))

    if spec.state_wrapper is not None:
        dynamics, init_state = spec.state_wrapper(model)(dynamics, init_state)

    return spec, model, dynamics, running, terminal, init_state, cfg


def load_plant(name: str, init_state=None):
    """Full-fidelity environment plant for a task: the coupled constraint
    tier (MuJoCo-QP analog) with body-body self-collision pairs enabled —
    the analog of the reference's MuJoCo plant (planner models stay
    floor-only/penalty for rollout speed; PARITY.md "fidelity tiers").

    Returns (plant_model, plant_dynamics); when the task has a state
    wrapper, `init_state` must be the UNWRAPPED PhysicsState (or the wrapped
    state, whose .phys is used) so the wrapped plant dynamics can be built.
    """
    from ..dynamics.physics import make_physics_dynamics
    from ..physics import build_from_mjcf

    spec = TASKS[name]
    plant_model = build_from_mjcf(spec.asset_path(),
                                  include_self_collisions=True)
    dyn = make_physics_dynamics(plant_model, solver="coupled")
    if spec.state_wrapper is not None:
        phys = getattr(init_state, "phys", init_state)
        dyn, _ = spec.state_wrapper(plant_model)(dyn, phys)
    return plant_model, dyn
