"""Receding-horizon episode drivers + data-collection orchestration.

Replaces the reference's per-script main loops (SURVEY.md §3.2/§3.3):
- `EpisodeRunner.run()` = the generic viewer/headless control loop
  (plan -> log -> execute -> check goal/fall), with plan+plant-step fused
  into one jitted device function; only small per-step state crosses to host
  for logging.
- `collect_humanoid()` = reference src/Humanoid_datacollection_v2.jl:
  randomized pose + goal, goal-gated saving, 57-col states with foot heights.
  Episode-sharding across processes/hosts replaces the sequential run.sh.
- `collect_quadruped()` = reference src/quadruped_datacollection.py:207-260:
  multi-goal runs, fall abort, per-run save dirs.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.tasks import load_task
from ..solver.mppi import MPPIState, make_mppi
from .logging import TrajectoryLogger


@dataclasses.dataclass
class EpisodeResult:
    steps: int
    goal_reached: bool
    fell: bool
    final_qpos: np.ndarray
    logger: TrajectoryLogger
    sim_time: float


class EpisodeRunner:
    """One robot + cost + MPPI config, reusable across episodes."""

    def __init__(self, task_name: str, seed: int = 0,
                 cost_kwargs_override: Optional[dict] = None,
                 mppi_override: Optional[dict] = None):
        spec, model, dynamics, running, terminal, init_state, cfg = load_task(task_name)
        if cost_kwargs_override:
            kw = dict(spec.cost_kwargs)
            kw.update(cost_kwargs_override)
            running, terminal = spec.cost_factory(model, **kw)
        if mppi_override:
            cfg = dataclasses.replace(cfg, **mppi_override)
        self.spec, self.model, self.cfg = spec, model, cfg
        self.dynamics = dynamics
        self.init_state = init_state
        self.seed = seed

        plan = make_mppi(dynamics, running, cfg, terminal_fn=terminal)

        def control_step(ms, plant):
            action, ms, diag = plan(ms, plant)
            new_plant = dynamics(plant, action, jnp.asarray(0))
            return action, ms, new_plant, diag

        self.control_step = jax.jit(control_step)

    def fresh_controller(self, seed: Optional[int] = None) -> MPPIState:
        key = jax.random.PRNGKey(self.seed if seed is None else seed)
        return MPPIState.init(key, self.cfg.T, self.model.nu)

    def run(
        self,
        max_steps: int = 1000,
        init_state=None,
        seed: Optional[int] = None,
        state_row_fn: Optional[Callable] = None,
        goal_fn: Optional[Callable] = None,
        fall_fn: Optional[Callable] = None,
        logger: Optional[TrajectoryLogger] = None,
    ) -> EpisodeResult:
        """state_row_fn(plant_state)->np row; goal_fn/fall_fn(qpos)->bool."""
        plant = self.init_state if init_state is None else init_state
        ms = self.fresh_controller(seed)
        log = logger if logger is not None else TrajectoryLogger()
        goal = fell = False
        steps = 0
        for i in range(max_steps):
            action, ms, new_plant, _ = self.control_step(ms, plant)
            a_np = np.asarray(action)
            qpos_np = np.asarray(plant.qpos)
            row = (state_row_fn(plant) if state_row_fn
                   else np.concatenate([qpos_np, np.asarray(plant.qvel)]))
            log.log(row, a_np, float(plant.time))
            plant = new_plant
            steps = i + 1
            qpos_after = np.asarray(plant.qpos)
            if fall_fn is not None and fall_fn(qpos_after):
                fell = True
                break
            if goal_fn is not None and goal_fn(qpos_after):
                goal = True
                break
        return EpisodeResult(
            steps=steps, goal_reached=goal, fell=fell,
            final_qpos=np.asarray(plant.qpos), logger=log,
            sim_time=float(plant.time),
        )


# ---------------------------------------------------------------------------
# Humanoid collection (reference src/Humanoid_datacollection_v2.jl)
# ---------------------------------------------------------------------------

def randomize_humanoid_pose(model, rng: np.random.Generator):
    """Reference randomize_initial_pose! (:13-36): root xy +-0.2 m, joint
    angles +-0.05, velocities +-0.05."""
    qpos = model.qpos0.copy()
    qpos[0] += (rng.random() - 0.5) * 0.4
    qpos[1] += (rng.random() - 0.5) * 0.4
    qpos[7:] += (rng.random(len(qpos) - 7) - 0.5) * 0.1
    qvel = (rng.random(model.nv) - 0.5) * 0.1
    return qpos, qvel


def random_humanoid_goal(rng: np.random.Generator):
    """Reference :40-41: x in [0.5, 2.5], y in [-0.5, 0.5], z = 1.28."""
    return np.array([rng.random() * 2.0 + 0.5, rng.random() - 0.5, 1.28])


def collect_humanoid(
    n_episodes: int = 1,
    out_dir: str = "data",
    seed: int = 0,
    max_steps: int = 10000,
    goal_threshold: float = 0.15,
    save: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
    task_name: str = "humanoid_collect",
):
    """Goal-gated humanoid episode collection. `shard_index`/`num_shards`
    shard episodes across processes/hosts (replacing the 150-run sequential
    reference src/run.sh) — episode i runs on shard i % num_shards."""
    from ..physics import forward

    results = []
    runner = None
    for ep in range(n_episodes):
        if ep % num_shards != shard_index:
            continue
        rng = np.random.default_rng(seed + ep * 7919)
        if runner is None:
            runner = EpisodeRunner(task_name)
        model = runner.model
        goal = random_humanoid_goal(rng)
        running, terminal = runner.spec.cost_factory(model, target=tuple(goal))
        # rebuild the controller with this episode's goal
        runner = EpisodeRunner(task_name,
                               cost_kwargs_override={"target": tuple(goal)})
        qpos, qvel = randomize_humanoid_pose(model, rng)
        init = forward(model, jnp.asarray(qpos), jnp.asarray(qvel))

        id_l = model.body_id("foot_left")
        id_r = model.body_id("foot_right")

        def state_row(st):
            return np.concatenate([
                np.asarray(st.qpos), np.asarray(st.qvel),
                [float(st.xpos[id_l, 2]), float(st.xpos[id_r, 2])],
            ])

        def goal_fn(qpos_np):
            xy = np.linalg.norm(qpos_np[0:2] - goal[0:2])
            return xy < goal_threshold and abs(qpos_np[2] - goal[2]) < 0.1

        res = runner.run(max_steps=max_steps, init_state=init,
                         seed=seed + ep, state_row_fn=state_row,
                         goal_fn=goal_fn)
        if save and res.goal_reached:
            # reference saves ONLY successful episodes (:268-275)
            res.logger.save_split_dirs(out_dir)
        results.append((ep, res.goal_reached, res.steps))
    return results


# ---------------------------------------------------------------------------
# Quadruped collection (reference src/quadruped_datacollection.py:207-260)
# ---------------------------------------------------------------------------

def collect_quadruped(
    n_runs: int = 100,
    out_base: str = "quad_data_goal",
    seed: int = 0,
    max_steps: int = 5000,
    goal_tolerance: float = 0.5,
    fall_z: float = 0.08,
    save: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
):
    results = []
    runner = None
    for i in range(n_runs):
        if i % num_shards != shard_index:
            continue
        goal_xy = (i + 2.0, 0.0)
        runner = EpisodeRunner("go1_collect",
                               cost_kwargs_override={"goal_xy": goal_xy})

        def goal_fn(qpos_np):
            dist = np.linalg.norm(qpos_np[0:2] - np.asarray(goal_xy))
            return dist < goal_tolerance or qpos_np[0] >= goal_xy[0]

        def fall_fn(qpos_np):
            return qpos_np[2] < fall_z

        res = runner.run(max_steps=max_steps, seed=seed + i,
                         goal_fn=goal_fn, fall_fn=fall_fn)
        if save and res.goal_reached:
            run_dir = os.path.join(out_base, f"run_{i:03d}")
            res.logger.save_run_dir(run_dir)
        results.append((i, res.goal_reached, res.steps))
    return results
