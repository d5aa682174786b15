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
    stalled: bool = False  # aborted by the progress watchdog (no
    # goal-distance improvement over stall_steps control steps)


class EpisodeRunner:
    """One robot + cost + MPPI config, reusable across episodes."""

    def __init__(self, task_name: str, seed: int = 0,
                 cost_kwargs_override: Optional[dict] = None,
                 mppi_override: Optional[dict] = None,
                 use_kernel: bool = False,
                 block_k: int = 1024,
                 planner_solver: Optional[str] = None):
        """`planner_solver="coupled"` plans rollouts on the full coupled
        constraint tier instead of the default decoupled penalty tier —
        expensive (array engine, no Pallas kernel) but planner==plant, for
        tasks where the penalty tier's contact approximation is the failure
        mode (hard hopper landings, round-3 PERF.md)."""
        spec, model, dynamics, running, terminal, init_state, cfg = load_task(task_name)
        if planner_solver is not None and planner_solver != "penalty":
            if use_kernel:
                raise ValueError("kernel path implements the penalty tier "
                                 "only; coupled planning is array-engine")
            from ..dynamics.physics import make_physics_dynamics
            dynamics = make_physics_dynamics(model, solver=planner_solver)
        kw = dict(spec.cost_kwargs)
        if cost_kwargs_override:
            kw.update(cost_kwargs_override)
            running, terminal = spec.cost_factory(model, **kw)
        if mppi_override:
            cfg = dataclasses.replace(cfg, **mppi_override)
        self.spec, self.model, self.cfg = spec, model, cfg
        self.dynamics = dynamics
        self.init_state = init_state
        self.seed = seed

        # environment plant: full-fidelity coupled tier + body-body contacts
        # (the reference's plant is MuJoCo itself; planner rollouts keep the
        # cheap penalty tier — PARITY.md "fidelity tiers")
        from ..envs.tasks import load_plant
        self.plant_model, plant_dyn = load_plant(task_name, init_state)

        if use_kernel:
            # planning rollouts through the fused Pallas kernel
            from ..ops.kernel_costs import KERNEL_COSTS
            from ..solver.kernel_mppi import make_kernel_mppi

            if spec.kernel_cost is None:
                raise ValueError(f"task {task_name} has no kernel cost")
            _plan0 = make_kernel_mppi(
                model, KERNEL_COSTS[spec.kernel_cost], cfg,
                cost_kwargs=kw, block_k=min(block_k, cfg.K))
            plan = lambda ms, plant, p: _plan0(ms, plant, params=p)
        else:
            _plan1 = make_mppi(dynamics, running, cfg, terminal_fn=terminal)
            plan = lambda ms, plant, p: _plan1(ms, plant)

        def control_step(ms, plant, params):
            action, ms, diag = plan(ms, plant, params)
            new_plant = plant_dyn(plant, action, jnp.asarray(0))
            return action, ms, new_plant, diag

        self.control_step = jax.jit(
            lambda ms, plant, params=None: control_step(ms, plant, params))
        self._plan = plan
        self.use_kernel = use_kernel
        self._chunk_cache = {}

    def fresh_controller(self, seed: Optional[int] = None) -> MPPIState:
        return MPPIState.seeded(self.seed if seed is None else seed,
                                self.cfg.T, self.model.nu)

    def _build_chunk_fn(self, chunk, state_row_fn, goal_fn, fall_fn,
                        plant_update_fn=None, params_update_fn=None):
        """Scan `chunk` control steps on device, logging rows/flags into
        stacked device arrays — ONE host transfer per chunk instead of
        several per step (host readbacks are expensive, especially through
        a remote-device tunnel). goal_fn/fall_fn take (qpos, params) so a
        changing episode goal does NOT retrigger compilation; the compiled
        chunk fn is cached per (chunk, fns) identity."""
        key = (chunk, state_row_fn, goal_fn, fall_fn, plant_update_fn,
               params_update_fn)
        cached = self._chunk_cache.get(key)
        if cached is not None:
            return cached
        control = self.control_step

        def one(carry, _):
            ms, plant, params = carry
            row = (state_row_fn(plant) if state_row_fn
                   else jnp.concatenate([plant.qpos, plant.qvel]))
            action, ms2, plant2, _ = control(ms, plant, params)
            if plant_update_fn is not None:
                # post-step plant-state mutation hook (e.g. the v2.py
                # goal-advance, which rewrites the target carried in the
                # augmented plant state)
                plant2 = plant_update_fn(plant2, params)
            if params_update_fn is not None:
                # post-step runtime-parameter mutation hook (e.g. the
                # v1 .jl goal-advance, which rewrites the kernel-cost goal
                # carried in params) — per control step, on device
                params = params_update_fn(plant2, params)
            goal = (goal_fn(plant2.qpos, params) if goal_fn is not None
                    else jnp.asarray(False))
            fell = (fall_fn(plant2.qpos, params) if fall_fn is not None
                    else jnp.asarray(False))
            # pack everything into ONE row so the host does a single fetch
            # per chunk (each device->host transfer through a remote tunnel
            # costs ~seconds regardless of size)
            packed = jnp.concatenate([
                row, action, plant.time[None],
                goal.astype(row.dtype)[None], fell.astype(row.dtype)[None],
            ])
            return (ms2, plant2, params), packed

        def run_chunk(ms, plant, params):
            (ms, plant, params), packed = jax.lax.scan(
                one, (ms, plant, params), None, length=chunk)
            return ms, plant, params, packed

        fn = jax.jit(run_chunk)
        self._chunk_cache[key] = fn
        return fn

    def run(
        self,
        max_steps: int = 1000,
        init_state=None,
        seed: Optional[int] = None,
        state_row_fn: Optional[Callable] = None,
        goal_fn: Optional[Callable] = None,
        fall_fn: Optional[Callable] = None,
        logger: Optional[TrajectoryLogger] = None,
        params=None,
        chunk: int = 50,
        plant_update_fn: Optional[Callable] = None,
        params_update_fn: Optional[Callable] = None,
        metrics_path: Optional[str] = None,
        per_chunk_callback: Optional[Callable] = None,
        stall_steps: Optional[int] = None,
        stall_min_progress: float = 0.05,
    ) -> EpisodeResult:
        """state_row_fn(plant)->jnp row; goal_fn/fall_fn(qpos, params)->bool
        jnp — all evaluated on device (scanned in chunks). `params` is a
        16-slot f32 vector (layout: ops.kernel_costs.PARAM_SLOTS) carrying
        episode-varying quantities (goals, gait deltas, solver scales) so
        repeated runs reuse the compiled chunk. `metrics_path` appends a
        JSONL event per chunk (replan latency, control steps/s — the
        observability the reference lacks, SURVEY.md §5).
        `per_chunk_callback(plant)` runs host-side after every chunk — with
        chunk=1 this is a per-step hook (the live viewer mirror,
        viz/live.py).

        `stall_steps` arms a progress watchdog: if the root's xy distance to
        the goal carried in params[0:2] has not improved by at least
        `stall_min_progress` meters over the last `stall_steps` control
        steps, the episode is abandoned (EpisodeResult.stalled) — a failed
        humanoid episode otherwise burns the full max_steps of K-sample
        replans (round-3 VERDICT weak-6: 54/80 episodes ran the 2,500-step
        cap for 2/3 of collection wall clock)."""
        import time as _time

        from ..utils.metrics import JSONLWriter

        plant = self.init_state if init_state is None else init_state
        plant = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), plant)
        ms = self.fresh_controller(seed)
        params = np.zeros(16, np.float32) if params is None else np.asarray(params)
        if params.shape[0] > 16:
            raise ValueError(
                f"params has {params.shape[0]} slots; the kernel cost param "
                f"vector is at most 16 (ops.kernel_costs.PARAM_SLOTS)")
        params = jnp.asarray(np.pad(params.astype(np.float32),
                                    (0, 16 - params.shape[0])))
        log = logger if logger is not None else TrajectoryLogger()
        run_chunk = self._build_chunk_fn(chunk, state_row_fn, goal_fn, fall_fn,
                                         plant_update_fn, params_update_fn)
        met = JSONLWriter(metrics_path)

        nu = self.model.nu
        goal = fell = stalled = False
        steps = 0
        best_dist = np.inf
        steps_since_best = 0
        while steps < max_steps:
            n = min(chunk, max_steps - steps)
            t_chunk = _time.perf_counter()
            ms, plant, params, packed = run_chunk(ms, plant, params)
            packed = np.asarray(packed)          # ONE host fetch per chunk
            dt_chunk = _time.perf_counter() - t_chunk
            met.write(kind="chunk", task=self.spec.name, steps=n,
                      wall_s=dt_chunk, replan_ms=dt_chunk / n * 1e3,
                      steps_per_s=n / dt_chunk, K=self.cfg.K, T=self.cfg.T)
            rows = packed[:, :-(nu + 3)]
            actions = packed[:, -(nu + 3):-3]
            times = packed[:, -3]
            goals = packed[:, -2] > 0.5
            falls = packed[:, -1] > 0.5
            # find first termination inside the chunk
            stop = n
            for i in range(n):
                if falls[i]:
                    fell, stop = True, i + 1
                    break
                if goals[i]:
                    goal, stop = True, i + 1
                    break
            for i in range(stop):
                log.log(rows[i], actions[i], float(times[i]))
            steps += stop
            if per_chunk_callback is not None:
                per_chunk_callback(plant)
            if goal or fell:
                break
            if stall_steps:
                qp = np.asarray(plant.qpos)
                pv = np.asarray(params)
                dist = float(np.linalg.norm(qp[0:2] - pv[0:2]))
                if dist < best_dist - stall_min_progress:
                    best_dist, steps_since_best = dist, 0
                else:
                    steps_since_best += stop
                if steps_since_best >= stall_steps:
                    stalled = True
                    break
        met.write(kind="episode", task=self.spec.name, steps=steps,
                  goal=bool(goal), fell=bool(fell), stalled=bool(stalled))
        met.close()
        return EpisodeResult(
            steps=steps, goal_reached=goal, fell=fell,
            final_qpos=np.asarray(plant.qpos), logger=log,
            sim_time=float(plant.time), stalled=stalled,
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


import functools


@functools.lru_cache(maxsize=None)
def _humanoid_state_row(id_l: int, id_r: int):
    def state_row(st):
        # 57-col layout (reference src/Humanoid_datacollection_v2.jl:70-81)
        return jnp.concatenate([
            st.qpos, st.qvel,
            st.xpos[id_l, 2][None], st.xpos[id_r, 2][None],
        ])
    return state_row


@functools.lru_cache(maxsize=None)
def _humanoid_goal_fn(goal_threshold: float):
    def goal_fn(qpos, params):
        xy = jnp.linalg.norm(qpos[0:2] - params[0:2])
        return (xy < goal_threshold) & (jnp.abs(qpos[2] - params[2]) < 0.1)
    return goal_fn


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
    use_kernel: bool = False,
    mppi_override: Optional[dict] = None,
    retries: int = 0,
    metrics_path: Optional[str] = None,
    stall_steps: Optional[int] = 800,
    stall_min_progress: float = 0.05,
):
    """Goal-gated humanoid episode collection. `shard_index`/`num_shards`
    shard episodes across processes/hosts (replacing the 150-run sequential
    reference src/run.sh) — episode i runs on shard i % num_shards. With
    use_kernel=True the per-episode goal is a runtime kernel parameter, so
    the compiled controller is reused across all episodes. `retries` re-runs
    a failed (goal-not-reached) episode with a reseeded noise stream up to
    that many extra times — episode-level failure recovery (the reference
    just discards failures, src/Humanoid_datacollection_v2.jl:268-275)."""
    from ..physics import forward

    results = []
    cost_kw = {"param_target": True} if use_kernel else None
    runner = EpisodeRunner(task_name, use_kernel=use_kernel,
                           cost_kwargs_override=cost_kw,
                           mppi_override=mppi_override)
    model = runner.model
    id_l = model.body_id("foot_left")
    id_r = model.body_id("foot_right")
    # jitted init FK (eager per-op execution is disastrous on remote devices)
    fwd_j = jax.jit(lambda qp, qv: forward(model, qp, qv))

    for ep in range(n_episodes):
        if ep % num_shards != shard_index:
            continue
        rng = np.random.default_rng(seed + ep * 7919)
        goal = random_humanoid_goal(rng)
        if not use_kernel:
            # jnp-cost path: goal baked in, recompiles per episode
            runner = EpisodeRunner(task_name,
                                   cost_kwargs_override={"target": tuple(goal)},
                                   mppi_override=mppi_override)
        qpos, qvel = randomize_humanoid_pose(model, rng)
        init = fwd_j(jnp.asarray(qpos, jnp.float32),
                     jnp.asarray(qvel, jnp.float32))

        steps_executed = 0
        attempts = 0
        for attempt in range(retries + 1):
            res = runner.run(max_steps=max_steps, init_state=init,
                             seed=seed + ep + attempt * 65537,
                             state_row_fn=_humanoid_state_row(id_l, id_r),
                             goal_fn=_humanoid_goal_fn(goal_threshold),
                             params=goal, metrics_path=metrics_path,
                             stall_steps=stall_steps,
                             stall_min_progress=stall_min_progress)
            steps_executed += res.steps
            attempts += 1
            if res.goal_reached:
                break
        if save and res.goal_reached:
            # reference saves ONLY successful episodes (:268-275)
            res.logger.save_split_dirs(out_dir)
        # strict accounting (see collect_quadruped): steps_executed counts
        # every executed control step across retry attempts
        results.append(dict(
            run=ep, goal=bool(res.goal_reached), steps_saved=int(res.steps),
            steps_executed=int(steps_executed), attempts=int(attempts),
            outcome=("goal" if res.goal_reached else
                     ("fell" if res.fell else
                      ("stalled" if res.stalled else "cap")))))
    return results


@functools.lru_cache(maxsize=None)
def _jl_goal_advance(goal_step=(1.0, 0.0), threshold: float = 0.15):
    """Reference src/Humanoid_datacollection.jl:181-185 goal-advance: every
    control step with the torso xy within `threshold` of the goal increments
    a counter and sets Position = counter * goal_step. params layout:
    [goal_x, goal_y, goal_z, counter, ...]."""
    sx, sy = float(goal_step[0]), float(goal_step[1])

    def params_update(plant, params):
        near = jnp.linalg.norm(plant.qpos[0:2] - params[0:2]) < threshold
        counter = params[3] + near.astype(params.dtype)
        return params.at[0].set(counter * sx).at[1].set(counter * sy) \
                     .at[3].set(counter)

    return params_update


def collect_humanoid_jl(
    n_episodes: int = 1,
    out_dir: str = "data",
    seed: int = 0,
    max_steps: int = 10000,
    goal_threshold: float = 0.15,
    save: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
    use_kernel: bool = True,
    mppi_override: Optional[dict] = None,
    metrics_path: Optional[str] = None,
    chunk: int = 50,
):
    """Reference src/Humanoid_datacollection.jl driver: v3 cost at K=75,
    sigma=0.5, default stand init (pose randomization is a v2 feature), and
    an ADVANCING goal — Position starts (1, 0); each control step with the
    torso xy within `goal_threshold` increments a counter and re-targets
    Position = counter * (1, 0) (:14-17,181-185 — including the reference
    quirk that the first "reach" leaves the goal at (1,0)). Logs 55-col
    [qpos; qvel] rows and saves unconditionally into
    ``out_dir/<timestamp>/{states,actions,times}.csv`` (:29-30,194-212).

    Runs through the Pallas kernel path by default so the advancing goal is
    a runtime cost parameter evaluated on device each step (use_kernel=False
    falls back to the jnp cost with the goal FIXED at (1,0,1.28) — the
    advance then only moves the logged params, documented deviation)."""
    from datetime import datetime

    results = []
    cost_kw = {"param_target": True} if use_kernel else {"target": (1.0, 0.0, 1.28)}
    runner = EpisodeRunner("humanoid_collect_jl", use_kernel=use_kernel,
                           cost_kwargs_override=cost_kw,
                           mppi_override=mppi_override)
    advance = _jl_goal_advance((1.0, 0.0), goal_threshold)

    for ep in range(n_episodes):
        if ep % num_shards != shard_index:
            continue
        params = np.array([1.0, 0.0, 1.28, 0.0], np.float32)
        res = runner.run(max_steps=max_steps, seed=seed + ep,
                         params=params, params_update_fn=advance,
                         metrics_path=metrics_path, chunk=chunk)
        if save:
            ts = datetime.now().strftime("%Y-%m-%d_%H%M%S") + f"_{ep:03d}"
            res.logger.save_run_dir(os.path.join(out_dir, ts))
        results.append((ep, res.steps))
    return results


@functools.lru_cache(maxsize=None)
def _v2py_state_row(inv_dt: float):
    def state_row(st):
        # 56-col layout: [qpos; (qpos - prev_qpos)/dt] — the reference logs
        # an FD velocity ESTIMATE of qpos (nq-sized, not qvel!) in place of
        # qvel (reference src/Humanoid_datacollection_v2.py:68-83). First row
        # has prev == qpos (init) -> zeros, like the reference's None guard.
        vel = (st.phys.qpos - st.prev_qpos) * inv_dt
        return jnp.concatenate([st.phys.qpos, vel])
    return state_row


def _v2py_plant_update(plant, params):
    from ..costs.humanoid import advance_goal_v2py
    return advance_goal_v2py(plant)


def collect_humanoid_v2py(
    n_episodes: int = 1,
    out_dir: str = "data",
    seed: int = 0,
    max_steps: int = 2000,
    save: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
    mppi_override: Optional[dict] = None,
):
    """Reference src/Humanoid_datacollection_v2.py driver: FD-velocity
    logging (56-col states), hysteresis gait phase threaded across control
    steps, TWO replans per executed action, runtime goal-advance
    (Position += [2,0,0] within 0.15 of the full 3D goal), unconditional
    save at episode end into data/<timestamp>/{states,actions,times}.csv.

    Deviations (documented): the reference logs 3 rows per plant step (twice
    inside mppi_controller, once after mj_step — an artifact that duplicates
    timestamps); we log once per control step. The reference episode only
    ends when the viewer closes; we run ``max_steps``.
    """
    from datetime import datetime

    results = []
    runner = EpisodeRunner("humanoid_collect_v2py",
                           mppi_override=mppi_override)
    inv_dt = 1.0 / runner.model.timestep

    for ep in range(n_episodes):
        if ep % num_shards != shard_index:
            continue
        res = runner.run(max_steps=max_steps, seed=seed + ep,
                         state_row_fn=_v2py_state_row(inv_dt),
                         plant_update_fn=_v2py_plant_update)
        if save:
            ts = datetime.now().strftime("%Y-%m-%d_%H%M%S") + f"_{ep:03d}"
            res.logger.save_run_dir(os.path.join(out_dir, ts))
        results.append((ep, res.steps))
    return results


# ---------------------------------------------------------------------------
# Quadruped collection (reference src/quadruped_datacollection.py:207-260)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _quad_goal_fn(goal_tolerance: float):
    def goal_fn(qpos, params):
        dist = jnp.linalg.norm(qpos[0:2] - params[0:2])
        return (dist < goal_tolerance) | (qpos[0] >= params[0])
    return goal_fn


@functools.lru_cache(maxsize=None)
def _quad_fall_fn(fall_z: float):
    def fall_fn(qpos, params):
        return qpos[2] < fall_z
    return fall_fn


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
    use_kernel: bool = False,
    mppi_override: Optional[dict] = None,
    block_k: int = 1024,
    metrics_path: Optional[str] = None,
    chunk: int = 50,
    stall_steps: Optional[int] = 1500,
    stall_min_progress: float = 0.05,
    gait_params: Optional[np.ndarray] = None,
    goal_for_run: Optional[Callable] = None,
    retries: int = 0,
):
    """Reference src/quadruped_datacollection.py:207-260: the multi-goal Go1
    driver — goal for run i at (i+2, 0), fall abort below trunk z=0.08,
    per-run save dirs, only reached goals kept.

    With use_kernel=True the planner rollouts run through the fused Pallas
    kernel and the goal is carried in the runtime cost params
    (ops.kernel_costs.quadruped param_goal), so ALL runs share ONE compiled
    program — the reference re-ran its whole script per goal.

    `gait_params` (slots 4..12, see ops.kernel_costs.quadruped param_gait)
    adds runtime gait-shaping deltas; costs/quadruped.GAIT_TUNED is the
    sweep-selected setting that trots at reference speed on our planner
    tier (the zero default reproduces the reference cost verbatim, which
    belly-crawls against the penalty planner — scripts/dev_quad_gait.py)."""
    results = []
    kw = {"param_goal": True} if use_kernel else None
    if use_kernel and gait_params is not None:
        kw = {"param_goal": True, "param_gait": True}
    runner = None
    for i in range(n_runs):
        if i % num_shards != shard_index:
            continue
        # reference ladder: goal for run i at (i+2, 0) — its committed data
        # is nonetheless all run_000/run_001 (goal x=2, reached at x~1.5)
        # because the trot is metastable at every scale; goal_for_run lets
        # the pipeline match that committed distribution (cycling near
        # goals) instead of burning attempts on 20 m targets
        goal_xy = (i + 2.0, 0.0) if goal_for_run is None else goal_for_run(i)
        if use_kernel:
            if runner is None:
                runner = EpisodeRunner(
                    "go1_collect", cost_kwargs_override=kw,
                    use_kernel=True, block_k=block_k,
                    mppi_override=mppi_override)
        else:
            # array path bakes the goal into the cost closure (recompiles
            # per goal — kept for the small-K parity configuration)
            runner = EpisodeRunner("go1_collect",
                                   cost_kwargs_override={"goal_xy": goal_xy},
                                   mppi_override=mppi_override)

        params = np.asarray(goal_xy, np.float32)
        if gait_params is not None:
            params = np.concatenate([
                params, np.zeros(2, np.float32),
                np.asarray(gait_params, np.float32)])
        steps_executed = 0   # across ALL attempts — the strict accounting
        attempts = 0
        fell = stalled = False
        for attempt in range(retries + 1):
            res = runner.run(max_steps=max_steps,
                             seed=seed + i + attempt * 65537,
                             goal_fn=_quad_goal_fn(goal_tolerance),
                             fall_fn=_quad_fall_fn(fall_z),
                             params=params, chunk=chunk,
                             metrics_path=metrics_path,
                             stall_steps=stall_steps,
                             stall_min_progress=stall_min_progress)
            steps_executed += res.steps
            attempts += 1
            fell, stalled = res.fell, res.stalled
            if res.goal_reached:
                break
        if save and res.goal_reached:
            run_dir = os.path.join(out_base, f"run_{i:03d}")
            res.logger.save_run_dir(run_dir)
        # steps_executed counts EVERY executed control step across retry
        # attempts so wall-clock throughput summaries are strict (r4
        # VERDICT weak-3/4: the old final-attempt-only count understated
        # executed work by 2x); steps_saved is the successful attempt's
        # row count (== the saved CSV length)
        results.append(dict(
            run=i, goal=bool(res.goal_reached), steps_saved=int(res.steps),
            steps_executed=int(steps_executed), attempts=int(attempts),
            outcome=("goal" if res.goal_reached else
                     ("fell" if fell else
                      ("stalled" if stalled else "cap")))))
    return results
