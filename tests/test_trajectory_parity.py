"""Matched-noise trajectory parity vs the reference MPPI loop.

BASELINE.md target: "reproduce reference MPPI control sequences on cartpole
and humanoid within tolerance at matched horizon/noise parameters". The
noise-stream contract (SURVEY.md §7): one recorded perturbation field per
control step is fed to BOTH

  * `CartpoleOracle` — a faithful numpy+MuJoCo-C reimplementation of the
    reference update loop (reference src/cartpole_mppi.py:56-107: fresh
    MjData per sample, mj_forward re-init, cost on the post-step state with
    the stored (unclamped) ctrl, accumulate update, shift with 0.1 tail
    decay, column-major (nu, T, K) noise), and
  * our solver (`make_mppi(...)` with the injected-noise plan argument),

and the resulting control sequences must match step-for-step. Cartpole runs
the full closed loop with each side stepping its own plant (MuJoCo C vs our
engine) — so the measured deviation also bounds engine drift. The humanoid
case runs our engine on both sides (MuJoCo-C humanoid contact parity has its
own tolerance ladder, tests/test_physics_parity.py) and checks the update
math/layout at reference K/T.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.envs.tasks import load_task
from humanoid_mppi_rl_tpu.solver.mppi import MPPIState, make_mppi, rollout_costs

mujoco = pytest.importorskip("mujoco")

ASSETS = os.path.join(os.path.dirname(__file__), "..",
                      "humanoid_mppi_rl_tpu", "assets")


class CartpoleOracle:
    """Reference loop, re-expressed: numpy update math over MuJoCo-C rollouts."""

    def __init__(self, K=30, T=100, lam=1.0, sigma=1.0, tail=0.1):
        self.model = mujoco.MjModel.from_xml_path(
            os.path.join(ASSETS, "cartpole.xml"))
        self.data = mujoco.MjData(self.model)
        self.data.qpos[:] = [0.0, np.pi]     # pole down (src/cartpole_mppi.jl:128)
        mujoco.mj_forward(self.model, self.data)
        self.K, self.T, self.lam, self.tail = K, T, lam, tail
        self.nu = self.model.nu
        self.U = np.zeros((self.nu, T))

    @staticmethod
    def running_cost(x_pos, theta, x_vel, theta_vel, ctrl0):
        # reference src/cartpole_mppi.py:44-50
        return (1.0 * x_pos ** 2
                + 20.0 * (np.cos(theta) - 1.0) ** 2
                + 0.1 * x_vel ** 2
                + 0.1 * theta_vel ** 2
                + 0.01 * ctrl0 ** 2)

    def rollout(self, noise):
        costs = np.zeros(self.K)
        # does any sample engage the slider joint limit (|x| = 1 m)? those
        # replans compare constraint-solver models, not solver math — the
        # caller conditions its tolerance on this flag
        self.last_limit_hit = False
        for k in range(self.K):
            d = mujoco.MjData(self.model)
            d.qpos[:] = self.data.qpos
            d.qvel[:] = self.data.qvel
            mujoco.mj_forward(self.model, d)
            c = 0.0
            for t in range(self.T):
                d.ctrl[:] = self.U[:, t] + noise[:, t, k]
                mujoco.mj_step(self.model, d)
                if abs(d.qpos[0]) > 0.995:
                    self.last_limit_hit = True
                # cost reads the STORED ctrl (not range-clamped; MuJoCo clamps
                # only inside the actuator computation) — reference :73-78
                c += self.running_cost(d.qpos[0], d.qpos[1],
                                       d.qvel[0], d.qvel[1], d.ctrl[0])
            # terminal = 10 x running at zero ctrl on the final state (:52-53)
            c += 10.0 * self.running_cost(d.qpos[0], d.qpos[1],
                                          d.qvel[0], d.qvel[1], 0.0)
            costs[k] = c
        return costs

    def control_step(self, noise):
        """One mppi_controller call + plant mj_step; returns the action."""
        costs = self.rollout(noise)
        beta = costs.min()
        w = np.exp(-(costs - beta) / self.lam)
        w /= w.sum()
        for t in range(self.T):  # reference's explicit per-t loop (:96-98)
            self.U[:, t] += sum(w[k] * noise[:, t, k] for k in range(self.K))
        action = self.U[:, 0].copy()
        self.data.ctrl[:] = action
        mujoco.mj_step(self.model, self.data)
        self.U[:, :-1] = self.U[:, 1:]
        self.U[:, -1] = self.tail * self.U[:, -2]
        return action


def test_cartpole_control_sequence_matches_reference_loop():
    """200 steps: our jitted solver == the numpy+MuJoCo oracle, same noise.

    The oracle runs its own full closed-loop episode; at every step our
    solver is handed the oracle's (plant state, plan U, noise) and must
    reproduce its control. This is the strongest well-posed parity claim:
    the loop is chaotic (measured per-control-step deviation amplification
    ~1.3x during swing-up), so ANY two implementations differing by one
    machine epsilon fully decorrelate within ~80 carried steps — asserting
    free-running equality would test chaos, not code.

    Tolerance is conditioned on constraint activity only for provenance:
    with the primal Newton constraint solver (physics/newton.py) both
    classes now match to machine precision — clean replans measured
    1.8e-12 over 109, limit-engaging replans 1.3e-12 over 91 (the
    pre-Newton dual PGS tier deviated up to 6.1e-2 on limit-active
    replans; the cheap penalty planning tier gives O(1) there, which is
    why this harness plans on the coupled tier). Engine drift is also
    measured on a free-running shadow plant over the first 50 steps."""
    n_steps = 200
    spec, model, _dyn_pen, running, terminal, init_state, cfg = load_task("cartpole")
    assert (cfg.K, cfg.T, cfg.temperature, cfg.sigma) == (30, 100, 1.0, 1.0)

    from humanoid_mppi_rl_tpu.dynamics.physics import make_physics_dynamics
    from humanoid_mppi_rl_tpu.physics.engine import forward

    dynamics = make_physics_dynamics(model, solver="coupled")
    oracle = CartpoleOracle(cfg.K, cfg.T, cfg.temperature, cfg.sigma, cfg.tail_decay)
    plan = jax.jit(make_mppi(dynamics, running, cfg, terminal_fn=terminal))
    step1 = jax.jit(lambda s, u: dynamics(s, u, jnp.asarray(0)))
    sync = jax.jit(lambda qp, qv: forward(model, qp, qv))

    free_state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float64), init_state)
    np.testing.assert_allclose(np.asarray(free_state.qpos), oracle.data.qpos)

    rng = np.random.default_rng(1234)
    du_clean, du_limit, drift_50 = 0.0, 0.0, 0.0
    n_clean = 0
    key = jax.random.PRNGKey(0)
    for i in range(n_steps):
        noise = rng.normal(size=(model.nu, cfg.T, cfg.K)) * cfg.sigma
        state = sync(jnp.asarray(oracle.data.qpos), jnp.asarray(oracle.data.qvel))
        ms = MPPIState(U=jnp.asarray(oracle.U.T), key=key)  # same plan in
        action, ms, _ = plan(ms, state, noise=jnp.asarray(noise.transpose(2, 1, 0)))
        ref_action = oracle.control_step(noise)
        du = float(np.max(np.abs(np.asarray(action) - ref_action)))
        if oracle.last_limit_hit:
            du_limit = max(du_limit, du)
            assert du < 1e-9, f"step {i} (limit-active): control deviates by {du}"
        else:
            n_clean += 1
            du_clean = max(du_clean, du)
            assert du < 1e-9, f"step {i} (clean): control deviates by {du}"
        if i < 50:
            free_state = step1(free_state, jnp.asarray(ref_action))
            drift_50 = max(drift_50, float(np.max(np.abs(
                np.asarray(free_state.qpos) - oracle.data.qpos))))
    assert n_clean >= n_steps // 3, f"only {n_clean} clean replans"
    assert drift_50 < 1e-3, f"50-step free-run drift {drift_50}"
    print(f"cartpole parity: clean max|du|={du_clean:.3e} over {n_clean} replans,"
          f" limit-active max|du|={du_limit:.3e} over {n_steps - n_clean},"
          f" free-run drift@50={drift_50:.3e}")


class NumpyUpdateOracle:
    """The reference update math (weights/accumulate/shift, (nu,T,K) layout)
    in plain numpy over costs from our engine — isolates solver parity from
    contact-physics parity for the humanoid case."""

    def __init__(self, dynamics, running, terminal, cfg, nu):
        self.cfg, self.nu = cfg, nu
        self.U = np.zeros((nu, cfg.T))
        self._costs = jax.jit(
            lambda s, U, eps: rollout_costs(
                dynamics, running, terminal, cfg, s, U, eps))

    def control_step(self, state, noise):
        costs = np.asarray(self._costs(
            state, jnp.asarray(self.U.T), jnp.asarray(noise.transpose(2, 1, 0))))
        beta = costs.min()
        w = np.exp(-(costs - beta) / self.cfg.temperature)
        w /= w.sum()
        for t in range(self.cfg.T):
            self.U[:, t] += noise[:, t, :] @ w
        action = self.U[:, 0].copy()
        self.U[:, :-1] = self.U[:, 1:]
        self.U[:, -1] = self.cfg.tail_decay * self.U[:, -2]
        return action


def test_humanoid_control_sequence_matches_reference_update():
    """Humanoid v3 at reference K=30, T=75: our solver == the numpy update
    oracle (our engine both sides), 15 closed-loop control steps."""
    n_steps = 15
    spec, model, dynamics, running, terminal, init_state, cfg = load_task("humanoid_v3")
    assert (cfg.K, cfg.T) == (30, 75)

    plan = jax.jit(make_mppi(dynamics, running, cfg, terminal_fn=terminal))
    step1 = jax.jit(lambda s, u: dynamics(s, u, jnp.asarray(0)))
    oracle = NumpyUpdateOracle(dynamics, running, terminal, cfg, model.nu)

    state = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float64), init_state)

    rng = np.random.default_rng(7)
    max_du = 0.0
    key = jax.random.PRNGKey(0)
    for i in range(n_steps):
        noise = rng.normal(size=(model.nu, cfg.T, cfg.K)) * cfg.sigma
        # plan synced each step: per-replan comparison (carried-U deviation
        # is pure summation-order eps amplified by contact dynamics — chaos,
        # not code; see the cartpole docstring)
        ms = MPPIState(U=jnp.asarray(oracle.U.T), key=key)
        action, ms, _ = plan(ms, state, noise=jnp.asarray(noise.transpose(2, 1, 0)))
        ref_action = oracle.control_step(state, noise)
        du = float(np.max(np.abs(np.asarray(action) - ref_action)))
        max_du = max(max_du, du)
        assert du < 1e-9, f"step {i}: control deviates by {du}"
        state = step1(state, jnp.asarray(ref_action))
    print(f"humanoid update parity: max|du|={max_du:.3e}")
