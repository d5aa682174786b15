"""MPPI solver-core unit tests: weight math, shift semantics, update modes,
and a closed-loop sanity problem — mirroring the reference update equations
(reference src/cartpole_mppi.py:88-107) against tiny closed-form cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.solver.mppi import (
    MPPIConfig,
    MPPIState,
    make_mppi,
    mppi_weights,
    rollout_costs,
    shift_plan,
    weighted_noise_update,
)


def test_weights_match_reference_formula():
    costs = jnp.asarray([3.0, 1.0, 2.0, 10.0])
    lam = 0.7
    w, beta = mppi_weights(costs, lam)
    ref = np.exp(-(np.asarray(costs) - 1.0) / lam)
    ref /= ref.sum()
    np.testing.assert_allclose(np.asarray(w), ref, rtol=1e-6)
    assert float(beta) == 1.0


def test_weighted_update_is_weighted_noise_sum():
    key = jax.random.PRNGKey(0)
    K, T, nu = 5, 7, 3
    noise = jax.random.normal(key, (K, T, nu))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (K,)))
    upd = weighted_noise_update(w, noise)
    ref = sum(float(w[k]) * np.asarray(noise[k]) for k in range(K))
    np.testing.assert_allclose(np.asarray(upd), ref, rtol=1e-5)


def test_shift_semantics_match_reference():
    """Reference: U[:, :-1] = U[:, 1:]; U[:, -1] = 0.1*U[:, -2] -- after the
    in-place shift, the new tail is 0.1 * the OLD last column."""
    U = jnp.arange(12.0).reshape(4, 3)  # (T=4, nu=3)
    out = shift_plan(U, 0.1)
    ref = np.asarray(U)
    ref = np.concatenate([ref[1:], 0.1 * ref[-1:]], axis=0)
    np.testing.assert_allclose(np.asarray(out), ref)


def _integrator_dynamics(state, u, t):
    # state = (pos, vel); dt = 0.1 double integrator
    pos, vel = state
    vel = vel + 0.1 * u[0]
    pos = pos + 0.1 * vel
    return (pos, vel)


def _integrator_cost(state, u, t):
    pos, vel = state
    return (pos - 1.0) ** 2 + 0.1 * vel**2 + 0.001 * u[0] ** 2


def test_rollout_costs_accumulate_post_step():
    cfg = MPPIConfig(n_samples=2, horizon=3, sigma=0.0)
    U = jnp.ones((3, 1))
    noise = jnp.zeros((2, 3, 1))
    costs = rollout_costs(
        _integrator_dynamics, _integrator_cost, None, cfg, (0.0, 0.0), U, noise
    )
    # manual rollout
    s, acc = (0.0, 0.0), 0.0
    for t in range(3):
        s = _integrator_dynamics(s, np.ones(1), t)
        acc += _integrator_cost(s, np.ones(1), t)
    np.testing.assert_allclose(np.asarray(costs), [acc, acc], rtol=1e-6)


def test_mppi_drives_double_integrator_to_target():
    cfg = MPPIConfig(n_samples=128, horizon=25, temperature=0.2, sigma=0.6,
                     terminal_scale=10.0)
    plan = make_mppi(_integrator_dynamics, _integrator_cost, cfg)
    plan = jax.jit(plan)
    ms = MPPIState.init(jax.random.PRNGKey(0), cfg.T, nu=1)
    state = (jnp.asarray(0.0), jnp.asarray(0.0))
    for _ in range(60):
        action, ms, diag = plan(ms, state)
        state = _integrator_dynamics(state, jnp.atleast_1d(action), 0)
    pos, vel = state
    assert abs(float(pos) - 1.0) < 0.15, f"pos={float(pos)}"
    assert float(diag.ess) > 1.0


def test_replace_update_mode():
    """Estimator scripts replace the plan instead of accumulating
    (reference src/cartpole_mppi_estimator.py:141-143)."""
    cfg = MPPIConfig(n_samples=16, horizon=4, sigma=0.5, update_mode="replace")
    plan = make_mppi(_integrator_dynamics, _integrator_cost, cfg)
    ms = MPPIState.init(jax.random.PRNGKey(3), cfg.T, nu=1)
    big = ms.replace(U=1e3 * jnp.ones_like(ms.U))
    action, ms2, _ = plan(big, (jnp.asarray(0.0), jnp.asarray(0.0)))
    # replaced plan is O(noise), not O(1e3)
    assert float(jnp.abs(ms2.U).max()) < 10.0


def test_determinism_same_key_same_trajectory():
    cfg = MPPIConfig(n_samples=32, horizon=10, sigma=0.5)
    plan = make_mppi(_integrator_dynamics, _integrator_cost, cfg)
    s0 = (jnp.asarray(0.0), jnp.asarray(0.0))
    a1, m1, _ = plan(MPPIState.init(jax.random.PRNGKey(5), cfg.T, 1), s0)
    a2, m2, _ = plan(MPPIState.init(jax.random.PRNGKey(5), cfg.T, 1), s0)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(m1.U), np.asarray(m2.U))


def test_double_replan_accumulates_two_updates_then_shifts_once():
    """replans_per_step=2 (reference src/Humanoid_datacollection_v2.py:303,315
    runs mppi_step twice, then executes + shifts once). With K=1 the softmax
    weight is exactly 1, so each pass adds its raw noise draw: final plan =
    shift(U0 + n1 + n2), action = (U0 + n1 + n2)[0]."""
    cfg = MPPIConfig(n_samples=1, horizon=4, sigma=0.3, replans_per_step=2)
    plan = make_mppi(_integrator_dynamics, _integrator_cost, cfg)
    key = jax.random.PRNGKey(7)
    U0 = 0.5 * jnp.ones((cfg.T, 1))
    ms = MPPIState(U=U0, key=key)
    action, ms2, _ = plan(ms, (jnp.asarray(0.0), jnp.asarray(0.0)))

    k = key
    k, s1 = jax.random.split(k)
    n1 = 0.3 * jax.random.normal(s1, (1, cfg.T, 1))
    k, s2 = jax.random.split(k)
    n2 = 0.3 * jax.random.normal(s2, (1, cfg.T, 1))
    U_expect = U0 + n1[0] + n2[0]
    np.testing.assert_allclose(np.asarray(action), np.asarray(U_expect[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ms2.U),
                               np.asarray(shift_plan(U_expect, cfg.tail_decay)),
                               rtol=1e-5)
