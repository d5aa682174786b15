"""Mesh-sharded MPPI tests on the virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, set in conftest — the
standard stand-in for multi-chip TPU hardware, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.parallel.mesh import make_mesh, make_sharded_mppi
from humanoid_mppi_rl_tpu.solver.mppi import (
    MPPIConfig,
    MPPIState,
    mppi_weights,
    rollout_costs,
    weighted_noise_update,
)


def _dyn(state, u, t):
    pos, vel = state
    vel = vel + 0.1 * u[0]
    pos = pos + 0.1 * vel
    return (pos, vel)


def _cost(state, u, t):
    pos, vel = state
    return (pos - 1.0) ** 2 + 0.1 * vel**2 + 0.001 * u[0] ** 2


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_matches_manual_reduction(mesh8):
    """The psum-reduced update must equal the plain computation on the
    concatenated per-shard noise."""
    cfg = MPPIConfig(n_samples=64, horizon=12, temperature=0.5, sigma=0.4)
    plan = make_sharded_mppi(_dyn, _cost, cfg, mesh8)
    key = jax.random.PRNGKey(42)
    ms = MPPIState.init(key, cfg.T, nu=1)
    state = (jnp.asarray(0.0), jnp.asarray(0.0))
    action, ms2, diag = plan(ms, state)

    # rebuild the exact noise the sharded plan drew (per-shard folded keys)
    _, sub = jax.random.split(key)
    noise = []
    for i in range(8):
        k = jax.random.fold_in(sub, jnp.uint32(i))
        # must draw with the plan's dtype (U is f32) — the normal stream
        # differs per dtype
        noise.append(cfg.sigma * jax.random.normal(k, (8, cfg.T, 1),
                                                   dtype=jnp.float32))
    noise = jnp.concatenate(noise)
    costs = rollout_costs(_dyn, _cost, None, cfg, state, ms.U, noise)
    w, beta = mppi_weights(costs, cfg.temperature)
    expected_U = ms.U + weighted_noise_update(w, noise)
    np.testing.assert_allclose(np.asarray(action), np.asarray(expected_U[0]),
                               rtol=1e-5, atol=1e-7)
    assert abs(float(diag.beta) - float(beta)) < 1e-6


def test_sharded_mppi_solves_task(mesh8):
    cfg = MPPIConfig(n_samples=128, horizon=25, temperature=0.2, sigma=0.6,
                     terminal_scale=10.0)
    plan = jax.jit(make_sharded_mppi(_dyn, _cost, cfg, mesh8))
    ms = MPPIState.init(jax.random.PRNGKey(0), cfg.T, nu=1)
    state = (jnp.asarray(0.0), jnp.asarray(0.0))
    for _ in range(60):
        action, ms, diag = plan(ms, state)
        state = _dyn(state, jnp.atleast_1d(action), 0)
    assert abs(float(state[0]) - 1.0) < 0.15
    assert float(diag.ess) > 1.0


def test_sharded_deterministic(mesh8):
    cfg = MPPIConfig(n_samples=32, horizon=8, sigma=0.3)
    plan = make_sharded_mppi(_dyn, _cost, cfg, mesh8)
    s0 = (jnp.asarray(0.0), jnp.asarray(0.0))
    a1, _, _ = plan(MPPIState.init(jax.random.PRNGKey(9), cfg.T, 1), s0)
    a2, _, _ = plan(MPPIState.init(jax.random.PRNGKey(9), cfg.T, 1), s0)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_sharded_estimator_mppi(mesh8):
    """BASELINE config 5 shape: MPPI on a Flax surrogate with the K sample
    axis sharded over the mesh (make_sharded_mppi is dynamics-agnostic; the
    learned net's matmuls see the K_local batch on each shard)."""
    import dataclasses

    from humanoid_mppi_rl_tpu.collect.estimator import (
        ESTIMATOR_CONFIGS, quadruped_estimator_costs)
    from humanoid_mppi_rl_tpu.dynamics.learned import make_learned_dynamics
    from humanoid_mppi_rl_tpu.models.predictors import make_model

    net = make_model("quadruped_attention", hidden_dim=16, attn_layers=1,
                     num_heads=2)
    x0 = jnp.zeros((1, 37 + 12), jnp.float32)
    params = net.init(jax.random.PRNGKey(3), x0, deterministic=True)
    dyn = make_learned_dynamics(net.apply, params, state_slice=37)
    running, terminal = quadruped_estimator_costs()
    cfg = dataclasses.replace(ESTIMATOR_CONFIGS["quadruped"],
                              n_samples=16, horizon=4)
    plan = jax.jit(make_sharded_mppi(dyn, running, cfg, mesh8,
                                     terminal_fn=terminal))
    ms = MPPIState.init(jax.random.PRNGKey(4), cfg.T, 12)
    x = jnp.zeros(37, jnp.float32)
    action, ms2, diag = plan(ms, x)
    assert np.isfinite(np.asarray(action)).all()
    assert action.shape == (12,)
    # replace-mode update: U was zero, so the plan head is the weighted noise
    assert float(diag.ess) >= 1.0


def test_distributed_helpers_single_process():
    """maybe_initialize is a no-op without launcher env; episode_shard
    covers all episodes exactly once across shards (the run.sh replacement,
    reference src/run.sh:6-19)."""
    from humanoid_mppi_rl_tpu.parallel.distributed import (
        episode_shard, maybe_initialize, process_info)

    assert maybe_initialize() is False
    info = process_info()
    assert info["num_processes"] == 1 and info["process_id"] == 0
    owned = [list(episode_shard(10, shard_index=i, num_shards=3))
             for i in range(3)]
    flat = sorted(e for sh in owned for e in sh)
    assert flat == list(range(10))
    # default rank/size path (single process -> owns everything)
    assert list(episode_shard(4)) == [0, 1, 2, 3]
