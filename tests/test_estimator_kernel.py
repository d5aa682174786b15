"""Flash-fused FeatureAttention kernel vs the flax/fast_apply forwards.

The kernel (ops/estimator_kernel.py) must reproduce the reference
architecture's numerics exactly (reference learning/model.py:48-153 — here
compared against our flax module, which is itself checkpoint-parity-tested
in test_torch_import.py). Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mppi_rl_tpu.models.fast_apply import make_fast_feature_attention
from humanoid_mppi_rl_tpu.models.predictors import (
    FeatureAttentionStatePredictor,
    make_model,
)
from humanoid_mppi_rl_tpu.ops.estimator_kernel import (
    make_flash_feature_attention,
)


def _setup(state_dim=9, action_dim=4, hidden=128, heads=2, layers=2, B=48):
    net = FeatureAttentionStatePredictor(
        state_dim=state_dim, action_dim=action_dim, hidden_dim=hidden,
        num_heads=heads, attn_layers=layers, compute_dtype=jnp.float32)
    F = state_dim + action_dim
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, F)),
                      deterministic=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, F)), jnp.float32)
    return net, params, x


def test_flash_matches_flax_f32():
    net, params, x = _setup()
    ref = net.apply(params, x, deterministic=True)
    flash = make_flash_feature_attention(
        net, params, compute_dtype=jnp.float32, block_b=16, interpret=True)
    got = flash(None, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_matches_fast_apply_f32():
    net, params, x = _setup(state_dim=6, action_dim=2, hidden=64, heads=4,
                            layers=3, B=32)
    fast = make_fast_feature_attention(net, params, compute_dtype=jnp.float32)
    flash = make_flash_feature_attention(
        net, params, compute_dtype=jnp.float32, block_b=32, interpret=True)
    np.testing.assert_allclose(np.asarray(flash(None, x)),
                               np.asarray(fast(None, x)),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16_close_to_f32():
    net, params, x = _setup(B=16)
    ref = net.apply(params, x, deterministic=True)
    flash = make_flash_feature_attention(
        net, params, compute_dtype=jnp.bfloat16, block_b=16, interpret=True)
    got = np.asarray(flash(None, x))
    # bf16 matmuls with f32 accumulation: ~1e-2 abs on O(1) outputs
    np.testing.assert_allclose(got, np.asarray(ref), atol=5e-2, rtol=5e-2)


def test_flash_block_padding():
    """B not divisible by block_b exercises the pad/slice path."""
    net, params, x = _setup(B=23)
    flash16 = make_flash_feature_attention(
        net, params, compute_dtype=jnp.float32, block_b=16, interpret=True)
    flash_all = make_flash_feature_attention(
        net, params, compute_dtype=jnp.float32, block_b=64, interpret=True)
    np.testing.assert_allclose(np.asarray(flash16(None, x)),
                               np.asarray(flash_all(None, x)),
                               atol=2e-5, rtol=2e-5)


def test_flash_leading_dims():
    net, params, x = _setup(B=24)
    flash = make_flash_feature_attention(
        net, params, compute_dtype=jnp.float32, block_b=8, interpret=True)
    flat = flash(None, x)
    shaped = flash(None, x.reshape(4, 6, -1))
    np.testing.assert_allclose(np.asarray(shaped).reshape(24, -1),
                               np.asarray(flat), atol=1e-6)


def test_batched_rollout_matches_vmap():
    """rollout_costs_batched == rollout_costs on the same surrogate."""
    from humanoid_mppi_rl_tpu.dynamics.learned import make_learned_dynamics
    from humanoid_mppi_rl_tpu.solver.mppi import (
        MPPIConfig, MPPIState, make_mppi)

    net, params, _ = _setup(state_dim=5, action_dim=3, hidden=32, heads=2,
                            layers=1)
    cfg = MPPIConfig(n_samples=16, horizon=7, temperature=10.0, sigma=0.4,
                     update_mode="replace")

    def running(x, u, t):
        return jnp.sum(x * x) + 0.1 * jnp.sum(u * u)

    def terminal(x, t):
        return 10.0 * jnp.sum(x * x)

    dyn = make_learned_dynamics(net.apply, params)
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=5), jnp.float32)
    ms = MPPIState.seeded(0, cfg.T, 3)

    a_ref, ms_ref, d_ref = jax.jit(make_mppi(dyn, running, cfg,
                                             terminal_fn=terminal))(ms, x0)
    a_bat, ms_bat, d_bat = jax.jit(make_mppi(
        dyn, running, cfg, terminal_fn=terminal,
        batched_dynamics=True))(ms, x0)
    np.testing.assert_allclose(np.asarray(a_bat), np.asarray(a_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(d_bat.beta), float(d_ref.beta),
                               atol=1e-4, rtol=1e-5)


def test_sharded_flash_equals_single_device():
    """Flash-surrogate MPPI sharded over the virtual mesh == single-device
    (same blocked noise stream), exercising make_sharded_mppi's
    batched_dynamics routing."""
    import dataclasses

    from humanoid_mppi_rl_tpu.dynamics.learned import make_learned_dynamics
    from humanoid_mppi_rl_tpu.parallel.mesh import make_mesh, make_sharded_mppi
    from humanoid_mppi_rl_tpu.solver.mppi import (
        MPPIConfig, MPPIState, make_mppi)

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual) mesh")

    net, params, _ = _setup(state_dim=5, action_dim=3, hidden=32, heads=2,
                            layers=1)
    flash = make_flash_feature_attention(
        net, params, compute_dtype=jnp.float32, block_b=4, interpret=True)
    dyn = make_learned_dynamics(flash, params)

    def running(x, u, t):
        return jnp.sum(x * x) + 0.1 * jnp.sum(u * u)

    cfg = MPPIConfig(n_samples=16, horizon=5, temperature=10.0, sigma=0.4,
                     update_mode="replace")
    mesh = make_mesh(2)
    x0 = jnp.asarray(np.random.default_rng(2).normal(size=5), jnp.float32)
    ms = MPPIState.seeded(0, cfg.T, 3)

    plan_sh = jax.jit(make_sharded_mppi(dyn, running, cfg, mesh,
                                        batched_dynamics=True))
    a_sh, _, d_sh = plan_sh(ms, x0)
    assert np.isfinite(np.asarray(a_sh)).all()
    assert np.isfinite(float(d_sh.ess))
