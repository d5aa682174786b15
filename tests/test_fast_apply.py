"""fast_apply == flax FeatureAttention apply (same params, same math)."""

import numpy as np

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.models.fast_apply import make_fast_feature_attention
from humanoid_mppi_rl_tpu.models.predictors import make_model


def test_fast_apply_matches_flax_f32():
    model = make_model("cartpole_attention")
    x0 = jnp.zeros((1, 5))
    params = model.init(jax.random.PRNGKey(3), x0)
    fast = make_fast_feature_attention(model, params,
                                       compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 5)),
                    jnp.float32)
    y_ref = np.asarray(model.apply(params, x, deterministic=True))
    y_fast = np.asarray(fast(None, x))
    np.testing.assert_allclose(y_fast, y_ref, atol=2e-5)


def test_fast_apply_reference_checkpoint_bf16():
    """bf16 fast path on the reference-trained weights stays within bf16
    resolution of the f32 flax forward."""
    import os

    import pytest

    pth = "/root/reference/checkpoints_cartpole/model_best.pth"
    if not os.path.exists(pth):
        pytest.skip("reference checkpoint absent")
    pytest.importorskip("torch")
    from humanoid_mppi_rl_tpu.learning.torch_import import load_reference_checkpoint

    model, params = load_reference_checkpoint(pth, "cartpole_attention")
    fast = make_fast_feature_attention(model, params,
                                       compute_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(64, 5)),
                    jnp.float32)
    y_ref = np.asarray(model.apply(params, x, deterministic=True))
    y_fast = np.asarray(fast(None, x))
    assert np.max(np.abs(y_fast - y_ref)) < 0.03 * max(1.0, np.abs(y_ref).max())


def test_fast_apply_under_vmap_scan():
    """The estimator shape: vmap over K of a scan over T."""
    from humanoid_mppi_rl_tpu.dynamics.learned import make_learned_dynamics

    model = make_model("cartpole_attention")
    x0 = jnp.zeros((1, 5))
    params = model.init(jax.random.PRNGKey(5), x0)
    fast = make_fast_feature_attention(model, params,
                                       compute_dtype=jnp.float32)
    dyn_fast = make_learned_dynamics(fast, params)
    dyn_ref = make_learned_dynamics(model.apply, params)

    def rollout(dyn, x, us):
        def body(c, u):
            c = dyn(c, u, 0)
            return c, c
        return jax.lax.scan(body, x, us)[1]

    K, T = 8, 6
    xs = jnp.asarray(np.random.default_rng(2).normal(size=(K, 4)), jnp.float32)
    us = jnp.asarray(np.random.default_rng(3).normal(size=(K, T, 1)), jnp.float32)
    r_fast = jax.vmap(lambda x, u: rollout(dyn_fast, x, u))(xs, us)
    r_ref = jax.vmap(lambda x, u: rollout(dyn_ref, x, u))(xs, us)
    np.testing.assert_allclose(np.asarray(r_fast), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-4)
