"""Mesh-sharded Pallas-kernel MPPI on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.envs.tasks import load_task
from humanoid_mppi_rl_tpu.ops.kernel_costs import KERNEL_COSTS
from humanoid_mppi_rl_tpu.parallel.mesh import make_mesh, make_sharded_kernel_mppi
from humanoid_mppi_rl_tpu.solver.mppi import MPPIState


def test_sharded_kernel_mppi_cartpole():
    assert len(jax.devices()) >= 8
    spec, model, dyn, run, term, init, cfg = load_task("cartpole")
    cfg = dataclasses.replace(cfg, n_samples=32, horizon=5)
    init = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), init)
    mesh = make_mesh(8)
    plan = make_sharded_kernel_mppi(
        model, KERNEL_COSTS["cartpole"], cfg, mesh, block_k=4)
    ms = MPPIState.init(jax.random.PRNGKey(0), cfg.T, model.nu)
    a, ms2, diag = plan(ms, init)
    assert np.isfinite(float(a[0]))
    assert np.isfinite(float(diag.beta))
    assert 1.0 <= float(diag.ess) <= cfg.K + 1e-3
    # determinism across calls with the same key
    a2, _, _ = plan(MPPIState.init(jax.random.PRNGKey(0), cfg.T, model.nu), init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
