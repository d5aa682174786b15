"""Reference .pth checkpoint interop: torch state_dicts -> Flax params.

The reference's deployed estimator runs on trained torch weights
(reference src/cartpole_mppi_estimator.py:28-34); these tests prove the
committed artifacts load into our models with forward-pass equivalence and
drive the closed-loop estimator. torch (CPU) unpickles the tensors; the
reference repo supplies the ground-truth forward pass.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
CARTPOLE_PTH = os.path.join(REF, "checkpoints_cartpole", "model_best.pth")
CROSS_PTH = os.path.join(REF, "checkpoints", "model_cross.pth")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CARTPOLE_PTH),
    reason="reference checkpoints not present")


def _ref_module(name, *args, **kw):
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import learning.model as ref_model

    return getattr(ref_model, name)(*args, **kw)


def test_feature_attention_forward_parity():
    from humanoid_mppi_rl_tpu.learning.torch_import import load_reference_checkpoint

    model, params = load_reference_checkpoint(CARTPOLE_PTH, "cartpole_attention")
    tm = _ref_module("FeatureAttentionStatePredictor", 4, 1, 64, 4, 2)
    tm.load_state_dict(torch.load(CARTPOLE_PTH, map_location="cpu"))
    tm.eval()

    x = np.random.default_rng(0).normal(size=(32, 5)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.tensor(x)).numpy()
    y_ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-5)


def test_cross_attention_forward_parity():
    from humanoid_mppi_rl_tpu.learning.torch_import import load_reference_checkpoint

    model, params = load_reference_checkpoint(CROSS_PTH, "humanoid_cross")
    # deployed config: num_heads=4 (reference Visualization/vis.ipynb cell 4)
    tm = _ref_module("CrossAttentionStatePredictor", num_heads=4)
    tm.load_state_dict(torch.load(CROSS_PTH, map_location="cpu"))
    tm.eval()

    x = np.random.default_rng(1).normal(size=(16, 76)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.tensor(x)).numpy()
    y_ours = np.asarray(model.apply(params, jnp.asarray(x)))
    # outputs are O(40); f32 matmul-order noise scales with magnitude
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-3)


def test_mlp_importer_roundtrip():
    """Importer covers the MLP family too (random torch weights)."""
    from humanoid_mppi_rl_tpu.learning.torch_import import (
        load_torch_state_dict, mlp_params)
    from humanoid_mppi_rl_tpu.models.predictors import MLPStatePredictor

    tm = _ref_module("MLPStatePredictor", state_dim=6, action_dim=2,
                     hidden_dim=16, hidden_layers=2)
    tm.eval()
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(tm.state_dict(), f.name)
        sd = load_torch_state_dict(f.name)
    params = {"params": mlp_params(sd)}
    model = MLPStatePredictor(state_dim=6, action_dim=2, hidden_dim=16,
                              hidden_layers=2)
    x = np.random.default_rng(2).normal(size=(8, 8)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.tensor(x)).numpy()
    y_ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-5)


def test_estimator_runs_on_reference_weights():
    """Closed-loop estimator MPPI on the reference's trained cartpole
    checkpoint (CI-sized K; the full K=2048 swing-up result is recorded in
    PARITY.md)."""
    import dataclasses

    from humanoid_mppi_rl_tpu.collect.estimator import (
        ESTIMATOR_CONFIGS, EstimatorRunner)
    from humanoid_mppi_rl_tpu.costs import cartpole as cartpole_cost
    from humanoid_mppi_rl_tpu.learning.torch_import import load_reference_checkpoint

    model, params = load_reference_checkpoint(CARTPOLE_PTH, "cartpole_attention")
    cfg = dataclasses.replace(ESTIMATOR_CONFIGS["cartpole"],
                              n_samples=128, horizon=50)
    running, terminal = cartpole_cost.make_costs_flat()
    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "cartpole.xml")
    est = EstimatorRunner(asset, model.apply, params, cfg, running, terminal)
    log = est.run(n_steps=30, init_qpos=[0.0, np.pi])
    rows = np.asarray(log.states)
    assert rows.shape == (30, 4)
    assert np.isfinite(rows).all()
    # the controller is actually doing something (nonzero actions)
    assert np.abs(np.asarray(log.actions)).max() > 1e-3
