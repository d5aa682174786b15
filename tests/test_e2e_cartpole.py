"""End-to-end cartpole swing-up (reference src/cartpole_mppi.py behavior):
starting pole-down (qpos=[0, pi]), MPPI with the reference hyperparameters
must bring the pole upright and keep the cart near the origin."""

import numpy as np

from humanoid_mppi_rl_tpu.collect.runner import EpisodeRunner


def test_cartpole_swingup():
    # K=256 (BASELINE.json PR1 scale) with the reference horizon T=100:
    # K=30 as in the reference is luck-of-the-seed in f64, 256 is robust
    runner = EpisodeRunner("cartpole", seed=0, mppi_override={"n_samples": 256})
    res = runner.run(max_steps=400)
    qp = res.logger.arrays()[0]
    theta = np.mod(qp[:, 1] + np.pi, 2 * np.pi) - np.pi
    assert np.abs(theta[-40:]).mean() < 0.15, "pole not upright"
    assert np.abs(qp[-1, 0]) < 0.5, "cart far from origin"
