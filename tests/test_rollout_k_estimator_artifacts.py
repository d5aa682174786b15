"""Committed round-5 humanoid estimator evidence (r4 VERDICT item 1: run
the loop on the rollout_k surrogate).

artifacts/rollout_k_surrogate/ holds the multi-step-rollout-loss
checkpoint (trained r4, exercised r5), the closed-loop trajectory planned
on it with the FK-reconstructed full-state walking cost
(collect/estimator.humanoid_fk_estimator_costs), and the measured control
chain (estimator_summary.json): the position-only estimator cost fails on
TRUE dynamics, the FK cost walks there, and the surrogate loop reaches
about half the truth-ceiling rate with K-invariance showing the model —
not the planner — is now the binding constraint. PERF.md "Estimator
closed loop round 5" documents the narrative.
"""

import json
import os

import numpy as np
import pytest

DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "rollout_k_surrogate")


def _summary():
    path = os.path.join(DIR, "estimator_summary.json")
    if not os.path.exists(path):
        pytest.skip("rollout_k estimator artifacts not committed")
    with open(path) as f:
        return json.load(f)


def test_rollout_k_ckpt_open_loop_sanity_recorded():
    s = _summary()["open_loop"]
    # the r4 one-step ckpt drifted predicted foot height 0.93 m in 0.25 s
    # open-loop; the rollout_k ckpt is 80x saner
    assert s["zero_action_foot_drift_m_50steps"] < 0.05
    assert s["r3_one_step_ckpt_baseline_m"] > 0.5
    # real-action replay reproduces true foot ranges within 2x
    for pred, true in s["real_action_replay_foot_range_pred_vs_true"]:
        assert pred < 2.5 * true + 0.01, (pred, true)


def test_closed_loop_walks_forward_upright():
    """BEHAVIOR gate (r4 weak-2 pattern): forward progress AND upright —
    the r4 loop either stood (0.105 m) or sagged; this one must beat both
    on the committed trajectory."""
    s = _summary()["closed_loop"]
    data = np.load(os.path.join(DIR, "estimator_fk_k8192_t25.npz"))
    states = data["states"]
    assert states.shape[0] >= 120
    assert np.isfinite(states).all()
    x_prog = float(states[-1, 0] - states[0, 0])
    assert x_prog > 0.14, x_prog                    # r4: 0.105 over FEWER steps
    assert float(states[:, 2].min()) > 1.1          # upright throughout
    rec = s["fk_cost_K8192_T25"]
    assert abs(x_prog - rec["x_progress_m"]) < 5e-3


def test_truth_controls_bracket_the_loop():
    """The committed control-experiment numbers must tell a consistent
    story: FK cost >> position-only cost on truth; the surrogate loop sits
    between the r4 baseline and the truth ceiling."""
    s = _summary()
    truth = s["truth_controls"]
    assert truth["walk_cost_K2048_T25_replace"]["x_progress_m"] > \
        2.5 * truth["position_only_estimator_cost_T25"]["x_progress_m"]
    loop = s["closed_loop"]
    assert loop["fk_cost_K2048_T25"]["x_progress_m"] > \
        loop["r4_baseline"]["x_progress_m"]
    # per-step rate below the truth ceiling (sanity: no impossible claim)
    rate_loop = loop["fk_cost_K8192_T25"]["x_progress_m"] / 120
    rate_truth = truth["walk_cost_K2048_T25_replace"]["x_progress_m"] / 240
    assert rate_loop < rate_truth + 1e-6
