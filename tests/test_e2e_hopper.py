"""End-to-end hopper demonstration (round-2 VERDICT weak-7; round-3 ask:
episode-long hopping, steps >= 2000 with recurring flight phases).

Two committed artifacts, both produced by scripts/dev_hopper.py on real TPU
hardware (kernel planner, coupled-tier plant):

- artifacts/hopper_k8192_h200.npz — ENDURANCE: H=200 (a full hop cycle of
  lookahead) + the hop-clock cost (param w_clock=50). 2,500 steps / 12.5 s
  with NO fall and 17 ballistic flight phases. The round-3 failure was
  horizon myopia, not the planner contact tier: the coupled-tier planner
  fell at the same ~2.5 s as the penalty kernel, while H=200 with a
  periodic height target survives indefinitely (PERF.md).
- artifacts/hopper_k4096.npz — SPEED CLIP: the round-3 best forward-travel
  config (H=100), 524 steps / 0.87 m at 0.34 m/s before mis-landing.
"""

import os
import sys

import numpy as np
import pytest

DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _load(name):
    path = os.path.join(DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not yet committed (produced on TPU by "
                    "scripts/dev_hopper.py)")
    return np.load(path)


def test_hopper_endurance_artifact():
    from dev_hopper import hop_metrics

    data = _load("hopper_k8192_h200.npz")
    rows, times = data["states"], data["times"]
    assert rows.shape[1] == 15          # qpos(7) + qvel(7) + foot_z
    m = hop_metrics(rows, times)
    assert m["nan_step"] is None, m
    assert m["steps"] >= 2000, m                   # episode-long (>= 10 s)
    assert m["torso_z_min"] > 0.55, m              # never collapses
    assert m["hops"] >= 10, m                      # recurring BALLISTIC
    # flight phases throughout (hop_metrics gates flight on free-fall
    # torso acceleration, not just foot height)
    assert m["hops_per_s"] > 0.8, m                # rhythmic, ~1.4 Hz
    assert m["flight_frac"] > 0.3, m


def test_hopper_speed_clip():
    from dev_hopper import hop_metrics

    data = _load("hopper_k4096.npz")
    m = hop_metrics(data["states"], data["times"])
    assert m["nan_step"] is None, m
    assert m["steps"] >= 400, m
    assert m["x_progress_m"] > 0.7, m              # real forward motion
    assert m["torso_z_min"] > 0.44, m


def test_hopper_artifact_actions_bounded():
    data = _load("hopper_k8192_h200.npz")
    acts = data["actions"]
    assert acts.shape[1] == 4
    assert np.isfinite(acts).all()
    # logged actions are the COMMANDED ctrl (the actuator model clamps to
    # ctrlrange +-1 internally, mujoco semantics)
    assert np.abs(acts).max() < 50.0
