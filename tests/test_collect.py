"""Collection-driver tests (tiny sizes, generic solver path on CPU):
goal-gated saving semantics, CSV layouts, episode sharding."""

import glob
import os

import numpy as np
import pytest

from humanoid_mppi_rl_tpu.collect.runner import (
    EpisodeRunner,
    collect_humanoid,
    collect_quadruped,
    randomize_humanoid_pose,
    random_humanoid_goal,
)

TINY = {"n_samples": 8, "horizon": 4}


def test_quadruped_collect_runs_and_layout(tmp_path):
    out = str(tmp_path / "quad")
    # trivial goal at the start position -> goal reached immediately -> saved
    res = collect_quadruped(n_runs=1, out_base=out, max_steps=6,
                            goal_tolerance=1e9, save=True)
    assert res == [(0, True, 1)]
    run_dir = os.path.join(out, "run_000")
    states = np.loadtxt(os.path.join(run_dir, "states.csv"), delimiter=",", ndmin=2)
    actions = np.loadtxt(os.path.join(run_dir, "actions.csv"), delimiter=",", ndmin=2)
    assert states.shape[1] == 19 + 18     # qpos + qvel (reference layout)
    assert actions.shape[1] == 12


def test_humanoid_collect_gating_and_layout(tmp_path, monkeypatch):
    import humanoid_mppi_rl_tpu.collect.runner as runner_mod

    out = str(tmp_path / "hum")
    # goal never reached within 4 steps -> nothing saved (reference
    # src/Humanoid_datacollection_v2.jl:268-275 semantics)
    res = collect_humanoid(n_episodes=1, out_dir=out, max_steps=4,
                           mppi_override=TINY)
    assert res == [(0, False, 4)]
    assert glob.glob(os.path.join(out, "*", "*.csv")) == []

    # force goal reached -> saved with the 57-col foot-height layout
    res = collect_humanoid(n_episodes=1, out_dir=out, max_steps=4,
                           goal_threshold=1e9, mppi_override=TINY)
    assert res[0][1] is True
    sfiles = glob.glob(os.path.join(out, "states_ft", "*.csv"))
    assert len(sfiles) == 1
    states = np.loadtxt(sfiles[0], delimiter=",", ndmin=2)
    assert states.shape[1] == 28 + 27 + 2


def test_episode_sharding_partitions_episodes():
    r0 = collect_humanoid(n_episodes=4, max_steps=2, save=False,
                          shard_index=0, num_shards=2, mppi_override=TINY)
    r1 = collect_humanoid(n_episodes=4, max_steps=2, save=False,
                          shard_index=1, num_shards=2, mppi_override=TINY)
    assert [e for e, *_ in r0] == [0, 2]
    assert [e for e, *_ in r1] == [1, 3]


def test_pose_and_goal_randomization_distributions():
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf

    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    model = build_from_mjcf(asset)
    rng = np.random.default_rng(0)
    for _ in range(20):
        qpos, qvel = randomize_humanoid_pose(model, rng)
        # reference bounds: xy +-0.2, joints +-0.05, vel +-0.05
        assert abs(qpos[0] - model.qpos0[0]) <= 0.2 + 1e-9
        assert np.abs(qpos[7:] - model.qpos0[7:]).max() <= 0.05 + 1e-9
        assert np.abs(qvel).max() <= 0.05 + 1e-9
        g = random_humanoid_goal(rng)
        assert 0.5 <= g[0] <= 2.5 and -0.5 <= g[1] <= 0.5 and g[2] == 1.28
