"""Go1 golden-trajectory fidelity vs the reference's committed goal runs.

The reference commits 10 successful Go1 goal-reaching runs
(/root/reference/Humanoid_MPPI-RL/quad_data_goal/*/run_*/, written by
reference src/quadruped_datacollection.py:241-259). Logging is 2x per
control step (pre-step at :171, post-step at :231), so golden one-step
pairs are (states[2k], actions[2k]) -> states[2k+1]; the duplicate-row
structure (row 2k+1 == row 2k+2) is asserted.

MuJoCo C replays these chains with our assets/go1.xml at max 6.2e-9
(scripts/dev_go1_golden.py --mj), so every pair is a true golden pair for
the exact model this repo ships. Go1 exercises every constraint class the
humanoid golden does not: elliptic friction cones (cone="elliptic"
impratio="100", assets/go1.xml), condim=6 torsional+rolling friction on
the feet, dof frictionloss Huber rows on all 12 joints, and margin-active
contacts (margin=0.001) — all resolved by the primal Newton coupled tier
(physics/newton.py).

Measured ladder over all 10 runs / 16,240 golden pairs
(scripts/dev_go1_golden.py --ours): qpos median 1.7e-7, p90 4.9e-7,
max 1.7e-6; qvel median 8.7e-5, max 8.4e-4.
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_GLOB = "/root/reference/Humanoid_MPPI-RL/quad_data_goal/*/run_*"
ASSET = os.path.join(os.path.dirname(__file__), "..",
                     "humanoid_mppi_rl_tpu", "assets", "go1.xml")

# only runs with both CSVs committed (one run ships actions but its
# states CSV was stripped upstream)
RUNS = [r for r in sorted(glob.glob(REF_GLOB))
        if glob.glob(os.path.join(r, "states*.csv"))
        and glob.glob(os.path.join(r, "actions*.csv"))]

pytestmark = pytest.mark.skipif(
    not RUNS, reason="reference quad_data_goal runs not mounted")


def _load(run_dir):
    states = np.loadtxt(glob.glob(os.path.join(run_dir, "states*.csv"))[0],
                        delimiter=",")
    actions = np.loadtxt(glob.glob(os.path.join(run_dir, "actions*.csv"))[0],
                         delimiter=",")
    return states, actions


def _pairs(states, actions):
    npairs = (states.shape[0] - 1) // 2
    x0 = states[0 : 2 * npairs : 2]
    u = actions[0 : 2 * npairs : 2]
    x1 = states[1::2][:npairs]
    dup = states[1:-1:2][: npairs - 1] - states[2::2][: npairs - 1]
    return x0, u, x1, (np.abs(dup).max() if dup.size else 0.0)


def test_reference_layout():
    states, actions = _load(RUNS[0])
    assert states.shape[1] == 37      # 19 qpos + 18 qvel
    assert actions.shape[1] == 12
    *_, dup = _pairs(states, actions)
    assert dup == 0.0                 # exact pre/post duplicate structure


def test_one_step_prediction_vs_reference_go1_run():
    """Full one-step replay of the first committed goal run (1,397 golden
    pairs, every constraint class active: elliptic cones, condim-6 feet,
    frictionloss rows, knee-limit strikes during the initial fold)."""
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step

    mujoco = pytest.importorskip("mujoco")
    states, actions = _load(RUNS[0])
    x0, u, x1, _ = _pairs(states, actions)

    # golden-chain validity under MuJoCo C with OUR asset (spot-check a
    # prefix; the full-chain max over all runs is 6.2e-9)
    m = mujoco.MjModel.from_xml_path(ASSET)
    d = mujoco.MjData(m)
    for i in range(0, 50):
        d.qpos[:] = x0[i, :19]
        d.qvel[:] = x0[i, 19:]
        d.ctrl[:] = u[i]
        mujoco.mj_step(m, d)
        assert np.abs(np.concatenate([d.qpos, d.qvel]) - x1[i]).max() < 1e-7

    pm = build_from_mjcf(ASSET, include_self_collisions=True)
    step_c = jax.jit(jax.vmap(lambda a, b, c: step(
        pm, forward(pm, a, b), c).qpos))
    step_v = jax.jit(jax.vmap(lambda a, b, c: step(
        pm, forward(pm, a, b), c).qvel))
    qp = jnp.asarray(x0[:, :19])
    qv = jnp.asarray(x0[:, 19:])
    uu = jnp.asarray(u)
    err = np.abs(np.asarray(step_c(qp, qv, uu)) - x1[:, :19]).max(axis=1)
    verr = np.abs(np.asarray(step_v(qp, qv, uu)) - x1[:, 19:]).max(axis=1)
    # measured: qpos med 1.7e-7 / p90 4.8e-7 / max 1.3e-6 on this run
    assert np.median(err) < 1e-6, np.median(err)
    assert np.quantile(err, 0.9) < 2e-6, np.quantile(err, 0.9)
    assert err.max() < 1e-5, err.max()
    assert verr.max() < 5e-3, verr.max()


def test_one_step_prediction_all_runs_strided():
    """Stride-16 sweep over ALL 10 committed goal runs (~1,000 pairs) so
    every run's contact regimes are covered in CI."""
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward, step

    pm = build_from_mjcf(ASSET, include_self_collisions=True)
    step_c = jax.jit(jax.vmap(lambda a, b, c: step(
        pm, forward(pm, a, b), c).qpos))
    # one concatenated batch across runs -> a single compile + vmapped call
    X0, U, X1 = [], [], []
    for run in RUNS:
        states, actions = _load(run)
        x0, u, x1, _ = _pairs(states, actions)
        sl = slice(0, None, 16)
        X0.append(x0[sl])
        U.append(u[sl])
        X1.append(x1[sl])
    X0, U, X1 = np.concatenate(X0), np.concatenate(U), np.concatenate(X1)
    pred = np.asarray(step_c(jnp.asarray(X0[:, :19]),
                             jnp.asarray(X0[:, 19:]), jnp.asarray(U)))
    err = np.abs(pred - X1[:, :19]).max(axis=1)
    assert np.median(err) < 1e-6, np.median(err)
    assert err.max() < 1e-5, err.max()
