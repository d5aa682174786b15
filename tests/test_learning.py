"""Learning-stack tests: dataset semantics, training convergence on a tiny
synthetic dynamics problem, orbax checkpoint roundtrip, estimator-MPPI smoke
(the reference's only checks were manual notebook replays — SURVEY.md §4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mppi_rl_tpu.learning.data import MultiTrajectoryDataset
from humanoid_mppi_rl_tpu.learning.train import (
    PRESET_CONFIGS,
    TrainConfig,
    load_checkpoint,
    train_model,
)


@pytest.fixture(scope="module")
def toy_dataset_dirs(tmp_path_factory):
    """Synthetic linear dynamics x' = A x + B u + noise, several CSVs."""
    root = tmp_path_factory.mktemp("toydata")
    sdir, adir = root / "states", root / "actions"
    sdir.mkdir(), adir.mkdir()
    rng = np.random.default_rng(0)
    A = np.eye(4) + 0.05 * rng.normal(size=(4, 4))
    B = 0.1 * rng.normal(size=(4, 1))
    for traj in range(4):
        x = rng.normal(size=4)
        xs, us = [], []
        for t in range(60):
            u = rng.normal(size=1)
            xs.append(x.copy())
            us.append(u.copy())
            x = A @ x + B[:, 0] * u[0]
        np.savetxt(sdir / f"traj{traj}.csv", np.stack(xs), delimiter=",")
        np.savetxt(adir / f"traj{traj}.csv", np.stack(us), delimiter=",")
    return str(sdir), str(adir)


def test_dataset_delta_semantics(toy_dataset_dirs):
    sdir, adir = toy_dataset_dirs
    ds = MultiTrajectoryDataset(sdir, adir, return_type="delta", eval_split=0.2)
    assert ds.inputs.shape[1] == 5          # 4 state + 1 action
    assert ds.targets.shape[1] == 4
    # pairs never cross trajectories: 4 * (60-1)
    assert len(ds) == 4 * 59
    chk = ds.sanity_check()
    assert chk["nan_inputs"] == 0 and chk["n_trajectories"] == 4


def test_dataset_state_idxes_and_raw(toy_dataset_dirs):
    sdir, adir = toy_dataset_dirs
    ds = MultiTrajectoryDataset(sdir, adir, return_type="raw",
                                state_idxes=[0, 2])
    assert ds.inputs.shape[1] == 3
    assert ds.targets.shape[1] == 2


def test_train_loop_converges_and_checkpoints(toy_dataset_dirs, tmp_path):
    sdir, adir = toy_dataset_dirs
    cfg = TrainConfig(model_preset="cartpole_attention", lr=3e-3, epochs=14,
                      batch_size=32, ckpt_dir=str(tmp_path / "ckpt"),
                      ckpt_every=0, eval_split=0.2)
    out = train_model(sdir, adir, cfg)
    assert out["best_eval_loss"] < 0.08, out["best_eval_loss"]
    assert os.path.exists(out["best_checkpoint"])
    # checkpoint roundtrip
    restored = load_checkpoint(out["best_checkpoint"], out["params"])
    leaves1 = jax.tree_util.tree_leaves(out["params"])
    # best != final params in general; just check structure + finite values
    leaves2 = jax.tree_util.tree_leaves(restored)
    assert len(leaves1) == len(leaves2)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves2)


def test_estimator_mppi_smoke(toy_dataset_dirs, tmp_path):
    """Tiny estimator loop: learned cartpole surrogate driving MPPI over the
    engine plant (reference src/cartpole_mppi_estimator.py pattern)."""
    from humanoid_mppi_rl_tpu.collect.estimator import EstimatorRunner
    from humanoid_mppi_rl_tpu.costs.cartpole import make_costs_flat
    from humanoid_mppi_rl_tpu.models.predictors import make_model
    from humanoid_mppi_rl_tpu.solver.mppi import MPPIConfig

    model = make_model("cartpole_attention", hidden_dim=16, attn_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    running, terminal = make_costs_flat()
    cfg = MPPIConfig(n_samples=32, horizon=10, temperature=10.0, sigma=0.5,
                     update_mode="replace")
    asset = os.path.join(os.path.dirname(__file__), "..",
                         "humanoid_mppi_rl_tpu", "assets", "cartpole.xml")
    runner = EstimatorRunner(asset, model.apply, params, cfg, running, terminal)
    log = runner.run(n_steps=5, init_qpos=np.array([0.0, np.pi]))
    s, a, t = log.arrays()
    assert s.shape == (5, 4) and a.shape == (5, 1)
    assert np.isfinite(s).all()


def test_train_resume_roundtrip(toy_dataset_dirs, tmp_path):
    """A run checkpointed at epoch N resumes from state_last and continues
    from epoch N+1 with optimizer state intact (the reference only has a
    commented-out resume line, learning/train.py:78)."""
    import json

    sdir, adir = toy_dataset_dirs
    ck = str(tmp_path / "ck")
    cfg = TrainConfig(model_preset="cartpole_attention", lr=3e-3, epochs=4,
                      batch_size=32, ckpt_dir=ck, ckpt_every=4,
                      eval_split=0.2, log_path=str(tmp_path / "m1.jsonl"))
    out1 = train_model(sdir, adir, cfg)
    last = os.path.join(ck, "state_last")
    assert os.path.exists(last)

    cfg2 = TrainConfig(model_preset="cartpole_attention", lr=3e-3, epochs=6,
                       batch_size=32, ckpt_dir=ck, ckpt_every=0,
                       eval_split=0.2, resume_from=last,
                       log_path=str(tmp_path / "m2.jsonl"))
    out2 = train_model(sdir, adir, cfg2)
    events = [json.loads(l) for l in open(tmp_path / "m2.jsonl")]
    assert events[0]["kind"] == "resume" and events[0]["epoch"] == 4
    # only epochs 4..5 ran in the resumed job
    epochs = [e["epoch"] for e in events if e["kind"] == "epoch"]
    assert epochs == [4, 5]
    assert np.isfinite(out2["best_eval_loss"]) and np.isfinite(
        out1["best_eval_loss"])


def test_loss_curve_png(toy_dataset_dirs, tmp_path):
    """plot_path writes the train/eval loss-curve PNG (reference
    learning/train_quadruped.py:172-187)."""
    sdir, adir = toy_dataset_dirs
    png = str(tmp_path / "loss.png")
    cfg = TrainConfig(model_preset="cartpole_attention", epochs=2,
                      batch_size=32, ckpt_dir=str(tmp_path / "ck"),
                      eval_split=0.2, plot_path=png)
    train_model(sdir, adir, cfg)
    import importlib.util
    if importlib.util.find_spec("matplotlib"):
        assert os.path.exists(png) and os.path.getsize(png) > 1000


def test_train_scanned_epochs_converges(toy_dataset_dirs, tmp_path):
    """scan_epochs=True (one device program per epoch) trains to the same
    quality as the host-loop path on the toy linear system."""
    sdir, adir = toy_dataset_dirs
    cfg = TrainConfig(model_preset="cartpole_attention", lr=3e-3, epochs=14,
                      batch_size=32, ckpt_dir=str(tmp_path / "ckpt_scan"),
                      ckpt_every=0, eval_split=0.2, scan_epochs=True)
    out = train_model(sdir, adir, cfg)
    assert out["best_eval_loss"] < 0.08, out["best_eval_loss"]
    assert os.path.exists(out["best_checkpoint"])


def test_rollout_k_training_runs_and_improves(tmp_path):
    """Multi-step rollout loss (TrainConfig.rollout_k): the scanned trainer
    composes x + net(x, u) for k steps against true windows — the training
    contract that attacks the measured one-step-compounding ceiling
    (PERF.md 'the surrogate ceiling')."""
    import json

    from humanoid_mppi_rl_tpu.learning.train import TrainConfig, train_model

    rng = np.random.default_rng(0)
    A = np.eye(4) * 0.95 + 0.02 * rng.normal(size=(4, 4))
    B = 0.1 * rng.normal(size=(4, 1))
    (tmp_path / "states").mkdir()
    (tmp_path / "actions").mkdir()
    for t in range(4):
        x = rng.normal(size=4)
        xs, us = [], []
        for _ in range(100):
            u = rng.normal(size=1)
            xs.append(x.copy())
            us.append(u)
            x = A @ x + B @ u
        np.savetxt(tmp_path / "states" / f"t{t}.csv", np.asarray(xs),
                   delimiter=",")
        np.savetxt(tmp_path / "actions" / f"t{t}.csv", np.asarray(us),
                   delimiter=",")

    cfg = TrainConfig(model_preset="cartpole_attention", lr=3e-4, epochs=6,
                      batch_size=32, ckpt_dir=str(tmp_path / "ck"),
                      scan_epochs=True, rollout_k=3,
                      log_path=str(tmp_path / "m.jsonl"))
    res = train_model(str(tmp_path / "states"), str(tmp_path / "actions"), cfg)
    assert np.isfinite(res["best_eval_loss"])
    epochs = [json.loads(l) for l in open(tmp_path / "m.jsonl")
              if json.loads(l).get("kind") == "epoch"]
    assert len(epochs) == 6
    # the k-step rollout loss must actually train down
    assert epochs[-1]["train_loss"] < epochs[0]["train_loss"]


def test_rollout_k_requires_delta_and_scan(tmp_path):
    from humanoid_mppi_rl_tpu.learning.data import MultiTrajectoryDataset
    from humanoid_mppi_rl_tpu.learning.train import TrainConfig, train_model

    (tmp_path / "states").mkdir()
    (tmp_path / "actions").mkdir()
    np.savetxt(tmp_path / "states" / "t.csv", np.zeros((10, 4)), delimiter=",")
    np.savetxt(tmp_path / "actions" / "t.csv", np.zeros((10, 1)), delimiter=",")
    with pytest.raises(ValueError, match="delta"):
        MultiTrajectoryDataset(str(tmp_path / "states"),
                               str(tmp_path / "actions"),
                               return_type="raw", rollout_k=3)
    with pytest.raises(ValueError, match="scan_epochs"):
        train_model(str(tmp_path / "states"), str(tmp_path / "actions"),
                    TrainConfig(model_preset="cartpole_attention", epochs=1,
                                rollout_k=3, scan_epochs=False,
                                ckpt_dir=str(tmp_path / "ck")))
