"""End-to-end pipeline demo: MPPI data collection -> dynamics learning ->
estimator MPPI (the full reference workflow: src/*_datacollection.* ->
learning/train*.py -> src/*_mppi_estimator.py), at demo sizes.

Run on TPU:   python scripts/e2e_pipeline.py
Env knobs:    E2E_TASK (default go1_collect), E2E_EPISODES, E2E_STEPS,
              E2E_EPOCHS, E2E_K
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from humanoid_mppi_rl_tpu.collect.estimator import (
        ESTIMATOR_CONFIGS,
        EstimatorRunner,
        quadruped_estimator_costs,
    )
    from humanoid_mppi_rl_tpu.collect.runner import EpisodeRunner
    from humanoid_mppi_rl_tpu.learning.train import TrainConfig, train_model
    from humanoid_mppi_rl_tpu.models.predictors import make_model

    task = os.environ.get("E2E_TASK", "go1_collect")
    n_ep = int(os.environ.get("E2E_EPISODES", "3"))
    n_steps = int(os.environ.get("E2E_STEPS", "250"))
    epochs = int(os.environ.get("E2E_EPOCHS", "10"))
    K = int(os.environ.get("E2E_K", "1024"))
    out = os.environ.get("E2E_OUT", "/tmp/e2e_demo")
    use_kernel = jax.default_backend() != "cpu"

    # --- 1. collect --------------------------------------------------------
    t0 = time.time()
    runner = EpisodeRunner(task, mppi_override={"n_samples": K},
                           use_kernel=use_kernel)
    sdir = os.path.join(out, "states")
    adir = os.path.join(out, "actions")
    for ep in range(n_ep):
        res = runner.run(max_steps=n_steps, seed=ep, chunk=50)
        s, a, t = res.logger.arrays()
        os.makedirs(sdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        from humanoid_mppi_rl_tpu.utils.trajio import write_csv

        write_csv(os.path.join(sdir, f"ep{ep}.csv"), s)
        write_csv(os.path.join(adir, f"ep{ep}.csv"), a)
        print(f"[collect] episode {ep}: {res.steps} steps, "
              f"final qpos[0:3]={np.round(res.final_qpos[:3], 3)}")
    print(f"[collect] done in {time.time()-t0:.0f}s")

    # --- 2. train surrogate ------------------------------------------------
    t0 = time.time()
    nq_nv = s.shape[1]
    nu = a.shape[1]
    cfg = TrainConfig(
        model_preset="quadruped_attention" if "go1" in task else "humanoid_attention",
        lr=3e-4, epochs=epochs, batch_size=64,
        ckpt_dir=os.path.join(out, "ckpt"), ckpt_every=0,
    )
    result = train_model(sdir, adir, cfg)
    print(f"[train] best eval loss {result['best_eval_loss']:.5f} "
          f"({result['n_pairs']} pairs) in {time.time()-t0:.0f}s")

    # --- 3. estimator MPPI on the learned surrogate ------------------------
    t0 = time.time()
    model = result["model"]
    params = result["params"]
    running, terminal = quadruped_estimator_costs()
    ecfg = ESTIMATOR_CONFIGS["quadruped"]
    import dataclasses

    ecfg = dataclasses.replace(ecfg, n_samples=min(2048, K))
    est = EstimatorRunner(runner.spec.asset_path(), model.apply, params,
                          ecfg, running, terminal)
    log = est.run(n_steps=50)
    s2, a2, t2 = log.arrays()
    print(f"[estimator] 50 control steps on the surrogate in "
          f"{time.time()-t0:.0f}s; plant finite={np.isfinite(s2).all()}, "
          f"final root x={s2[-1,0]:.3f}")
    print("E2E PIPELINE OK")


if __name__ == "__main__":
    main()
