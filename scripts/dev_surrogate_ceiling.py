"""Measured ceiling of the humanoid surrogate for multi-step planning
(round-3 VERDICT weak-3 'make the self-trained surrogate walk' — the
alternative done-criterion: a measured data-distribution analysis proving
the ceiling).

Rolls the round-3 self-trained FeatureAttention(30,21,512,8,7) checkpoint
open-loop from the stand state and quantifies (a) zero-action drift,
(b) action-sensitivity across random action sequences, against (c) the
training data's per-step foot-height delta distribution. Findings
(PERF.md 'Estimator closed loop: the surrogate ceiling'): 50-step
open-loop predictions are fantasy — MPPI exploits surrogate error instead
of discovering gait, independent of the cost.

  python scripts/dev_surrogate_ceiling.py
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="artifacts/full_pipeline/ckpt/model_best")
    args = ap.parse_args()

    from humanoid_mppi_rl_tpu.envs.tasks import TASKS
    from humanoid_mppi_rl_tpu.learning.train import load_checkpoint
    from humanoid_mppi_rl_tpu.models.predictors import make_model
    from humanoid_mppi_rl_tpu.physics import build_from_mjcf, forward

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    net = make_model("humanoid_attention")
    F = net.state_dim + net.action_dim
    params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, F)),
                       deterministic=True)
    params = load_checkpoint(os.path.join(root, args.ckpt), params0)

    spec = TASKS["humanoid_collect"]
    pm = build_from_mjcf(spec.asset_path(), include_self_collisions=True)
    id_l, id_r = pm.body_id("foot_left"), pm.body_id("foot_right")
    st = forward(pm, jnp.asarray(pm.qpos0), jnp.zeros(pm.nv))
    x0 = np.concatenate([np.asarray(st.qpos),
                         [float(st.xpos[id_l, 2]), float(st.xpos[id_r, 2])]])

    @jax.jit
    def roll(x0, U):
        def f(x, u):
            inp = jnp.concatenate([x, u])[None]
            x2 = x + net.apply(params, inp, deterministic=True)[0]
            return x2, x2
        _, xs = jax.lax.scan(f, jnp.asarray(x0, jnp.float32), U)
        return xs

    T = 50
    rng = np.random.default_rng(0)
    foot_ranges, x_moves = [], []
    for k in range(65):
        U = (np.zeros((T, 21), np.float32) if k == 0
             else rng.normal(0, 0.4, (T, 21)).astype(np.float32))
        xs = np.asarray(roll(x0, jnp.asarray(U)))
        fl, fr = xs[:, 28], xs[:, 29]
        foot_ranges.append(max(fl.max() - fl.min(), fr.max() - fr.min()))
        x_moves.append(xs[-1, 0] - x0[0])
    print("zero-action foot range over 50 steps: %.4f m" % foot_ranges[0])
    print("max foot range over 64 random sigma-0.4 seqs: %.4f m"
          % max(foot_ranges[1:]))
    print("x displacement range over seqs: [%.4f, %.4f] m in 0.25 s"
          % (min(x_moves), max(x_moves)))

    fls, step_d = [], []
    csvs = (sorted(glob.glob(os.path.join(
                root, "artifacts/full_pipeline/data/states_ft/*.csv")))
            or sorted(glob.glob(os.path.join(
                root, "artifacts/full_pipeline/data_sample/states_ft/*.csv"))))
    for f in csvs[:20]:
        arr = np.loadtxt(f, delimiter=",", ndmin=2)
        fls.append(arr[:, 55:57])
        step_d.append(np.abs(np.diff(arr[:, 55:57], axis=0)))
    fls = np.concatenate(fls)
    sd = np.concatenate(step_d)
    print("DATA foot z: p5 %.3f p95 %.3f; per-step |delta| median %.5f "
          "p99 %.5f" % (np.percentile(fls, 5), np.percentile(fls, 95),
                        np.median(sd), np.percentile(sd, 99)))


if __name__ == "__main__":
    main()
