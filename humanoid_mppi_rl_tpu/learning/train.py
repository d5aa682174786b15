"""Supervised dynamics training (reference learning/train*.py rebuilt on
optax/orbax).

Loop parity with reference learning/train.py:23-183:
- Adam + cosine decay to a floor LR, MSE on next-state deltas
- eval mean/max abs diff, pct diffs, per-column diffs
- best-by-eval-loss + periodic + final checkpoints (orbax instead of
  torch.save), optional TensorBoard scalars, JSONL metrics always

Task presets mirror the three reference trainers:
  humanoid  FeatureAttention(30,21,512,8,7), Adam 1e-3 cosine->1e-6,
            200 epochs, batch 64, state_idxes=[0..27,55,56]  (train.py:36-77)
  cartpole  FeatureAttention(4,1,64,4,2), Adam 1e-4, 50 epochs, batch 32
            (train_cartpole.py:53-58)
  quadruped FeatureAttention(37,12,512,4,2), Adam 1e-4, 50 epochs, batch 64
            (train_quadruped.py:54-60)
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models.predictors import make_model
from ..utils.metrics import JSONLWriter, Timer
from .data import MultiTrajectoryDataset


@dataclasses.dataclass
class TrainConfig:
    model_preset: str = "humanoid_attention"
    lr: float = 1e-3
    lr_min: float = 1e-6
    epochs: int = 200
    batch_size: int = 64
    return_type: str = "delta"
    state_idxes: Optional[Sequence[int]] = None
    eval_split: float = 0.1
    ckpt_dir: str = "checkpoints/run"
    ckpt_every: int = 25
    seed: int = 0
    log_path: Optional[str] = None
    compute_dtype: Any = jnp.float32
    # resume from a "state_last"-style full-train-state checkpoint (params +
    # opt state + step/epoch) — the reference only has a commented-out
    # torch.load resume line (learning/train.py:78); here resume is real
    resume_from: Optional[str] = None
    # train/eval loss-curve PNG written after the run (reference
    # learning/train_quadruped.py:172-187); None -> skip
    plot_path: Optional[str] = None
    # run each epoch as ONE device program (lax.scan over batches with the
    # dataset resident on device) instead of a host loop of per-batch calls.
    # Essential on remote/tunneled devices where every call pays wire
    # latency: a 200-epoch humanoid run is ~400 device calls instead of
    # ~200k. Per-step TensorBoard scalars are skipped in this mode.
    scan_epochs: bool = False
    # multi-step rollout loss: compose x_{j+1} = x_j + net(x_j, u_j) for
    # rollout_k steps against the true window and average the MSEs — trains
    # the open-loop composition the estimator MPPI consumes (the one-step
    # scheme's compounding divergence is the measured surrogate ceiling,
    # PERF.md). Requires scan_epochs and return_type='delta'.
    rollout_k: int = 1
    # constructor overrides for the preset model (e.g. state_dim=19 for a
    # position-only quadruped surrogate — models/predictors.make_model)
    model_overrides: Optional[dict] = None
    # state columns zeroed in every net input (egocentric root x/y —
    # make_scanned_rollout_steps ego_cols; rollout_k > 1 only)
    ego_xy_cols: Optional[Sequence[int]] = None
    # global-norm gradient clip (0 = off). Practically required for
    # rollout_k > 1: composing an untrained net k times explodes early
    # gradients (measured: the humanoid retrain at lr=1e-3 diverged to
    # 1e9 loss without it)
    grad_clip: float = 0.0


PRESET_CONFIGS = {
    "humanoid": TrainConfig(
        model_preset="humanoid_attention", lr=1e-3, lr_min=1e-6, epochs=200,
        batch_size=64, state_idxes=tuple(range(28)) + (55, 56),
        ckpt_dir="checkpoints/state_only_v2",
    ),
    "cartpole": TrainConfig(
        model_preset="cartpole_attention", lr=1e-4, lr_min=1e-6, epochs=50,
        batch_size=32, ckpt_dir="checkpoints_cartpole",
    ),
    "quadruped": TrainConfig(
        model_preset="quadruped_attention", lr=1e-4, lr_min=1e-6, epochs=50,
        batch_size=64, ckpt_dir="checkpoints_quadruped",
    ),
}


class TrainState(train_state.TrainState):
    pass


def create_train_state(cfg: TrainConfig, sample_input: np.ndarray,
                       steps_per_epoch: int):
    model = make_model(cfg.model_preset, compute_dtype=cfg.compute_dtype,
                       **(cfg.model_overrides or {}))
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key, jnp.asarray(sample_input[:1]), deterministic=True)
    sched = optax.cosine_decay_schedule(
        cfg.lr, max(1, cfg.epochs * steps_per_epoch), alpha=cfg.lr_min / cfg.lr)
    tx = optax.adam(sched)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return model, TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_steps(apply_fn):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y, dropout_key):
        def loss_fn(params):
            pred = apply_fn(params, x, deterministic=False,
                            rngs={"dropout": dropout_key})
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    @jax.jit
    def eval_step(params, x, y):
        pred = apply_fn(params, x, deterministic=True)
        diff = jnp.abs(pred - y)
        loss = jnp.mean((pred - y) ** 2)
        pct = diff / (jnp.abs(y) + 1e-8)
        return loss, diff.mean(), diff.max(), pct.mean(), diff.mean(axis=0)

    return train_step, eval_step


def make_scanned_steps(apply_fn, X, Y, noise_std: float = 0.0):
    """Whole-epoch device programs over a device-resident dataset.

    train_epoch(state, idx, key): idx (steps, B) int32 batch indices ->
    (new_state, mean_loss). eval_all(params, idx) over (n_eval_batches, B)
    -> stacked per-batch (loss, mean_abs, max_abs, mean_pct, col_diff)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state: TrainState, idx, key):
        def body(carry, bidx):
            st, k = carry
            k, sub = jax.random.split(k)
            x = jnp.take(X, bidx, axis=0)
            y = jnp.take(Y, bidx, axis=0)
            if noise_std > 0:   # dataset augmentation, on device
                k, kn = jax.random.split(k)
                x = x + noise_std * jax.random.normal(kn, x.shape, x.dtype)

            def loss_fn(params):
                pred = apply_fn(params, x, deterministic=False,
                                rngs={"dropout": sub})
                return jnp.mean((pred - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return (st.apply_gradients(grads=grads), k), loss

        (state, _), losses = jax.lax.scan(body, (state, key), idx)
        return state, jnp.mean(losses)

    @jax.jit
    def eval_all(params, idx):
        def body(_, bidx):
            x = jnp.take(X, bidx, axis=0)
            y = jnp.take(Y, bidx, axis=0)
            pred = apply_fn(params, x, deterministic=True)
            diff = jnp.abs(pred - y)
            pct = diff / (jnp.abs(y) + 1e-8)
            return None, (jnp.mean((pred - y) ** 2), diff.mean(), diff.max(),
                          pct.mean(), diff.mean(axis=0))

        _, out = jax.lax.scan(body, None, idx)
        return out

    return train_epoch, eval_all


def save_checkpoint(ckpt_dir: str, name: str, params) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, params_like):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), params_like)


def save_train_state(ckpt_dir: str, name: str, state: "TrainState",
                     epoch: int) -> str:
    """Full resumable snapshot: params + optimizer state + step + epoch."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step, "epoch": jnp.asarray(epoch)}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state(path: str, state: "TrainState"):
    """Restore (state, next_epoch) from a save_train_state snapshot."""
    import orbax.checkpoint as ocp

    like = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step, "epoch": jnp.asarray(0)}
    got = ocp.StandardCheckpointer().restore(os.path.abspath(path), like)
    state = state.replace(params=got["params"], opt_state=got["opt_state"],
                          step=got["step"])
    return state, int(got["epoch"]) + 1


def save_loss_curve(path: str, history) -> Optional[str]:
    """Train/eval loss-curve PNG (reference learning/train_quadruped.py:
    172-187). Returns the path, or None when matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    epochs = [h[0] for h in history]
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(epochs, [h[1] for h in history], label="train loss")
    ax.plot(epochs, [h[2] for h in history], label="eval loss")
    ax.set_xlabel("epoch")
    ax.set_ylabel("MSE loss")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def make_scanned_rollout_steps(apply_fn, S, A, k: int,
                               ego_cols: Optional[Sequence[int]] = None):
    """Whole-epoch device programs over device-resident rollout windows:
    S (W, k+1, sdim) raw states, A (W, k, adim). The loss rolls the model
    open-loop with the logged actions and averages the per-step MSEs.

    `ego_cols`: state columns zeroed in every NET INPUT (egocentric root
    x/y). Absolute root position carries no dynamics information but its
    large magnitude drowns the mm-scale per-step deltas the delta head
    must resolve — the r5 quad surrogate trained on absolute x
    overpredicted per-step forward motion 3-5x open-loop. The deltas are
    translation-invariant, so composition stays absolute; the estimator
    applies the same zeroing at plan time
    (dynamics/learned.make_learned_dynamics ego_cols)."""
    ego = None if ego_cols is None else np.asarray(list(ego_cols))

    def _rollout_loss(params, s_seq, a_seq, det, sub=None):
        x = s_seq[:, 0]
        tot = 0.0
        for j in range(k):
            x_in = x if ego is None else x.at[:, ego].set(0.0)
            inp = jnp.concatenate([x_in, a_seq[:, j]], axis=-1)
            kw = ({"deterministic": True} if det
                  else {"deterministic": False, "rngs": {"dropout": sub}})
            x = x + apply_fn(params, inp, **kw)
            tot = tot + jnp.mean((x - s_seq[:, j + 1]) ** 2)
        return tot / k, x

    @partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state: TrainState, idx, key):
        def body(carry, bidx):
            st, kk = carry
            kk, sub = jax.random.split(kk)
            s_seq = jnp.take(S, bidx, axis=0)
            a_seq = jnp.take(A, bidx, axis=0)

            def loss_fn(params):
                loss, _ = _rollout_loss(params, s_seq, a_seq, False, sub)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return (st.apply_gradients(grads=grads), kk), loss

        (state, _), losses = jax.lax.scan(body, (state, key), idx)
        return state, jnp.mean(losses)

    @jax.jit
    def eval_all(params, idx):
        def body(_, bidx):
            s_seq = jnp.take(S, bidx, axis=0)
            a_seq = jnp.take(A, bidx, axis=0)
            loss, x = _rollout_loss(params, s_seq, a_seq, True)
            diff = jnp.abs(x - s_seq[:, -1])
            pct = diff / (jnp.abs(s_seq[:, -1]) + 1e-8)
            return None, (loss, diff.mean(), diff.max(), pct.mean(),
                          diff.mean(axis=0))

        _, out = jax.lax.scan(body, None, idx)
        return out

    return train_epoch, eval_all


def train_model(
    states_dir: str,
    actions_dir: str,
    cfg: TrainConfig,
    max_steps_per_epoch: Optional[int] = None,
) -> dict:
    """Full training run; returns summary metrics."""
    ds = MultiTrajectoryDataset(
        states_dir, actions_dir, return_type=cfg.return_type,
        eval_split=cfg.eval_split, state_idxes=cfg.state_idxes, seed=cfg.seed,
        rollout_k=cfg.rollout_k)
    log = JSONLWriter(cfg.log_path or os.path.join(cfg.ckpt_dir, "metrics.jsonl"))
    tb = None
    try:  # TensorBoard parity when available (reference train.py:29-34)
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(os.path.join(cfg.ckpt_dir, "tb"))
    except Exception:
        pass

    x0, _ = next(ds.batches(min(cfg.batch_size, len(ds.train_idx)), seed=cfg.seed))
    train_pool = (ds.win_train_idx if cfg.rollout_k > 1 else ds.train_idx)
    steps_per_epoch = max(1, len(train_pool) // cfg.batch_size)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    model, state = create_train_state(cfg, x0, steps_per_epoch)
    train_step, eval_step = make_steps(model.apply)
    key = jax.random.PRNGKey(cfg.seed + 1)

    if cfg.rollout_k > 1 and not cfg.scan_epochs:
        raise ValueError("rollout_k > 1 requires scan_epochs=True")

    scanned = None
    if cfg.scan_epochs and len(ds.train_idx) < cfg.batch_size:
        # a sub-batch-sized training set would make the scanned index array
        # reshape to (nb, batch_size) with too few indices; the host loop's
        # ds.batches handles short batches correctly
        cfg = dataclasses.replace(cfg, scan_epochs=False)
    if cfg.scan_epochs and cfg.rollout_k > 1:
        S = jnp.asarray(ds.win_states)
        A = jnp.asarray(ds.win_actions)
        train_epoch_fn, eval_all_fn = make_scanned_rollout_steps(
            model.apply, S, A, cfg.rollout_k, ego_cols=cfg.ego_xy_cols)
        B = cfg.batch_size
        n_ev = len(ds.win_eval_idx) // B
        eval_idx_dev = (jnp.asarray(
            np.asarray(ds.win_eval_idx[: n_ev * B],
                       np.int32).reshape(n_ev, B)) if n_ev else None)
        scanned = (train_epoch_fn, eval_all_fn, eval_idx_dev)
    elif cfg.scan_epochs:
        X = jnp.asarray(ds.inputs)
        Y = jnp.asarray(ds.targets)
        train_epoch_fn, eval_all_fn = make_scanned_steps(
            model.apply, X, Y, noise_std=float(ds.noise_std or 0.0))
        B = cfg.batch_size
        n_ev = len(ds.eval_idx) // B
        eval_idx_dev = (jnp.asarray(
            np.asarray(ds.eval_idx[: n_ev * B], np.int32).reshape(n_ev, B))
            if n_ev else None)
        scanned = (train_epoch_fn, eval_all_fn, eval_idx_dev)

    start_epoch = 0
    if cfg.resume_from:
        state, start_epoch = load_train_state(cfg.resume_from, state)
        log.write(kind="resume", path=cfg.resume_from, epoch=start_epoch)

    best_eval = np.inf
    best_path = None
    global_step = int(state.step)
    train_loss = float("nan")
    history = []  # (epoch, train_loss, eval_loss) for the loss-curve plot
    for epoch in range(start_epoch, cfg.epochs):
        with Timer() as t_ep:
            if scanned is not None:
                train_epoch_fn, eval_all_fn, eval_idx_dev = scanned
                rng = np.random.default_rng(cfg.seed + epoch)
                perm = rng.permutation(len(train_pool))
                nb = steps_per_epoch
                idx = np.asarray(train_pool, np.int64)[
                    perm[: nb * cfg.batch_size]].astype(np.int32)
                idx = jnp.asarray(idx.reshape(nb, cfg.batch_size))
                key, sub = jax.random.split(key)
                state, mean_loss = train_epoch_fn(state, idx, sub)
                train_loss = float(mean_loss)
                global_step += nb
            else:
                losses = []
                for i, (x, y) in enumerate(
                    ds.batches(cfg.batch_size, train=True, seed=cfg.seed + epoch)
                ):
                    if max_steps_per_epoch and i >= max_steps_per_epoch:
                        break
                    key, sub = jax.random.split(key)
                    state, loss = train_step(state, jnp.asarray(x),
                                             jnp.asarray(y), sub)
                    losses.append(float(loss))
                    if tb:
                        tb.add_scalar("train/loss_step", float(loss), global_step)
                    global_step += 1
                train_loss = float(np.mean(losses)) if losses else float("nan")

        if scanned is not None and scanned[2] is not None:
            ls, ma, xa, pc, cd_ = jax.tree_util.tree_map(
                np.asarray, scanned[1](state.params, scanned[2]))
            eval_loss = float(ls.mean())
            mean_abs = float(ma.mean())
            max_abs = float(xa.max())
            mean_pct = float(pc.mean())
            col_diff = cd_.mean(axis=0)
        else:
            ev = [eval_step(state.params, jnp.asarray(x), jnp.asarray(y))
                  for x, y in ds.batches(cfg.batch_size, train=False)]
            if ev:
                eval_loss = float(np.mean([float(e[0]) for e in ev]))
                mean_abs = float(np.mean([float(e[1]) for e in ev]))
                max_abs = float(np.max([float(e[2]) for e in ev]))
                mean_pct = float(np.mean([float(e[3]) for e in ev]))
                col_diff = np.mean([np.asarray(e[4]) for e in ev], axis=0)
            else:
                eval_loss, mean_abs, max_abs, mean_pct = train_loss, 0.0, 0.0, 0.0
                col_diff = np.zeros(1)

        history.append((epoch, train_loss, eval_loss))
        log.write(kind="epoch", epoch=epoch, train_loss=train_loss,
                  eval_loss=eval_loss, mean_abs=mean_abs, max_abs=max_abs,
                  mean_pct=mean_pct, seconds=t_ep.seconds)
        if tb:
            tb.add_scalar("train/loss", train_loss, epoch)
            tb.add_scalar("eval/loss", eval_loss, epoch)
            tb.add_scalar("eval/mean_abs", mean_abs, epoch)
            tb.add_scalar("eval/max_abs", max_abs, epoch)
            for c, v in enumerate(col_diff):
                tb.add_scalar(f"eval/col_{c}_abs", float(v), epoch)

        if eval_loss < best_eval:
            best_eval = eval_loss
            best_path = save_checkpoint(cfg.ckpt_dir, "model_best", state.params)
        if cfg.ckpt_every and (epoch + 1) % cfg.ckpt_every == 0:
            save_checkpoint(cfg.ckpt_dir, f"model_epoch_{epoch + 1}", state.params)
            save_train_state(cfg.ckpt_dir, "state_last", state, epoch)

    final_path = save_checkpoint(cfg.ckpt_dir, "model_final", state.params)
    if cfg.plot_path and history:
        save_loss_curve(cfg.plot_path, history)
    log.close()
    # metrics-only summary written alongside the checkpoints; the orbax ckpt
    # is the parameter artifact (never serialize state.params into JSON)
    summary = {
        "best_eval_loss": best_eval,
        "final_train_loss": train_loss,
        "best_checkpoint": best_path,
        "final_checkpoint": final_path,
        "n_pairs": len(ds),
        "epochs": cfg.epochs,
        "rollout_k": cfg.rollout_k,
    }
    with open(os.path.join(cfg.ckpt_dir, "train_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return {**summary, "params": state.params, "model": model}
