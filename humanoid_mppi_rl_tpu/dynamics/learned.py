"""Learned-surrogate dynamics backend (estimator MPPI).

Reference pattern (src/cartpole_mppi_estimator.py:61-121): rollouts step a
neural state predictor x_{t+1} = x_t + net(cat(x_t, u_t)) in K-lockstep
batches on the accelerator while the *real* plant is only used to read the
current state and execute the chosen action. Here the solver's vmap over K
provides the batching — the net's matmuls see a K-wide batch dimension and
land on the TPU MXU (bfloat16 compute via models.predictors compute_dtype).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_learned_dynamics(apply_fn: Callable, params: Any,
                          mode: str = "delta",
                          state_slice: Optional[int] = None,
                          ego_cols: Optional[Sequence[int]] = None):
    """dynamics(x, u, t) -> x' over flat state vectors.

    mode: 'delta' (x + net(...)) or 'raw' (net output is the next state),
    matching learning.data return_type semantics. `state_slice` truncates the
    net output (e.g. a 30-dim predictor driving a 30-dim estimator state).
    `ego_cols` zeroes those state columns in the NET INPUT only (egocentric
    root x/y for a model trained on translated windows,
    learning.data ego_xy_cols): deltas stay translation-invariant so the
    integrated state keeps its absolute coordinates."""
    ego = None if ego_cols is None else np.asarray(list(ego_cols))

    def dynamics(x: jax.Array, u: jax.Array, t: jax.Array) -> jax.Array:
        x_in = x if ego is None else x.at[..., ego].set(0.0)
        inp = jnp.concatenate([x_in, u], axis=-1)
        out = apply_fn(params, inp, deterministic=True)
        if state_slice is not None:
            out = out[..., :state_slice]
        if mode == "delta":
            return x + out
        return out

    return dynamics


def flat_state_from_physics(state) -> jax.Array:
    """[qpos; qvel] flat estimator state from a PhysicsState (the reference
    reads the same from the real plant, src/cartpole_mppi_estimator.py:126)."""
    return jnp.concatenate([state.qpos, state.qvel])
