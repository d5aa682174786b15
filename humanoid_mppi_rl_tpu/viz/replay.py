"""Trajectory replay tooling (reference Visualization/vis.ipynb).

- kinematic_replay: states.csv -> body poses per frame via the engine's FK
  (the reference replays via mj_forward + viewer at 60 fps, cell 2). Headless
  here: returns xpos trajectories; render_video rasterizes through the
  mujoco Renderer when OpenGL is available (gated — the TPU hosts are
  headless).
- open_loop_model_rollout: roll a learned surrogate forward from a logged
  initial state (cells 4-6) and return the predicted state trajectory for
  regression against the logged one — the reference's manual eyeball check,
  made scriptable.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..physics import PhysicsModel, forward


def load_trajectory(run_dir: Optional[str] = None, states_csv: Optional[str] = None,
                    actions_csv: Optional[str] = None,
                    times_csv: Optional[str] = None):
    """Load a logged trajectory from a run dir (states/actions/times.csv) or
    explicit paths. Returns (states, actions, times) numpy arrays."""
    if run_dir is not None:
        states_csv = os.path.join(run_dir, "states.csv")
        actions_csv = os.path.join(run_dir, "actions.csv")
        times_csv = os.path.join(run_dir, "times.csv")
    states = np.loadtxt(states_csv, delimiter=",", ndmin=2)
    actions = np.loadtxt(actions_csv, delimiter=",", ndmin=2) if actions_csv and os.path.exists(actions_csv) else None
    times = np.loadtxt(times_csv, delimiter=",") if times_csv and os.path.exists(times_csv) else None
    return states, actions, times


def kinematic_replay(model: PhysicsModel, states: np.ndarray,
                     stride: int = 1) -> np.ndarray:
    """FK over logged rows -> body positions (n_frames, nbody, 3).
    Rows may carry extra columns (e.g. the humanoid collector's foot
    heights); only the first nq+nv are used."""
    nq, nv = model.nq, model.nv

    @jax.jit
    def fk(qpos):
        return forward(model, qpos, jnp.zeros(nv, qpos.dtype)).xpos

    frames = []
    for row in states[::stride]:
        frames.append(np.asarray(fk(jnp.asarray(row[:nq]))))
    return np.stack(frames)


def open_loop_model_rollout(apply_fn, params, init_state: np.ndarray,
                            actions: np.ndarray, mode: str = "delta") -> np.ndarray:
    """Open-loop surrogate rollout x_{t+1} = x_t (+) net(x_t, u_t)
    (reference vis.ipynb cells 4-6). Returns (T+1, state_dim)."""

    @jax.jit
    def roll(x0, U):
        def body(x, u):
            out = apply_fn(params, jnp.concatenate([x, u]), deterministic=True)
            x2 = x + out if mode == "delta" else out
            return x2, x2
        _, xs = jax.lax.scan(body, x0, U)
        return xs

    xs = roll(jnp.asarray(init_state, jnp.float32), jnp.asarray(actions, jnp.float32))
    return np.concatenate([init_state[None], np.asarray(xs)], axis=0)


def render_video(asset_path: str, states: np.ndarray, out_path: str,
                 fps: int = 60, width: int = 480, height: int = 360) -> Optional[str]:
    """Rasterize a state trajectory with the mujoco Renderer (requires
    OpenGL; returns None on headless hosts)."""
    try:
        import mujoco

        m = mujoco.MjModel.from_xml_path(asset_path)
        d = mujoco.MjData(m)
        renderer = mujoco.Renderer(m, height=height, width=width)
    except Exception:
        return None
    frames = []
    for row in states:
        d.qpos[: m.nq] = row[: m.nq]
        mujoco.mj_forward(m, d)
        renderer.update_scene(d)
        frames.append(renderer.render().copy())
    try:
        import imageio

        imageio.mimsave(out_path, frames, fps=fps)
        return out_path
    except Exception:
        np.savez(out_path + ".npz", frames=np.stack(frames))
        return out_path + ".npz"
