"""Live interactive visualization (reference viewer-loop parity).

Every reference MPPI script ends in an interactive MuJoCo viewer loop
(reference src/cartpole_mppi.py:109-117, src/mppi.jl:102-103). The TPU
deployment is headless, so the viewer here is a PASSIVE MIRROR: the
controller + plant run entirely on-device (our engine), and each executed
step's qpos/qvel is pushed into an mjData for mujoco.viewer to draw — the
viewer never steps physics. Gated on mujoco.viewer import + a working
display; on headless hosts `live_run` raises a clear error and the CLI
falls back to headless logging (`run` without --live).

Also works as a live REPLAY (`mirror_trajectory`) of logged states.csv —
the interactive analog of viz.replay.kinematic_replay.
"""

from __future__ import annotations

import time as _time
from typing import Callable, Optional

import numpy as np


def _launch_viewer(asset_path: str):
    try:
        import mujoco
        import mujoco.viewer
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "live visualization needs the mujoco python package") from e
    m = mujoco.MjModel.from_xml_path(asset_path)
    d = mujoco.MjData(m)
    try:
        handle = mujoco.viewer.launch_passive(m, d)
    except Exception as e:  # headless host, no GLFW display
        raise RuntimeError(
            f"cannot open a viewer window ({e}); run headless via the "
            f"`run`/`collect` CLI subcommands instead") from e
    return mujoco, m, d, handle


def live_run(task_name: str, n_steps: int = 1000, seed: int = 0,
             use_kernel: bool = True, realtime: bool = True,
             mppi_override: Optional[dict] = None):
    """Closed-loop MPPI with a live viewer mirror (reference viewer-loop
    analog). Returns the EpisodeResult from the headless runner."""
    from ..collect.runner import EpisodeRunner
    from ..envs.tasks import TASKS

    spec = TASKS[task_name]
    mujoco, m, d, handle = _launch_viewer(spec.asset_path())
    runner = EpisodeRunner(task_name, seed=seed, use_kernel=use_kernel,
                           mppi_override=mppi_override or {})
    dt = float(runner.model.timestep)

    def mirror(plant):
        if not handle.is_running():
            raise KeyboardInterrupt
        d.qpos[:] = np.asarray(plant.qpos)
        d.qvel[:] = np.asarray(plant.qvel)
        mujoco.mj_forward(m, d)
        handle.sync()
        if realtime:
            _time.sleep(dt)

    try:
        # chunk=1 so every executed step is mirrored
        return runner.run(max_steps=n_steps, seed=seed, chunk=1,
                          per_chunk_callback=mirror)
    finally:
        handle.close()


def mirror_trajectory(asset_path: str, states: np.ndarray, fps: float = 60.0,
                      stride: int = 1, loop: bool = False):
    """Replay logged rows in a live viewer at `fps` (reference
    Visualization/vis.ipynb cell 2, interactive form)."""
    mujoco, m, d, handle = _launch_viewer(asset_path)
    nq, nv = m.nq, m.nv
    try:
        while True:
            for row in states[::stride]:
                if not handle.is_running():
                    return
                d.qpos[:] = row[:nq]
                if row.shape[0] >= nq + nv:
                    d.qvel[:] = row[nq:nq + nv]
                mujoco.mj_forward(m, d)
                handle.sync()
                _time.sleep(1.0 / fps)
            if not loop:
                return
    finally:
        handle.close()
