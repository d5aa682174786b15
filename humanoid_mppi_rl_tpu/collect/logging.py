"""Trajectory logging with reference-compatible CSV layout.

Reference layout (SURVEY.md §2.3, L6 layer):
  states*.csv  — rows of [qpos; qvel]  (humanoid v2 collector appends
                 [foot_left_z, foot_right_z] -> 57 cols, reference
                 src/Humanoid_datacollection_v2.jl:70-81)
  actions*.csv — rows of executed plan head u
  times*.csv   — sim clock per control step

Data is buffered in host numpy and flushed once per episode (the reference
appends per step into Julia vectors and writes at exit). `npz` output is
also supported for faster reload in the learning stack.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import List, Optional

import numpy as np

from ..utils.trajio import write_csv as _write_csv


class TrajectoryLogger:
    def __init__(self):
        self.states: List[np.ndarray] = []
        self.actions: List[np.ndarray] = []
        self.times: List[float] = []

    def log(self, state_row: np.ndarray, action: np.ndarray, time: float) -> None:
        self.states.append(np.asarray(state_row, dtype=np.float64))
        self.actions.append(np.asarray(action, dtype=np.float64))
        self.times.append(float(time))

    def reset(self) -> None:
        self.states, self.actions, self.times = [], [], []

    def __len__(self) -> int:
        return len(self.times)

    def arrays(self):
        return (
            np.stack(self.states) if self.states else np.zeros((0, 0)),
            np.stack(self.actions) if self.actions else np.zeros((0, 0)),
            np.asarray(self.times),
        )

    def save_run_dir(self, run_dir: str, fmt: str = "csv") -> str:
        """Reference quadruped layout: <run_dir>/{states,actions,times}.csv
        (reference src/quadruped_datacollection.py:245-247)."""
        os.makedirs(run_dir, exist_ok=True)
        s, a, t = self.arrays()
        if fmt == "csv":
            _write_csv(os.path.join(run_dir, "states.csv"), s)
            _write_csv(os.path.join(run_dir, "actions.csv"), a)
            _write_csv(os.path.join(run_dir, "times.csv"), t)
        else:
            np.savez(os.path.join(run_dir, "trajectory.npz"),
                     states=s, actions=a, times=t)
        return run_dir

    def save_split_dirs(self, base: str, timestamp: Optional[str] = None,
                        suffix: str = "_ft") -> str:
        """Reference humanoid-v2 layout: data/{states,actions,times}_ft/
        {states,actions,times}_<timestamp>.csv (reference
        src/Humanoid_datacollection_v2.jl:57-64,248-253)."""
        ts = timestamp or datetime.now().strftime("%Y-%m-%d_%H%M%S")
        s, a, t = self.arrays()
        for kind, arr in (("states", s), ("actions", a), ("times", t)):
            d = os.path.join(base, f"{kind}{suffix}")
            os.makedirs(d, exist_ok=True)
            _write_csv(os.path.join(d, f"{kind}_{ts}.csv"), arr)
        return ts
