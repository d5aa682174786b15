"""Dynamics-learning stack: datasets, training loops, checkpointing."""

from .data import MultiTrajectoryDataset, StateActionDataset  # noqa: F401
