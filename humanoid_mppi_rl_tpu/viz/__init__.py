"""Trajectory replay and visualization."""

from .replay import (  # noqa: F401
    kinematic_replay,
    load_trajectory,
    open_loop_model_rollout,
    render_video,
)
