"""Physics-engine dynamics adapter for the solver."""

from __future__ import annotations

from typing import Optional

import jax

from ..physics import PhysicsModel, PhysicsState, step


def make_physics_dynamics(model: PhysicsModel, substeps: int = 1):
    """dynamics(state, ctrl, t) -> state, stepping the engine `substeps`
    times per control step (the reference steps once per control update,
    reference src/cartpole_mppi.py:73)."""

    def dynamics(state: PhysicsState, ctrl: jax.Array, t: jax.Array) -> PhysicsState:
        s = state
        for _ in range(substeps):
            s = step(model, s, ctrl)
        return s

    return dynamics
