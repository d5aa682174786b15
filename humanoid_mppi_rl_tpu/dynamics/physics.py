"""Physics-engine dynamics adapters for the solver."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..physics import PhysicsModel, PhysicsState, forward, step


def make_physics_dynamics(model: PhysicsModel, substeps: int = 1,
                          solver: str = "coupled"):
    """dynamics(state, ctrl, t) -> state, stepping the engine `substeps`
    times per control step (the reference steps once per control update,
    reference src/cartpole_mppi.py:73). `solver` picks the constraint tier
    (physics.engine.step): "coupled" for environment fidelity, "penalty"
    for the decoupled law the Pallas rollout kernel matches."""

    def dynamics(state: PhysicsState, ctrl: jax.Array, t: jax.Array) -> PhysicsState:
        s = state
        for _ in range(substeps):
            s = step(model, s, ctrl, solver=solver)
        return s

    return dynamics


def make_scalar_plant_dynamics(model: PhysicsModel, substeps: int = 1):
    """Single-state plant step through ops.scalar_physics (the Pallas-kernel
    math run as plain jnp). Preferred on TPU: the scalar formulation's
    tree-sparse factorization is markedly more robust in f32 than the array
    engine's dense Cholesky (which can go non-PD under roundoff on stiff
    contact states), and the fused scalar graph steps in ~0.03 ms/chip."""
    from ..ops.scalar_physics import scalar_step

    def one(state: PhysicsState, ctrl: jax.Array) -> PhysicsState:
        qp = [state.qpos[i] for i in range(model.nq)]
        qv = [state.qvel[i] for i in range(model.nv)]
        uu = [ctrl[i] for i in range(model.nu)]
        qpn, qvn, _ = scalar_step(model, qp, qv, uu, state.time)
        return forward(model, jnp.stack(qpn), jnp.stack(qvn),
                       state.time + model.timestep)

    def dynamics(state: PhysicsState, ctrl: jax.Array, t: jax.Array) -> PhysicsState:
        s = state
        for _ in range(substeps):
            s = one(s, ctrl)
        return s

    return dynamics
