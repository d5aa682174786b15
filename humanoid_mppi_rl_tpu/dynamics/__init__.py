"""Dynamics backends for the MPPI solver.

A dynamics backend is any pure function (state, ctrl, t) -> state. Two
families mirror the reference's two rollout modes:

- physics-engine dynamics (reference `mj_step` rollouts): physics.py wraps
  the JAX engine per task model;
- learned surrogate dynamics (reference src/cartpole_mppi_estimator.py
  rollout_learned_model_batched): learned.py wraps a Flax state predictor.
"""

from .physics import make_physics_dynamics  # noqa: F401
