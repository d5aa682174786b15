"""JAX-native rigid-body physics (engine + MJCF model extraction)."""

from .engine import (PhysicsState, actuator_moment, body_com_jacobian,
                     forward, inverse_dynamics, step, subtree_com_jacobian)
from .model import PhysicsModel, build_from_mjcf

__all__ = ["PhysicsModel", "PhysicsState", "build_from_mjcf", "forward",
           "step", "inverse_dynamics", "actuator_moment",
           "body_com_jacobian", "subtree_com_jacobian"]
