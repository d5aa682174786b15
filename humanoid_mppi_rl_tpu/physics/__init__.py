"""JAX-native rigid-body physics (engine + MJCF model extraction)."""

from .engine import PhysicsState, forward, step
from .model import PhysicsModel, build_from_mjcf

__all__ = ["PhysicsModel", "PhysicsState", "build_from_mjcf", "forward", "step"]
