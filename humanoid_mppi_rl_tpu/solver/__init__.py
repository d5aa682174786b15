"""Solvers: MPPI core + LQR baseline."""

from .mppi import MPPIConfig, MPPIDiagnostics, MPPIState, make_mppi  # noqa: F401
