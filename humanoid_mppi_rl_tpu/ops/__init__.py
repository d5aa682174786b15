"""Pallas TPU kernels for the MPPI hot path."""
