"""Utilities: metrics, timers, PRNG helpers."""

from .metrics import JSONLWriter, Timer  # noqa: F401
