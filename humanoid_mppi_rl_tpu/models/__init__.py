"""Flax surrogate-dynamics model families (reference learning/model.py)."""

from .predictors import (  # noqa: F401
    CrossAttentionStatePredictor,
    FeatureAttentionStatePredictor,
    MLPStatePredictor,
)
