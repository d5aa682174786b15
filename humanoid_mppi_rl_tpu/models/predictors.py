"""Flax learned-dynamics model families.

TPU-native re-designs of the three PyTorch architectures in reference
learning/model.py, keeping the same architecture hyperparameters (so
checkpoint configs are comparable) while using idiomatic Flax/XLA:

- MLPStatePredictor          (reference learning/model.py:6-46)
- FeatureAttentionStatePredictor (reference learning/model.py:48-153):
  each scalar feature is a token (shared Linear(1,H) encoding + learned
  positional embedding), pre-LN transformer blocks, per-token scalar head,
  output truncated to state_dim. Deployed configs:
    cartpole  (4, 1, 64, 4 heads, 2 layers)   src/cartpole_mppi_estimator.py:29
    quadruped (37, 12, 512, 4, 2)             learning/train_quadruped.py:54-55
    humanoid  (30, 21, 512, 8, 7)             learning/train.py:71-72
- CrossAttentionStatePredictor   (reference learning/model.py:157-202)

Matmuls run in bfloat16 on TPU when `compute_dtype=jnp.bfloat16` (params and
accumulation stay f32), keeping the MXU fed at K=65536-scale batched rollouts.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPStatePredictor(nn.Module):
    state_dim: int = 55
    action_dim: int = 21
    hidden_dim: int = 128
    hidden_layers: int = 2
    use_batch_norm: bool = False
    dropout_rate: float = 0.0
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.compute_dtype)
        for _ in range(self.hidden_layers + 1):
            x = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(use_running_average=deterministic,
                                 dtype=self.compute_dtype)(x)
            x = nn.relu(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.state_dim, dtype=self.compute_dtype)(x)
        return x.astype(jnp.float32)


class _TransformerBlock(nn.Module):
    hidden_dim: int
    num_heads: int
    dropout_rate: float
    compute_dtype: Any

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # pre-LN attention (reference learning/model.py:117-131)
        h = nn.LayerNorm(dtype=self.compute_dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dtype=self.compute_dtype,
        )(h, h)
        x = x + nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.LayerNorm(dtype=self.compute_dtype)(x)
        h = nn.Dense(self.hidden_dim * 4, dtype=self.compute_dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(h)
        x = x + nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return x


class FeatureAttentionStatePredictor(nn.Module):
    state_dim: int = 55
    action_dim: int = 21
    hidden_dim: int = 128
    num_heads: int = 4
    attn_layers: int = 2
    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        input_dim = self.state_dim + self.action_dim
        x = x.astype(self.compute_dtype)
        tokens = x[..., None]                               # (B, F, 1)
        h = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(tokens)
        h = nn.LayerNorm(dtype=self.compute_dtype)(h)
        h = nn.relu(h)
        # (input_dim, hidden) — broadcasts over any leading batch dims
        # (a leading 1 as in the reference would inject a batch axis on
        # unbatched inputs under vmap)
        pos = self.param(
            "pos_embedding",
            nn.initializers.xavier_uniform(),
            (input_dim, self.hidden_dim),
        ).astype(self.compute_dtype)
        h = h + pos
        for _ in range(self.attn_layers):
            h = _TransformerBlock(self.hidden_dim, self.num_heads,
                                  self.dropout_rate, self.compute_dtype)(
                h, deterministic=deterministic)
        out = nn.Dense(1, dtype=self.compute_dtype)(h)[..., 0]  # (B, F)
        return out[..., : self.state_dim].astype(jnp.float32)


class CrossAttentionStatePredictor(nn.Module):
    qpos_dim: int = 28
    qvel_dim: int = 27
    action_dim: int = 21
    hidden_dim: int = 128
    num_heads: int = 6
    dropout_rate: float = 0.18
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        state_dim = self.qpos_dim + self.qvel_dim
        x = x.astype(self.compute_dtype)
        qpos = x[..., : self.qpos_dim]
        qvel = x[..., self.qpos_dim : state_dim]
        # (action encoded but unused by the attention fusion, exactly as in
        # the reference forward pass, learning/model.py:184-201)
        action = x[..., state_dim:]

        q_feat = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(qpos)[..., None, :]
        v_feat = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(qvel)[..., None, :]
        _a_feat = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(action)

        q_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout_rate,
            deterministic=deterministic, dtype=self.compute_dtype,
        )(q_feat, v_feat)
        v_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout_rate,
            deterministic=deterministic, dtype=self.compute_dtype,
        )(v_feat, q_feat)

        fused = jnp.concatenate([q_attn[..., 0, :], v_attn[..., 0, :]], axis=-1)
        h = nn.LayerNorm(dtype=self.compute_dtype)(fused)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(h)
        h = nn.relu(h)
        out = nn.Dense(state_dim, dtype=self.compute_dtype)(h)
        return out.astype(jnp.float32)


PRESETS = {
    # (model_cls, kwargs) per reference deployment
    "cartpole_attention": (FeatureAttentionStatePredictor,
                           dict(state_dim=4, action_dim=1, hidden_dim=64,
                                num_heads=4, attn_layers=2)),
    "quadruped_attention": (FeatureAttentionStatePredictor,
                            dict(state_dim=37, action_dim=12, hidden_dim=512,
                                 num_heads=4, attn_layers=2)),
    "humanoid_attention": (FeatureAttentionStatePredictor,
                           dict(state_dim=30, action_dim=21, hidden_dim=512,
                                num_heads=8, attn_layers=7)),
    # deployed with num_heads=4 (reference Visualization/vis.ipynb cell 4;
    # the class default 6 does not divide hidden 128 and cannot construct)
    "humanoid_cross": (CrossAttentionStatePredictor,
                       dict(qpos_dim=28, qvel_dim=27, action_dim=21,
                            num_heads=4)),
}


def make_model(name: str, **overrides):
    cls, kw = PRESETS[name]
    kw = dict(kw)
    kw.update(overrides)
    return cls(**kw)
