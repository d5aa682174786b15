"""Import the reference's trained PyTorch checkpoints into our Flax models.

The reference deploys its estimator MPPI from `.pth` state_dicts
(reference src/cartpole_mppi_estimator.py:28-34 loads
checkpoints_cartpole/model_best.pth into FeatureAttentionStatePredictor
(4,1,64,4,2); Visualization/vis.ipynb cell 4 loads checkpoints/model_cross.pth
into CrossAttentionStatePredictor). Converting those weights lets the build
run closed-loop on the reference's actual trained artifacts instead of only
self-trained ones.

Layout contracts (torch -> flax):
  nn.Linear(in, out).weight is (out, in), applied as x @ W.T  ->  flax
    Dense kernel (in, out) = W.T
  nn.MultiheadAttention packs in_proj_weight as rows [Wq; Wk; Wv], each
    (H, H); flax MultiHeadDotProductAttention factors each projection as
    kernel (H, num_heads, head_dim) applied by x @ kernel  ->  Wq.T reshaped
    to (H, nh, hd); out_proj.weight (H, H) -> out kernel (nh, hd, H) = Wo.T
    reshaped. Both frameworks scale q by 1/sqrt(head_dim), so no rescale.
  nn.LayerNorm.weight/bias -> flax scale/bias.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth state_dict into numpy arrays (no grad/device baggage)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "reading reference .pth checkpoints requires the (CPU) torch "
            "wheel to unpickle tensor storages") from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().numpy(), dtype=np.float32)
            for k, v in sd.items()}


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T.copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def _mha(sd, prefix, num_heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[f"{prefix}.in_proj_weight"]      # (3H, H) rows [q; k; v]
    b = sd[f"{prefix}.in_proj_bias"]        # (3H,)
    H = w.shape[1]
    hd = H // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * H:(i + 1) * H]           # (H, H), out-major
        bi = b[i * H:(i + 1) * H]
        out[name] = {"kernel": wi.T.reshape(H, num_heads, hd).copy(),
                     "bias": bi.reshape(num_heads, hd).copy()}
    wo = sd[f"{prefix}.out_proj.weight"]    # (H, H)
    out["out"] = {"kernel": wo.T.reshape(num_heads, hd, H).copy(),
                  "bias": sd[f"{prefix}.out_proj.bias"].copy()}
    return out


def feature_attention_params(sd: Dict[str, np.ndarray], num_heads: int,
                             attn_layers: int) -> Dict[str, Any]:
    """FeatureAttentionStatePredictor state_dict -> flax params
    (models/predictors.py; reference learning/model.py:48-153)."""
    p: Dict[str, Any] = {
        "Dense_0": _dense(sd, "feature_encoding.0"),
        "LayerNorm_0": _layernorm(sd, "feature_encoding.1"),
        # reference stores (1, F, H); our param is (F, H) (broadcast-safe
        # under vmap)
        "pos_embedding": sd["pos_embedding"][0].copy(),
        "Dense_1": _dense(sd, "output_layer"),
    }
    for i in range(attn_layers):
        p[f"_TransformerBlock_{i}"] = {
            "LayerNorm_0": _layernorm(sd, f"layers.{i}.norm1"),
            "MultiHeadDotProductAttention_0": _mha(
                sd, f"layers.{i}.attention", num_heads),
            "LayerNorm_1": _layernorm(sd, f"layers.{i}.norm2"),
            "Dense_0": _dense(sd, f"layers.{i}.ffn.0"),
            "Dense_1": _dense(sd, f"layers.{i}.ffn.3"),
        }
    return p


def cross_attention_params(sd: Dict[str, np.ndarray],
                           num_heads: int = 6) -> Dict[str, Any]:
    """CrossAttentionStatePredictor state_dict -> flax params
    (reference learning/model.py:157-202)."""
    return {
        "Dense_0": _dense(sd, "qpos_encoder"),
        "Dense_1": _dense(sd, "qvel_encoder"),
        "Dense_2": _dense(sd, "action_encoder"),
        "MultiHeadDotProductAttention_0": _mha(
            sd, "attn_qpos_to_qvel", num_heads),
        "MultiHeadDotProductAttention_1": _mha(
            sd, "attn_qvel_to_qpos", num_heads),
        "LayerNorm_0": _layernorm(sd, "fusion_layer.0"),
        "Dense_3": _dense(sd, "fusion_layer.2"),
        "Dense_4": _dense(sd, "fusion_layer.4"),
    }


def mlp_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """MLPStatePredictor (plain Sequential of Linears+ReLU) -> flax params."""
    linear_keys = sorted(
        {int(k.split(".")[1]) for k in sd if k.endswith(".weight")})
    return {f"Dense_{j}": _dense(sd, f"network.{i}")
            for j, i in enumerate(linear_keys)}


def load_reference_checkpoint(path: str, preset: str):
    """(model, {'params': ...}) from a reference .pth for a PRESETS name."""
    from ..models.predictors import (CrossAttentionStatePredictor,
                                     FeatureAttentionStatePredictor,
                                     MLPStatePredictor, make_model)

    model = make_model(preset)
    sd = load_torch_state_dict(path)
    if isinstance(model, FeatureAttentionStatePredictor):
        p = feature_attention_params(sd, model.num_heads, model.attn_layers)
    elif isinstance(model, CrossAttentionStatePredictor):
        p = cross_attention_params(sd, model.num_heads)
    elif isinstance(model, MLPStatePredictor):
        p = mlp_params(sd)
    else:  # pragma: no cover
        raise TypeError(f"no torch importer for {type(model).__name__}")
    return model, {"params": p}
