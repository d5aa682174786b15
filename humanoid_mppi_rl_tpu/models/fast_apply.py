"""Speed-of-light FeatureAttention forward pass for estimator rollouts.

The estimator replan is matmul-bound: FeatureAttention(37,12,512,4,2) at
K=65536, T=50 is ~2.05 PFLOP per replan (per sample-step: 49 tokens x
[3x512^2 QKV + 512^2 out + 2x512x2048 FFN] x 2 layers ~ 0.63 GFLOP), so a
197 TFLOP/s (bf16) v5e chip has a hard floor of ~10.4 s/replan — the
PERF.md roofline. This module closes the gap between the measured flax
apply (~53% of that roofline) and the ceiling by restructuring the compute,
not the math:

- one fused (H, 3H) QKV projection per layer instead of three kernels;
- heads folded into a single batched einsum pair (no per-head loop);
- parameters pre-cast once to the compute dtype (bf16 on TPU) so the scan
  body carries no casts;
- token encoding evaluated as the outer-product it is (Linear(1,H) is a
  broadcast multiply, not a matmul).

Equivalent to models.predictors.FeatureAttentionStatePredictor.apply
(tested to f32 roundoff in tests/test_fast_apply.py); consumes the same
flax params (including torch-imported reference checkpoints).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def make_fast_feature_attention(module, params: Any,
                                compute_dtype=jnp.bfloat16):
    """Build apply(params_ignored, x, deterministic=True) -> (B, state_dim)
    from a FeatureAttentionStatePredictor module + its flax params.

    The returned callable has the same signature as module.apply so it can
    drop into make_learned_dynamics / EstimatorRunner unchanged. Params are
    captured (pre-packed, pre-cast) at build time; the params argument at
    call time is ignored."""
    p = params["params"] if "params" in params else params
    H = module.hidden_dim
    nh = module.num_heads
    hd = H // nh
    cd = compute_dtype

    def cast(x):
        return jnp.asarray(x, cd)

    w_enc = cast(p["Dense_0"]["kernel"][0])          # (H,)  Linear(1,H)
    b_enc = cast(p["Dense_0"]["bias"])               # (H,)
    ln0_s = cast(p["LayerNorm_0"]["scale"])
    ln0_b = cast(p["LayerNorm_0"]["bias"])
    pos = cast(p["pos_embedding"])                   # (F, H)
    w_out = cast(p["Dense_1"]["kernel"][:, 0])       # (H,)
    b_out = cast(p["Dense_1"]["bias"][0])

    layers = []
    for i in range(module.attn_layers):
        blk = p[f"_TransformerBlock_{i}"]
        mha = blk["MultiHeadDotProductAttention_0"]
        # NOTE: a fused (H, 3H) QKV projection was tried and MEASURED WORSE
        # (6.2 s vs 4.6 s at K=16384 and an HBM OOM at K=65536): it
        # materializes a (K, F, 3H) intermediate that XLA keeps live,
        # tripling the layer's activation footprint. Separate projections
        # let each q/k/v buffer die after its attention use.
        layers.append(dict(
            ln1_s=cast(blk["LayerNorm_0"]["scale"]),
            ln1_b=cast(blk["LayerNorm_0"]["bias"]),
            wq=cast(mha["query"]["kernel"]).reshape(H, H),
            bq=cast(mha["query"]["bias"]).reshape(H),
            wk=cast(mha["key"]["kernel"]).reshape(H, H),
            bk=cast(mha["key"]["bias"]).reshape(H),
            wv=cast(mha["value"]["kernel"]).reshape(H, H),
            bv=cast(mha["value"]["bias"]).reshape(H),
            wo=cast(mha["out"]["kernel"]).reshape(H, H),
            bo=cast(mha["out"]["bias"]),
            ln2_s=cast(blk["LayerNorm_1"]["scale"]),
            ln2_b=cast(blk["LayerNorm_1"]["bias"]),
            w1=cast(blk["Dense_0"]["kernel"]), b1=cast(blk["Dense_0"]["bias"]),
            w2=cast(blk["Dense_1"]["kernel"]), b2=cast(blk["Dense_1"]["bias"]),
        ))

    inv_sqrt_hd = 1.0 / (hd ** 0.5)

    def layer_norm(x, scale, bias):
        # matches flax LayerNorm: normalize in f32 for stability, scale in cd
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(cd)
        return y * scale + bias

    def apply(_params, x, deterministic: bool = True):
        # x: (..., F) scalar features; token encode = outer product
        h = x.astype(cd)[..., None] * w_enc + b_enc          # (..., F, H)
        h = layer_norm(h, ln0_s, ln0_b)
        h = jax.nn.relu(h) + pos
        for L in layers:
            y = layer_norm(h, L["ln1_s"], L["ln1_b"])
            split = lambda a: a.reshape(*a.shape[:-1], nh, hd)
            q = split(y @ L["wq"] + L["bq"])
            k = split(y @ L["wk"] + L["bk"])
            v = split(y @ L["wv"] + L["bv"])
            # scores in f32 (softmax stability), matmuls in cd
            s = jnp.einsum("...qhd,...khd->...hqk", q, k) * inv_sqrt_hd
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cd)
            a = jnp.einsum("...hqk,...khd->...qhd", w, v)
            a = a.reshape(*a.shape[:-2], H)
            h = h + a @ L["wo"] + L["bo"]
            y = layer_norm(h, L["ln2_s"], L["ln2_b"])
            y = jax.nn.relu(y @ L["w1"] + L["b1"])
            h = h + y @ L["w2"] + L["b2"]
        out = h @ w_out + b_out                               # (..., F)
        return out[..., : module.state_dim].astype(jnp.float32)

    return apply
