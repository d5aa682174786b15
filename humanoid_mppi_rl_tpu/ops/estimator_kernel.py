"""Flash-fused FeatureAttention forward: the whole predictor in ONE Pallas
kernel per model step.

The estimator replan (reference src/quadruped_mppi_estimator.py:58-79;
config: FeatureAttention(37,12,512,4,2), K=65536, T=50) is matmul-bound,
but the measured flax/XLA forward sits at ~0.53 of the bf16 roofline
(PERF.md): every LayerNorm / residual-add / softmax materializes a
(K, 49, 512) intermediate in HBM — ~40 GB of elementwise traffic per
layer-step that the MXU has to wait on.

This kernel removes that traffic entirely: the grid tiles K into blocks of
`block_b` samples, each program holds its whole residual stream in VMEM and
runs encode -> L x (LN -> QKV -> attention -> out-proj -> residual -> LN ->
FFN -> residual) -> head without touching HBM in between. Per program the
only HBM traffic is the (block_b, F) input row block, the (block_b,
state_dim) output block, and the weights (fetched once — their BlockSpec
index is grid-constant, so Pallas keeps them resident in VMEM across grid
steps).

Layout notes (v5e):
- activations live flattened as (block_b * F, H) bf16 so the token-parallel
  matmuls run at full MXU occupancy with no F=49 -> 64 sublane-padding
  waste; the attention reshapes to (block_b, F, head_dim) only for the tiny
  (~1% of FLOPs) score/value contractions, which run as batched dot_general.
- LayerNorm statistics in f32 (matching flax), matmuls in bf16 with f32
  accumulation (preferred_element_type).
- softmax in f32 over the logical F=49 key axis.

Numerics match models.fast_apply.make_fast_feature_attention (same op
order, same dtypes) — asserted in tests/test_estimator_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_params(module, params, cd):
    """Flax param tree -> flat list of padded 2D arrays + static meta."""
    p = params["params"] if "params" in params else params
    H = module.hidden_dim
    F = module.state_dim + module.action_dim

    def cast(x):
        return jnp.asarray(x, cd)

    enc = jnp.stack([
        cast(p["Dense_0"]["kernel"][0]),       # w_enc (H,)
        cast(p["Dense_0"]["bias"]),            # b_enc
        cast(p["LayerNorm_0"]["scale"]),       # ln0_s
        cast(p["LayerNorm_0"]["bias"]),        # ln0_b
        cast(p["Dense_1"]["kernel"][:, 0]),    # w_out (head)
    ])                                          # (5, H)
    pos = cast(p["pos_embedding"])              # (F, H)
    b_out = float(p["Dense_1"]["bias"][0])      # scalar, baked in

    flat = [enc, pos]
    for i in range(module.attn_layers):
        blk = p[f"_TransformerBlock_{i}"]
        mha = blk["MultiHeadDotProductAttention_0"]
        vecs = jnp.stack([
            cast(blk["LayerNorm_0"]["scale"]),
            cast(blk["LayerNorm_0"]["bias"]),
            cast(mha["query"]["bias"]).reshape(H),
            cast(mha["key"]["bias"]).reshape(H),
            cast(mha["value"]["bias"]).reshape(H),
            cast(mha["out"]["bias"]),
            cast(blk["LayerNorm_1"]["scale"]),
            cast(blk["LayerNorm_1"]["bias"]),
            cast(blk["Dense_1"]["bias"]),       # FFN down bias (H,)
        ])                                      # (9, H)
        wqkvo = jnp.stack([
            cast(mha["query"]["kernel"]).reshape(H, H),
            cast(mha["key"]["kernel"]).reshape(H, H),
            cast(mha["value"]["kernel"]).reshape(H, H),
            cast(mha["out"]["kernel"]).reshape(H, H),
        ])                                      # (4, H, H)
        w1 = cast(blk["Dense_0"]["kernel"])     # (H, 4H)
        b1 = cast(blk["Dense_0"]["bias"]).reshape(1, 4 * H)
        w2 = cast(blk["Dense_1"]["kernel"])     # (4H, H)
        flat += [vecs, wqkvo, w1, b1, w2]
    return flat, b_out


def make_flash_feature_attention(module, params: Any,
                                 compute_dtype=jnp.bfloat16,
                                 block_b: int = 128,
                                 interpret: bool = False):
    """Build apply(params_ignored, x, deterministic=True) -> (..., state_dim)
    with the same call contract as models.fast_apply (drop-in for
    make_learned_dynamics / EstimatorRunner). Params are packed and captured
    at build time."""
    H = module.hidden_dim
    nh = module.num_heads
    hd = H // nh
    L = module.attn_layers
    F = module.state_dim + module.action_dim
    Sd = module.state_dim
    cd = compute_dtype
    inv_sqrt_hd = 1.0 / (hd ** 0.5)

    flat_params, b_out = _pack_params(module, params, cd)

    def layer_norm2(x2, scale, bias):
        xf = x2.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(cd)
        return y * scale + bias

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(cd)

    def kernel(x_ref, enc_ref, pos_ref, *rest):
        layer_refs, out_ref = rest[:-1], rest[-1]
        bb = x_ref.shape[0]
        w_enc = enc_ref[0, :]
        b_enc = enc_ref[1, :]
        ln0_s = enc_ref[2, :]
        ln0_b = enc_ref[3, :]
        w_head = enc_ref[4, :]

        # token encode: outer product (Linear(1,H) is a broadcast multiply)
        x = x_ref[:].astype(cd)                       # (bb, F)
        h3 = x[:, :, None] * w_enc + b_enc            # (bb, F, H)
        h3 = layer_norm2(h3, ln0_s, ln0_b)
        h3 = jnp.maximum(h3, 0) + pos_ref[:]          # + (F, H)
        h2 = h3.reshape(bb * F, H)

        for li in range(L):
            vecs, wqkvo, w1, b1, w2 = layer_refs[5 * li: 5 * li + 5]
            ln1_s, ln1_b = vecs[0, :], vecs[1, :]
            bq, bk_, bv, bo = vecs[2, :], vecs[3, :], vecs[4, :], vecs[5, :]
            ln2_s, ln2_b = vecs[6, :], vecs[7, :]
            b2 = vecs[8, :]

            y2 = layer_norm2(h2, ln1_s, ln1_b)
            q3 = (mm(y2, wqkvo[0]) + bq).reshape(bb, F, H)
            k3 = (mm(y2, wqkvo[1]) + bk_).reshape(bb, F, H)
            v3 = (mm(y2, wqkvo[2]) + bv).reshape(bb, F, H)

            heads = []
            for hi in range(nh):
                sl = slice(hi * hd, (hi + 1) * hd)
                s = jax.lax.dot_general(
                    q3[:, :, sl], k3[:, :, sl],
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * inv_sqrt_hd
                # softmax over the key axis, f32 (flax parity)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cd)
                heads.append(jax.lax.dot_general(
                    w, v3[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(cd))
            a2 = jnp.concatenate(heads, axis=-1).reshape(bb * F, H)

            h2 = h2 + mm(a2, wqkvo[3]) + bo
            y2 = layer_norm2(h2, ln2_s, ln2_b)
            f = jnp.maximum(mm(y2, w1[:]) + b1[0, :], 0)
            h2 = h2 + mm(f, w2[:]) + b2

        # per-token scalar head: h . w_out + b_out, truncated to state_dim
        out3 = jnp.sum((h2.reshape(bb, F, H) * w_head).astype(jnp.float32),
                       axis=-1) + b_out                # (bb, F) f32
        out_ref[:] = out3[:, :Sd]

    @jax.jit
    def forward_2d(x2):
        B = x2.shape[0]
        bb = min(block_b, B)
        pad = (-B) % bb
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        Bp = B + pad
        grid = (Bp // bb,)
        const = lambda *shape: (lambda b: tuple(0 for _ in shape))
        in_specs = [pl.BlockSpec((bb, F), lambda b: (b, 0))]
        for arr in flat_params:
            in_specs.append(
                pl.BlockSpec(arr.shape, const(*arr.shape)))
        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=120 * 1024 * 1024,
            )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, Sd), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((Bp, Sd), jnp.float32),
            compiler_params=compiler_params,
            interpret=interpret,
        )(x2, *flat_params)
        return out[:B] if pad else out

    def apply(_params, x, deterministic: bool = True):
        x = jnp.asarray(x, jnp.float32)
        lead = x.shape[:-1]
        out = forward_2d(x.reshape(-1, F))
        return out.reshape(*lead, Sd)

    return apply
