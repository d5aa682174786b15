"""Flash-fused FeatureAttention forward: the whole predictor in ONE Pallas
kernel per model step.

The estimator replan (reference src/quadruped_mppi_estimator.py:58-79;
config: FeatureAttention(37,12,512,4,2), K=65536, T=50) is matmul-bound,
but the measured flax/XLA forward sits at ~0.53 of the bf16 roofline
(PERF.md): every LayerNorm / residual-add / softmax materializes a
(K, 49, 512) intermediate in HBM — ~40 GB of elementwise traffic per
layer-step that the MXU has to wait on.

This kernel removes that traffic: the grid tiles K into blocks of
`block_b` samples, each program holds its whole residual stream in VMEM
and runs encode -> L x (LN -> QKV -> attention -> out-proj -> residual ->
LN -> FFN -> residual) -> head without touching HBM in between. Per
program the only HBM traffic is the (block_b*F, 1) input block, the
(block_b*F, 1) output column, and the weights (fetched once — their
BlockSpec index is grid-constant, so Pallas keeps them resident in VMEM
across grid steps).

Mosaic layout (v5e) — everything is strictly 2D:
- Activations live flattened as (block_b * F, H): each row is one token,
  so LayerNorm / bias / relu are row ops and every projection/FFN matmul
  is a plain 2D dot at full MXU occupancy with no F=49 sublane-padding
  waste.
- Attention runs as BLOCK-DIAGONAL 2D matmuls: per head, scores =
  q2 @ k2^T over the whole (block_b*F)-row block with an additive
  -1e9 mask on cross-sample entries, then softmax rows and P @ v2. This
  spends block_b x the minimal score/value FLOPs — ~2*F^2*H*block_b vs
  12*F*H^2 useful per sample-layer, i.e. +13% at block_b=8 — and buys a
  kernel with NO 3D ops at all. The alternatives measured worse or do
  not lower: batched dot_general compiles catastrophically slowly in
  Mosaic (~2 min PER DOT — 16 of them wedged the compiler for 40+ min),
  and the (bb, F, H) -> (bb*F, H) merge reshape crashes it outright.
- LayerNorm statistics and softmax in f32 (matching flax), matmuls in
  bf16 with f32 accumulation (preferred_element_type).

Numerics match models.fast_apply.make_fast_feature_attention (same op
order, same dtypes) — asserted in tests/test_estimator_kernel.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_params(module, params, cd, block_b):
    """Flax param tree -> flat list of 2D/3D arrays (packed eagerly at
    build time: concrete device arrays close over later jit traces as
    constants; packing lazily under a trace would leak tracers)."""
    p = params["params"] if "params" in params else params
    H = module.hidden_dim

    def cast(x):
        return jnp.asarray(x, cd)

    enc = jnp.stack([
        cast(p["Dense_0"]["kernel"][0]),       # w_enc (H,)
        cast(p["Dense_0"]["bias"]),            # b_enc
        cast(p["LayerNorm_0"]["scale"]),       # ln0_s
        cast(p["LayerNorm_0"]["bias"]),        # ln0_b
        cast(p["Dense_1"]["kernel"][:, 0]),    # w_out (head)
    ])                                          # (5, H)
    # positional embedding pre-tiled to the block's flat row layout
    pos_tiled = jnp.tile(cast(p["pos_embedding"]), (block_b, 1))

    flat = [enc, pos_tiled]
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
    return flat


def make_flash_feature_attention(module, params: Any,
                                 compute_dtype=jnp.bfloat16,
                                 block_b: int = 8,
                                 interpret: bool = False):
    """Build apply(params_ignored, x, deterministic=True) -> (..., state_dim)
    with the same call contract as models.fast_apply (drop-in for
    make_learned_dynamics / EstimatorRunner). Params are packed and captured
    at build time. `block_b` trades block-diagonal attention FLOP overhead
    (grows ~linearly) against per-grid-step overhead (shrinks)."""
    H = module.hidden_dim
    nh = module.num_heads
    hd = H // nh
    L = module.attn_layers
    F = module.state_dim + module.action_dim
    Sd = module.state_dim
    cd = compute_dtype
    inv_sqrt_hd = 1.0 / (hd ** 0.5)
    _p = params["params"] if "params" in params else params
    b_out = float(_p["Dense_1"]["bias"][0])    # scalar head bias, baked in

    def layer_norm2(x2, scale, bias):
        xf = x2.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(cd)
        return y * scale + bias

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(cd)

    def kernel_body(block, x_ref, enc_ref, pos_ref, *rest):
        layer_refs, out_ref = rest[:5 * L], rest[5 * L]
        R = block * F                                  # rows in this block
        w_enc = enc_ref[0, :]
        b_enc = enc_ref[1, :]
        ln0_s = enc_ref[2, :]
        ln0_b = enc_ref[3, :]
        w_head = enc_ref[4, :]

        # cross-sample mask: row i may attend row j iff same sample
        sample_r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // F
        sample_c = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // F
        neg = jnp.where(sample_r == sample_c, 0.0, -1e9).astype(jnp.float32)

        # token encode: Linear(1,H) is a broadcast multiply over flat rows
        h2 = x_ref[:].astype(cd) * w_enc + b_enc      # (R, H)
        h2 = layer_norm2(h2, ln0_s, ln0_b)
        h2 = jnp.maximum(h2, 0) + pos_ref[:]

        for li in range(L):
            vecs, wqkvo, w1, b1, w2 = layer_refs[5 * li: 5 * li + 5]
            ln1_s, ln1_b = vecs[0, :], vecs[1, :]
            bq, bk_, bv, bo = vecs[2, :], vecs[3, :], vecs[4, :], vecs[5, :]
            ln2_s, ln2_b = vecs[6, :], vecs[7, :]
            b2 = vecs[8, :]

            y2 = layer_norm2(h2, ln1_s, ln1_b)
            q2 = mm(y2, wqkvo[0]) + bq
            k2 = mm(y2, wqkvo[1]) + bk_
            v2 = mm(y2, wqkvo[2]) + bv

            heads = []
            for hi in range(nh):
                sl = slice(hi * hd, (hi + 1) * hd)
                s = jax.lax.dot_general(
                    q2[:, sl], k2[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * inv_sqrt_hd + neg
                # softmax over the (masked) key axis, f32 (flax parity)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cd)
                heads.append(mm(w, v2[:, sl]))
            a2 = jnp.concatenate(heads, axis=-1)       # (R, H)

            h2 = h2 + mm(a2, wqkvo[3]) + bo
            y2 = layer_norm2(h2, ln2_s, ln2_b)
            f = jnp.maximum(mm(y2, w1[:]) + b1[0, :], 0)
            h2 = h2 + mm(f, w2[:]) + b2

        # per-token scalar head: h . w_out + b_out as a column; the wrapper
        # reshapes (B*F, 1) -> (B, F) outside (XLA) and truncates to Sd
        out_ref[:] = (jnp.sum((h2 * w_head).astype(jnp.float32), axis=-1,
                              keepdims=True) + b_out)

    # packed EAGERLY at build time
    flat_full = _pack_params(module, params, cd, block_b)

    def forward_2d(x2):
        B = x2.shape[0]
        # Pallas requires block row counts divisible by 8: block*F % 8 == 0.
        # For odd F that means block must be a multiple of 8 — never shrink
        # below block_b for small batches (B < block just pads up; measured
        # block_b=4 fails lowering outright at F=49 with 196-row blocks)
        block = block_b
        pad = (-B) % block
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        Bp = B + pad
        xflat = x2.reshape(Bp * F, 1)
        grid = (Bp // block,)
        R = block * F
        flat_params = [flat_full[0], flat_full[1][:R]] + flat_full[2:]
        const = lambda nd: (lambda b: (0,) * nd)
        in_specs = [pl.BlockSpec((R, 1), lambda b: (b, 0))]
        for arr in flat_params:
            in_specs.append(pl.BlockSpec(arr.shape, const(arr.ndim)))
        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=120 * 1024 * 1024,
            )
        kern = lambda *refs: kernel_body(block, *refs)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, 1), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((Bp * F, 1), jnp.float32),
            compiler_params=compiler_params,
            interpret=interpret,
        )(xflat, *flat_params)
        out = out.reshape(Bp, F)[:, :Sd]
        return out[:B] if pad else out

    def apply(_params, x, deterministic: bool = True):
        x = jnp.asarray(x, jnp.float32)
        lead = x.shape[:-1]
        out = forward_2d(x.reshape(-1, F))
        return out.reshape(*lead, Sd)

    return apply
