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
only HBM traffic is the (block_b*F, 1) input block, the (block_b,
state_dim) output block, and the weights (fetched once — their BlockSpec
index is grid-constant, so Pallas keeps them resident in VMEM across grid
steps).

Layout notes (v5e Mosaic):
- activations live flattened as (block_b * F, H) bf16: token-parallel
  matmuls run at full MXU occupancy with no F=49 -> 56/64 sublane-padding
  waste, and each row is one token so LayerNorm/bias/relu are plain row
  ops. The caller flattens x to (B*F, 1) and the positional embedding is
  pre-tiled to (block_b*F, H), so the encode needs no reshape at all.
- attention reshapes q/k/v to (block_b, F, H) — a sublane SPLIT, which
  Mosaic supports — and runs per-head (scores, softmax, weighted-V) as
  batched dot_generals (~1% of FLOPs). The inverse MERGE reshape
  (block_b, F, H) -> (block_b*F, H) is NOT lowerable by Mosaic (measured:
  compiler crash), so the attention output returns to the flat layout
  through a VMEM scratch + per-sample dynamic-slice copy loop
  (_merge_3d_to_2d) — a pure-VMEM copy, no HBM involvement.
- LayerNorm statistics in f32 (matching flax), matmuls in bf16 with f32
  accumulation (preferred_element_type), softmax in f32.

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
    """Flax param tree -> flat list of 2D/3D arrays + static meta."""
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

    def kernel(x_ref, enc_ref, pos_ref, *rest):
        # rest = 5 refs per layer, out_ref, then 2 scratch refs
        layer_refs, out_ref = rest[:5 * L], rest[5 * L]
        a3_s, a2_s = rest[5 * L + 1], rest[5 * L + 2]
        bb = out_ref.shape[0]
        w_enc = enc_ref[0, :]
        b_enc = enc_ref[1, :]
        ln0_s = enc_ref[2, :]
        ln0_b = enc_ref[3, :]
        w_head = enc_ref[4, :]

        # token encode: Linear(1,H) is a broadcast multiply over flat rows
        h2 = x_ref[:].astype(cd) * w_enc + b_enc      # (bb*F, H)
        h2 = layer_norm2(h2, ln0_s, ln0_b)
        h2 = jnp.maximum(h2, 0) + pos_ref[:]

        def merge_3d_to_2d(val3):
            # Mosaic cannot lower the (bb, F, H) -> (bb*F, H) sublane merge
            # as a reshape (F=49 is not a sublane-tile multiple); stage the
            # value in VMEM scratch and copy per sample — pure VMEM traffic.
            a3_s[:] = val3
            def body(i, _):
                a2_s[pl.ds(i * F, F), :] = a3_s[i]
                return 0
            jax.lax.fori_loop(0, bb, body, 0, unroll=False)
            return a2_s[:]

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
            a2 = merge_3d_to_2d(jnp.concatenate(heads, axis=-1))

            h2 = h2 + mm(a2, wqkvo[3]) + bo
            y2 = layer_norm2(h2, ln2_s, ln2_b)
            f = jnp.maximum(mm(y2, w1[:]) + b1[0, :], 0)
            h2 = h2 + mm(f, w2[:]) + b2

        # per-token scalar head: h . w_out + b_out, truncated to state_dim
        out3 = jnp.sum((h2 * w_head).astype(jnp.float32).reshape(bb, F, H),
                       axis=-1) + b_out                # (bb, F) f32
        out_ref[:] = out3[:, :Sd]

    # packed EAGERLY at build time (concrete device arrays): inside a later
    # jit/eval_shape trace they close over as constants — packing lazily
    # under a trace would leak tracers into any cached callable
    flat_full = _pack_params(module, params, cd, block_b)

    def forward_2d(x2):
        B = x2.shape[0]
        block = min(block_b, B)
        pad = (-B) % block
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        Bp = B + pad
        xflat = x2.reshape(Bp * F, 1)
        grid = (Bp // block,)
        # pos_tiled is the only block-size-dependent operand: slice the
        # block_b-sized tile down (block <= block_b always)
        flat_params = [flat_full[0], flat_full[1][: block * F]] + flat_full[2:]
        const = lambda nd: (lambda b: (0,) * nd)
        in_specs = [pl.BlockSpec((block * F, 1), lambda b: (b, 0))]
        for arr in flat_params:
            in_specs.append(pl.BlockSpec(arr.shape, const(arr.ndim)))
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
            out_specs=pl.BlockSpec((block, Sd), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((Bp, Sd), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((block, F, H), cd),
                pltpu.VMEM((block * F, H), cd),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(xflat, *flat_params)
        return out[:B] if pad else out

    def apply(_params, x, deterministic: bool = True):
        x = jnp.asarray(x, jnp.float32)
        lead = x.shape[:-1]
        out = forward_2d(x.reshape(-1, F))
        return out.reshape(*lead, Sd)

    return apply
