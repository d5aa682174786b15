"""Functional MPPI solver core.

One parameterized engine replacing the ~12 copy-pasted per-robot MPPI loops in
the reference (canonical shape: reference src/cartpole_mppi.jl:103-123,
src/cartpole_mppi.py:88-107, src/mppi.jl:83-99, src/Humanoid_datacollection_v2.jl
mppi_step!/mppi_controller!). The algorithm per replan:

    noise   ~ N(0, sigma^2), shape (K, T, nu)
    costs_k = sum_t running_cost(step(x_t, clip(U_t + eps_t))) + terminal
    beta    = min_k costs_k
    w_k     = exp(-(costs_k - beta) / lambda);  w /= sum(w) (+eps)
    U      += sum_k w_k * noise_k          (or U := sum_k w_k * noise_k)
    action  = U[0];  U <- shift(U), tail decay

TPU-first design: the horizon is a `lax.scan`, the K samples a `vmap`; the
(beta, softmax, weighted-noise-sum) reduction is a fused Pallas kernel
(ops/mppi_update.py); sharding K across a device mesh lives in
parallel/mesh.py and only adds psum collectives around the same code.

Everything is pure: the solver owns no global state (the reference mutates a
global `U_global`); the plan `U` and PRNG key live in `MPPIState` and are
threaded explicitly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


# Dynamics step: (dyn_state, ctrl, t) -> dyn_state.  dyn_state is any pytree.
DynamicsFn = Callable[[Any, jax.Array, jax.Array], Any]
# Running cost: (dyn_state_after_step, ctrl, t) -> scalar.
CostFn = Callable[[Any, jax.Array, jax.Array], jax.Array]
# Terminal cost: (dyn_state, t) -> scalar.
TerminalFn = Callable[[Any, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    """Static MPPI hyperparameters.

    Defaults follow reference src/cartpole_mppi.py:12-15. `update_mode`
    distinguishes the accumulate update (U += sum w*eps, all sim-backed
    scripts) from the replace update (U := sum w*eps) used by the
    learned-dynamics estimators (reference src/cartpole_mppi_estimator.py:141-143).
    """

    n_samples: int = 30          # K
    horizon: int = 100           # T
    temperature: float = 1.0     # lambda
    sigma: float = 1.0           # control noise std (scalar or per-dim array)
    tail_decay: float = 0.1      # U[-1] = tail_decay * U[-2] after shift
    update_mode: str = "accumulate"   # "accumulate" | "replace"
    weight_eps: float = 0.0      # +eps in the weight normalizer (src/mppi.jl:89)
    ctrl_low: Optional[tuple] = None    # clamp for executed ctrl / plan update
    ctrl_high: Optional[tuple] = None
    clamp_plan: bool = False     # clamp U after update (src/quadruped_datacollection.py:179)
    clamp_rollout_ctrl: bool = True  # clip perturbed ctrl inside rollouts
    terminal_scale: float = 0.0  # if no terminal_fn, terminal = scale * running
    replans_per_step: int = 1    # sample/update passes per control step; the
    # v2.py humanoid collector runs mppi_step TWICE before executing + shifting
    # (reference src/Humanoid_datacollection_v2.py:303,315)
    noise_block: Optional[int] = None  # sharding-invariant noise: draw the
    # (T, nu, K) field in fixed-size K-blocks keyed by fold_in(sub, block_idx)
    # so any mesh whose K/n_shards is a multiple of noise_block samples the
    # SAME noise — makes sharded replans bit-comparable to single-device.
    # None = fastest layout (one draw single-device; one block per shard).

    @property
    def K(self) -> int:
        return self.n_samples

    @property
    def T(self) -> int:
        return self.horizon


@struct.dataclass
class MPPIState:
    """Per-controller mutable state, threaded functionally."""

    U: jax.Array          # (T, nu) nominal control plan
    key: jax.Array        # PRNG key

    @staticmethod
    def init(key: jax.Array, horizon: int, nu: int, dtype=jnp.float32) -> "MPPIState":
        return MPPIState(U=jnp.zeros((horizon, nu), dtype=dtype), key=key)

    @staticmethod
    def seeded(seed: int, horizon: int, nu: int, dtype=jnp.float32,
               impl: str = "rbg") -> "MPPIState":
        """Fresh controller state from an integer seed.

        impl="rbg" keys the noise stream off XLA's RngBitGenerator — the
        TPU's hardware-accelerated generator, ~35% cheaper than threefry
        for the per-replan (T, nu, K) stream at K=8192 (PERF.md). The
        reference has no PRNG-stream contract (Julia randn / numpy
        default_rng), so the generator choice is free; pass
        impl="threefry2x32" for jax's default reproducible-everywhere
        stream."""
        return MPPIState(U=jnp.zeros((horizon, nu), dtype=dtype),
                         key=jax.random.key(seed, impl=impl))


@struct.dataclass
class MPPIDiagnostics:
    """Per-replan observability (reference has only stdout prints)."""

    beta: jax.Array           # min sampled cost
    mean_cost: jax.Array
    ess: jax.Array            # effective sample size 1/sum(w^2)
    weight_entropy: jax.Array
    update_norm: jax.Array


def _clip_ctrl(u: jax.Array, cfg: MPPIConfig) -> jax.Array:
    if cfg.ctrl_low is not None and cfg.ctrl_high is not None:
        lo = jnp.asarray(cfg.ctrl_low, dtype=u.dtype)
        hi = jnp.asarray(cfg.ctrl_high, dtype=u.dtype)
        return jnp.clip(u, lo, hi)
    return u


def rollout_costs(
    dynamics_fn: DynamicsFn,
    cost_fn: CostFn,
    terminal_fn: Optional[TerminalFn],
    cfg: MPPIConfig,
    dyn_state: Any,
    U: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Cost of each of K perturbed plans. noise: (K, T, nu) -> costs (K,).

    Mirrors the reference rollout loops (src/cartpole_mppi.py:59-85): the cost
    is evaluated on the post-step state with the (clipped) applied control.
    The horizon is a sequential `lax.scan`; samples are a `vmap` — the TPU
    equivalent of the reference's thread-per-sample CPU pools.
    """

    def one_sample(eps: jax.Array) -> jax.Array:
        def body(carry, inp):
            state, acc = carry
            u_nom, e, t = inp
            u = u_nom + e
            if cfg.clamp_rollout_ctrl:
                u = _clip_ctrl(u, cfg)
            state = dynamics_fn(state, u, t)
            acc = acc + cost_fn(state, u, t)
            return (state, acc), None

        ts = jnp.arange(cfg.T)
        # accumulator dtype must match the cost dtype exactly (weak-typing
        # and x64 promotion make this hard to predict) or scan's carry type
        # check fails — so ask the tracer
        acc_dtype = jax.eval_shape(
            lambda s, u, t: cost_fn(dynamics_fn(s, u, t), u, t),
            dyn_state, U[0] + eps[0], ts[0],
        ).dtype
        (final_state, acc), _ = jax.lax.scan(
            body, (dyn_state, jnp.asarray(0.0, dtype=acc_dtype)), (U, eps, ts)
        )
        if terminal_fn is not None:
            acc = acc + terminal_fn(final_state, jnp.asarray(cfg.T))
        elif cfg.terminal_scale:
            acc = acc + cfg.terminal_scale * cost_fn(
                final_state, jnp.zeros_like(U[0]), jnp.asarray(cfg.T)
            )
        return acc

    return jax.vmap(one_sample)(noise)


def rollout_costs_batched(
    dynamics_fn: DynamicsFn,
    cost_fn: CostFn,
    terminal_fn: Optional[TerminalFn],
    cfg: MPPIConfig,
    dyn_state: Any,
    U: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """rollout_costs for dynamics that consume the K batch natively.

    `dynamics_fn(x, u, t)` here takes x: (K, nx) and u: (K, nu) and returns
    (K, nx) — required when the dynamics is itself a Pallas kernel (e.g.
    ops/estimator_kernel.make_flash_feature_attention): tracing it per-sample
    under the vmap in `rollout_costs` would hand Pallas a batch-of-1 grid per
    sample instead of one K-wide grid. Cost/terminal fns stay per-sample and
    are vmapped here (they are elementwise jnp, so the vmap is free)."""
    K = noise.shape[0]
    x0 = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (K,) + a.shape), dyn_state)
    ts = jnp.arange(cfg.T)
    noise_t = jnp.swapaxes(noise, 0, 1)              # (T, K, nu)
    cost_v = jax.vmap(cost_fn, in_axes=(0, 0, None))

    def body(carry, inp):
        state, acc = carry
        u_nom, e, t = inp
        u = u_nom[None, :] + e
        if cfg.clamp_rollout_ctrl:
            u = _clip_ctrl(u, cfg)
        state = dynamics_fn(state, u, t)
        acc = acc + cost_v(state, u, t)
        return (state, acc), None

    acc_dtype = jax.eval_shape(
        lambda s, u, t: cost_fn(s, u, t), dyn_state, U[0], ts[0]).dtype
    (final_state, acc), _ = jax.lax.scan(
        body, (x0, jnp.zeros((K,), dtype=acc_dtype)), (U, noise_t, ts))
    if terminal_fn is not None:
        acc = acc + jax.vmap(terminal_fn, in_axes=(0, None))(
            final_state, jnp.asarray(cfg.T))
    elif cfg.terminal_scale:
        acc = acc + cfg.terminal_scale * cost_v(
            final_state, jnp.zeros((K, U.shape[-1]), U.dtype),
            jnp.asarray(cfg.T))
    return acc


def sample_noise_blocked(sub: jax.Array, T: int, nu: int, n_local: int,
                         block: int, block_offset=0,
                         dtype=jnp.float32) -> jax.Array:
    """Draw an (T, nu, n_local) noise field as n_local/block fixed-size
    K-blocks, block b keyed by fold_in(sub, block_offset + b).

    The global noise field for sample k depends only on (sub, k // block),
    never on the device layout — so a sharded replan whose shards each hold a
    whole number of blocks draws exactly the single-device stream
    (MPPIConfig.noise_block)."""
    if n_local % block:
        raise ValueError(f"n_local={n_local} not divisible by noise block {block}")
    nblocks = n_local // block
    idx = jnp.asarray(block_offset, jnp.uint32) + jnp.arange(nblocks, dtype=jnp.uint32)
    keys = jax.vmap(lambda i: jax.random.fold_in(sub, i))(idx)
    draws = jax.vmap(lambda k: jax.random.normal(k, (T, nu, block), dtype))(keys)
    return jnp.moveaxis(draws, 0, 2).reshape(T, nu, n_local)


def mppi_weights(costs: jax.Array, temperature: float, weight_eps: float = 0.0):
    """Exponential weighting (reference src/cartpole_mppi.py:91-94)."""
    beta = jnp.min(costs)
    w = jnp.exp(-(costs - beta) / temperature)
    w = w / (jnp.sum(w) + weight_eps)
    return w, beta


def weighted_noise_update(weights: jax.Array, noise: jax.Array) -> jax.Array:
    """sum_k w_k * noise_k -> (T, nu). XLA turns this einsum into an MXU matmul;
    the fused (softmax+matmul) Pallas version lives in ops/mppi_update.py."""
    return jnp.einsum("k,ktu->tu", weights, noise)


def shift_plan(U: jax.Array, tail_decay: float) -> jax.Array:
    """Receding-horizon shift (reference src/cartpole_mppi.py:102-103)."""
    return jnp.concatenate([U[1:], tail_decay * U[-1:]], axis=0)


def make_mppi(
    dynamics_fn: DynamicsFn,
    cost_fn: CostFn,
    cfg: MPPIConfig,
    terminal_fn: Optional[TerminalFn] = None,
    nu: Optional[int] = None,
    update_op: Optional[Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]] = None,
    batched_dynamics: bool = False,
):
    """Build the pure `plan` function.

    plan(mppi_state, dyn_state) -> (action, new_mppi_state, diagnostics)

    `update_op(costs, noise) -> (update, aux)` lets callers swap in the Pallas
    fused weighting kernel or a psum-sharded version; default is plain jnp.
    `batched_dynamics=True` routes rollouts through `rollout_costs_batched`
    for dynamics that consume the whole (K, nx) batch per step (Pallas-kernel
    surrogates).
    """
    rollout = rollout_costs_batched if batched_dynamics else rollout_costs

    def plan(mppi_state: MPPIState, dyn_state: Any, noise: Any = None):
        """noise: optional injected (K, T, nu) perturbation field replacing
        the PRNG draw — the matched-noise trajectory-parity contract
        (SURVEY.md §7 'noise-stream contract'): feeding the reference
        loop's recorded stream must reproduce its control sequence."""
        if noise is not None and cfg.replans_per_step != 1:
            raise ValueError("noise injection requires replans_per_step=1")
        key = mppi_state.key
        U = mppi_state.U
        sigma = jnp.asarray(cfg.sigma, dtype=U.dtype)

        # one or more sample->weight->update passes before acting; only the
        # last pass's diagnostics survive (unrolled — replans_per_step <= 2
        # in practice)
        injected = noise
        for _ in range(cfg.replans_per_step):
            key, sub = jax.random.split(key)
            noise = injected if injected is not None else (
                sigma * jax.random.normal(
                    sub, (cfg.K, cfg.T, U.shape[-1]), dtype=U.dtype))
            costs = rollout(
                dynamics_fn, cost_fn, terminal_fn, cfg, dyn_state, U, noise)
            if update_op is not None:
                update, (w, beta) = update_op(costs, noise)
            else:
                w, beta = mppi_weights(costs, cfg.temperature, cfg.weight_eps)
                update = weighted_noise_update(w, noise)
            # contain cost-side dtype drift (e.g. f64 cost constants under x64)
            update = update.astype(U.dtype)

            if cfg.update_mode == "replace":
                U = update
            else:
                U = U + update
            if cfg.clamp_plan:
                U = _clip_ctrl(U, cfg)
        U_new = U

        action = _clip_ctrl(U_new[0], cfg)
        U_shifted = shift_plan(U_new, cfg.tail_decay)

        diag = MPPIDiagnostics(
            beta=beta,
            mean_cost=jnp.mean(costs),
            ess=1.0 / jnp.sum(w * w),
            weight_entropy=-jnp.sum(w * jnp.where(w > 0, jnp.log(w + 1e-30), 0.0)),
            update_norm=jnp.linalg.norm(update),
        )
        return action, MPPIState(U=U_shifted, key=key), diag

    return plan
