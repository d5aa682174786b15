"""Mesh-parallel MPPI: shard the K sample axis across chips.

The reference's only rollout parallelism is CPU threads on one machine
(SURVEY.md §2.4); the TPU-native scale-out axis is K (samples per replan) —
and episodes for collection. Design (SURVEY.md §5 "distributed backend"):

- a 1-D device mesh over the `k` axis (multi-host: jax.distributed makes
  all pod chips visible; the same code spans hosts over ICI/DCN);
- inside `shard_map`, each shard draws its own noise (per-shard folded PRNG
  key -> deterministic regardless of sharding), vmaps K_local rollouts, and
  computes local cost sums;
- cross-chip communication is exactly three scalars-ish payloads per replan:
  beta = pmin(costs), normalizer = psum(sum_local w), weighted noise sum
  = psum((T, nu)-sized partial) — all O(T*nu), latency-bound on ICI, tiny
  compared to the rollout compute they amortize.

Weak-scaling: doubling chips doubles K at constant replan latency (the
reduction payload is K-independent).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..solver.mppi import (
    MPPIConfig,
    MPPIDiagnostics,
    MPPIState,
    _clip_ctrl,
    rollout_costs,
    rollout_costs_batched,
    shift_plan,
)

try:
    shard_map = jax.shard_map  # jax >= 0.8
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: Optional[int] = None, axis: str = "k") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def sharded_update_op(mesh: Mesh, cfg: MPPIConfig, axis: str = "k"):
    """Returns f(costs_local, noise_local) -> (update, (w_local, beta)) for
    use INSIDE shard_map: psum/pmin-reduced exponential weighting."""

    def op(costs, noise):
        beta = jax.lax.pmin(jnp.min(costs), axis)
        w = jnp.exp(-(costs - beta) / cfg.temperature)
        norm = jax.lax.psum(jnp.sum(w), axis) + cfg.weight_eps
        update = jax.lax.psum(jnp.einsum("k,ktu->tu", w, noise), axis) / norm
        return update, (w / norm, beta)

    return op


def make_sharded_kernel_mppi(
    model,
    kernel_cost_factory: Callable,
    cfg: MPPIConfig,
    mesh: Mesh,
    cost_kwargs: Optional[dict] = None,
    block_k: int = 1024,
    axis: str = "k",
    interpret: Optional[bool] = None,
):
    """Mesh-sharded MPPI over the fused Pallas rollout kernel: each device
    runs the mega-kernel on its K/n_shards local samples; the replan
    reduction is the same 3-collective psum/pmin pattern as
    make_sharded_mppi. plan(mppi_state, plant: PhysicsState, params=None)."""
    import numpy as _np

    from ..ops.rollout_kernel import build_rollout_kernel
    from ..solver.mppi import MPPIState as _MPPIState

    if interpret is None:
        # decide from the MESH's devices, not the process default backend:
        # under a forced-cpu virtual mesh the default backend can still
        # report the real accelerator (e.g. the axon TPU tunnel plugin)
        interpret = mesh.devices.flat[0].platform == "cpu"
    n_shards = mesh.shape[axis]
    if cfg.K % n_shards:
        raise ValueError(f"K={cfg.K} not divisible by mesh axis {n_shards}")
    k_local = cfg.K // n_shards
    bk = min(block_k, k_local)
    if k_local % bk:
        raise ValueError(f"local K={k_local} not divisible by block_k={bk}")
    # noise blocks: one per shard by default; cfg.noise_block makes the drawn
    # field identical to the single-device make_kernel_mppi stream
    nblock = cfg.noise_block or k_local
    if k_local % nblock:
        raise ValueError(
            f"local K={k_local} not divisible by noise_block={nblock}")
    nblocks_local = k_local // nblock

    ctrl_low = None if cfg.ctrl_low is None else _np.asarray(cfg.ctrl_low)
    ctrl_high = None if cfg.ctrl_high is None else _np.asarray(cfg.ctrl_high)
    rollouts = build_rollout_kernel(
        model, kernel_cost_factory, cfg.T, block_k=bk,
        ctrl_low=ctrl_low if cfg.clamp_rollout_ctrl else None,
        ctrl_high=ctrl_high if cfg.clamp_rollout_ctrl else None,
        cost_kwargs=cost_kwargs, interpret=interpret,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def _body(U, qpos, qvel, t0, block_keys, params):
        dtype = U.dtype
        # runtime solver scales (ops.kernel_costs.PARAM_SLOTS 11/12), matching
        # solver.kernel_mppi.make_kernel_mppi so a params vector plans
        # identically single-chip and sharded
        sigma = jnp.asarray(cfg.sigma, dtype) * jnp.exp(params[11])
        temperature = jnp.asarray(cfg.temperature, dtype) * jnp.exp(params[12])
        draws = jax.vmap(
            lambda k: jax.random.normal(k, (cfg.T, model.nu, nblock), dtype)
        )(block_keys)
        noise = sigma * jnp.moveaxis(draws, 0, 2).reshape(
            cfg.T, model.nu, k_local)
        qpK = jnp.broadcast_to(qpos[:, None], (model.nq, k_local))
        qvK = jnp.broadcast_to(qvel[:, None], (model.nv, k_local))
        t0K = jnp.broadcast_to(t0, (1, k_local))
        costs, _, _ = rollouts(qpK, qvK, t0K, U, noise, params=params)

        beta = jax.lax.pmin(jnp.min(costs), axis)
        w = jnp.exp(-(costs - beta) / temperature)
        norm = jax.lax.psum(jnp.sum(w), axis) + cfg.weight_eps
        update = jax.lax.psum(jnp.einsum("tuk,k->tu", noise, w), axis) / norm
        mean_cost = jax.lax.pmean(jnp.mean(costs), axis)
        ess = norm * norm / jax.lax.psum(jnp.sum(w * w), axis)
        wn = w / norm
        entropy = -jax.lax.psum(
            jnp.sum(wn * jnp.where(wn > 0, jnp.log(wn + 1e-30), 0.0)), axis)
        return update, beta, mean_cost, ess, entropy

    def plan(mppi_state, plant, params=None):
        key, sub = jax.random.split(mppi_state.key)
        block_keys = jax.vmap(lambda i: jax.random.fold_in(sub, i))(
            jnp.arange(n_shards * nblocks_local, dtype=jnp.uint32))
        U = mppi_state.U
        dtype = U.dtype
        if params is None:
            params = jnp.zeros(16, dtype)
        pvec = jnp.asarray(params, dtype).reshape(-1)
        pvec = jnp.pad(pvec, (0, max(0, 16 - pvec.shape[0])))
        update, beta, mean_cost, ess, entropy = _body(
            U, plant.qpos.astype(dtype), plant.qvel.astype(dtype),
            plant.time.astype(dtype), block_keys, pvec)
        update = update.astype(dtype)
        if cfg.update_mode == "replace":
            U_new = update
        else:
            U_new = U + update
        if cfg.clamp_plan:
            U_new = _clip_ctrl(U_new, cfg)
        action = _clip_ctrl(U_new[0], cfg)
        diag = MPPIDiagnostics(
            beta=beta, mean_cost=mean_cost, ess=ess,
            weight_entropy=entropy,
            update_norm=jnp.linalg.norm(update),
        )
        return action, _MPPIState(U=shift_plan(U_new, cfg.tail_decay), key=key), diag

    return plan


def make_sharded_mppi(
    dynamics_fn: Callable,
    cost_fn: Callable,
    cfg: MPPIConfig,
    mesh: Mesh,
    terminal_fn: Optional[Callable] = None,
    axis: str = "k",
    batched_dynamics: bool = False,
):
    """Sharded analog of solver.mppi.make_mppi: same semantics, K sharded
    over `mesh`. K must divide evenly by the axis size. `batched_dynamics`
    routes each shard's rollouts through rollout_costs_batched (the whole
    local K batch per dynamics call — Pallas-kernel surrogates, see
    solver.mppi.make_mppi)."""
    n_shards = mesh.shape[axis]
    if cfg.K % n_shards:
        raise ValueError(f"K={cfg.K} not divisible by mesh axis size {n_shards}")
    k_local = cfg.K // n_shards
    local_cfg = dataclasses.replace(cfg, n_samples=k_local)
    update_op = sharded_update_op(mesh, cfg, axis)
    rollout = rollout_costs_batched if batched_dynamics else rollout_costs

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def _sharded_plan_body(U, dyn_state_leaves, shard_keys):
        dyn_state = dyn_state_leaves  # pytree passes through shard_map
        key = shard_keys[0]
        sigma = jnp.asarray(cfg.sigma, dtype=U.dtype)
        noise = sigma * jax.random.normal(key, (k_local, cfg.T, U.shape[-1]),
                                          dtype=U.dtype)
        costs = rollout(dynamics_fn, cost_fn, terminal_fn, local_cfg,
                        dyn_state, U, noise)
        update, (w, beta) = update_op(costs, noise)
        mean_cost = jax.lax.pmean(jnp.mean(costs), axis)
        ess = 1.0 / jax.lax.psum(jnp.sum(w * w), axis)
        entropy = -jax.lax.psum(
            jnp.sum(w * jnp.where(w > 0, jnp.log(w + 1e-30), 0.0)), axis)
        return update, beta, mean_cost, ess, entropy

    def plan(mppi_state: MPPIState, dyn_state: Any):
        key, sub = jax.random.split(mppi_state.key)
        # one folded key per shard -> deterministic w.r.t. mesh size only
        shard_keys = jax.vmap(lambda i: jax.random.fold_in(sub, i))(
            jnp.arange(n_shards, dtype=jnp.uint32))
        U = mppi_state.U
        update, beta, mean_cost, ess, entropy = _sharded_plan_body(
            U, dyn_state, shard_keys)
        update = update.astype(U.dtype)

        if cfg.update_mode == "replace":
            U_new = update
        else:
            U_new = U + update
        if cfg.clamp_plan:
            U_new = _clip_ctrl(U_new, cfg)
        action = _clip_ctrl(U_new[0], cfg)
        U_shifted = shift_plan(U_new, cfg.tail_decay)
        diag = MPPIDiagnostics(
            beta=beta, mean_cost=mean_cost, ess=ess,
            weight_entropy=entropy,
            update_norm=jnp.linalg.norm(update),
        )
        return action, MPPIState(U=U_shifted, key=key), diag

    return plan
