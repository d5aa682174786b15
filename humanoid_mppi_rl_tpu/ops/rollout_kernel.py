"""Fused MPPI rollout mega-kernel.

One `pl.pallas_call` evaluates ALL T horizon steps of B samples: physics
(scalar_physics.scalar_step — FK, CRBA, contacts, sparse Cholesky), control
clamping, and the task cost, entirely in VMEM/vregs. HBM traffic per rollout
block is just: initial state in, noise stream in, costs (+ final state) out.
This replaces the array-engine rollout path that cost ~60 ms/step at K=8192
in launch overhead and HBM round-trips (the array engine stays as the
semantic oracle and the plant-stepping path).

Layout: sample-major-last — arrays are (field, K) so the MPPI sample axis is
the TPU lane axis; the kernel grid tiles K into blocks of `block_k` lanes.

reference parity: this computes exactly the K x T rollout loops of
src/cartpole_mppi.py:59-85 / src/Humanoid_datacollection_v2.jl:167-185 with
costs accumulated on post-step states.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.model import PhysicsModel
from . import scalar_physics as sph


def build_rollout_kernel(
    model: PhysicsModel,
    cost_factory: Callable,
    horizon: int,
    block_k: int = 1024,
    ctrl_low: Optional[np.ndarray] = None,
    ctrl_high: Optional[np.ndarray] = None,
    terminal: bool = True,
    cost_kwargs: Optional[dict] = None,
    interpret: bool = False,
):
    """Returns rollouts(qpos0 (nq,K), qvel0 (nv,K), time0 (1,K), U (T,nu),
    noise (T,nu,K)) -> costs (K,).

    cost_factory: ops.kernel_costs factory -> (running(ctx,t), terminal(ctx)).
    """
    # round-5: ball joints (quaternion FK/S rows, springs, limits,
    # integration), multi-dof ball/free motors, tendon and site
    # transmissions, and plane-vs-mesh contacts all run on the kernel path
    # (ops/scalar_physics extensions, kernel≡array parity at the arm5 robot
    # in tests/test_kernel.py). Remaining array-engine-only: meshes in
    # NON-plane pairs (primitive-vs-mesh / mesh-vs-mesh hull narrowphase).
    from ..physics.model import GEOM_MESH, GEOM_PLANE
    if model.spatial_tendons:
        raise NotImplementedError(
            "spatial (site-chain) tendons are array-engine-only (state-"
            "dependent length/moment, engine.spatial_tendon_geometry)")
    for pair in model.contact_pairs:
        g1 = model.geoms[pair.geom1]
        g2 = model.geoms[pair.geom2]
        if (g1.gtype == GEOM_MESH or g2.gtype == GEOM_MESH) \
                and g1.gtype != GEOM_PLANE:
            raise NotImplementedError(
                "mesh-vs-primitive / mesh-vs-mesh pairs are array-engine-"
                "only (hull-SDF narrowphase, physics/contact.py); the "
                "kernel supports plane-vs-mesh")
    nq, nv, nu = model.nq, model.nv, model.nu
    T = horizon
    kw = dict(cost_kwargs or {})
    import inspect
    if "horizon" in inspect.signature(cost_factory).parameters:
        # clock-dependent terminals (humanoid_v1) need the static horizon so
        # their terminal gait clock reads t=T like the array solver
        kw.setdefault("horizon", T)
    running_cost, terminal_cost = cost_factory(model, **kw)
    h = model.timestep
    NP = 16  # runtime cost-parameter slots (episode goal, gait tunables,
    # solver scales — see ops.kernel_costs.PARAM_SLOTS), fixed width

    clo = None if ctrl_low is None else [float(x) for x in ctrl_low]
    chi = None if ctrl_high is None else [float(x) for x in ctrl_high]

    def kernel(qpos_ref, qvel_ref, t0_ref, U_ref, noise_ref, params_ref,
               cost_ref, qpos_out_ref, qvel_out_ref):
        qpos = [qpos_ref[i, :] for i in range(nq)]
        qvel = [qvel_ref[i, :] for i in range(nv)]
        t0 = t0_ref[0, :]
        params = [params_ref[0, i] for i in range(NP)]
        fwd = sph.scalar_forward(model, qpos, qvel)
        zero = jnp.zeros_like(qpos[0])

        def make_ctx(fwd2, qpos2, qvel2, u, time):
            ctx = sph.ctx_from(model, fwd2, qpos2, qvel2, u, time)
            ctx.params = params
            return ctx

        def body(t, carry):
            qpos, qvel, fwd, cost = carry
            u = []
            for i in range(nu):
                ui = U_ref[t, i] + noise_ref[t, i, :]
                if clo is not None:
                    ui = jnp.clip(ui, clo[i], chi[i])
                u.append(ui)
            time = t0 + t.astype(t0.dtype) * h
            qpos2, qvel2, _ = sph.scalar_step(model, qpos, qvel, u, time, fwd=fwd)
            fwd2 = sph.scalar_forward(model, qpos2, qvel2)
            ctx = make_ctx(fwd2, qpos2, qvel2, u, time + h)
            cost = cost + running_cost(ctx, t)
            return (qpos2, qvel2, fwd2, cost)

        qpos, qvel, fwd, cost = jax.lax.fori_loop(
            0, T, body, (qpos, qvel, fwd, zero))

        if terminal:
            ctx = make_ctx(fwd, qpos, qvel, [0.0] * nu, t0 + T * h)
            cost = cost + terminal_cost(ctx)

        cost_ref[0, :] = cost
        for i in range(nq):
            qpos_out_ref[i, :] = qpos[i]
        for i in range(nv):
            qvel_out_ref[i, :] = qvel[i]

    def rollouts(qpos0, qvel0, time0, U, noise, params=None):
        K = qpos0.shape[-1]
        assert K % block_k == 0, (K, block_k)
        if params is None:
            params = jnp.zeros((1, NP), qpos0.dtype)
        else:
            params = jnp.asarray(params, qpos0.dtype).reshape(1, -1)
            params = jnp.pad(params, ((0, 0), (0, NP - params.shape[1])))
        grid = (K // block_k,)
        out_shapes = (
            jax.ShapeDtypeStruct((1, K), qpos0.dtype),
            jax.ShapeDtypeStruct((nq, K), qpos0.dtype),
            jax.ShapeDtypeStruct((nv, K), qpos0.dtype),
        )
        # K blocks are independent -> "parallel" grid; the default 16 MB
        # scoped-VMEM cap forces block_k<=512 on the humanoid (nq=28) —
        # raising it to 100 MB (v5e has 128 MB VMEM) admits block_k=1024,
        # which halves replan latency (6.8 -> 3.9 ms at K=8192, T=64) by
        # giving the VPU 8 vregs of independent lanes per physics op to
        # pipeline across the long dependency chains of the step.
        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            )
        costs, qpos_f, qvel_f = pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=compiler_params,
            in_specs=[
                pl.BlockSpec((nq, block_k), lambda k: (0, k)),
                pl.BlockSpec((nv, block_k), lambda k: (0, k)),
                pl.BlockSpec((1, block_k), lambda k: (0, k)),
                pl.BlockSpec((T, nu), lambda k: (0, 0)),
                pl.BlockSpec((T, nu, block_k), lambda k: (0, 0, k)),
                pl.BlockSpec((1, NP), lambda k: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k), lambda k: (0, k)),
                pl.BlockSpec((nq, block_k), lambda k: (0, k)),
                pl.BlockSpec((nv, block_k), lambda k: (0, k)),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(qpos0, qvel0, time0, U, noise, params)
        return costs[0], qpos_f, qvel_f

    return rollouts
