"""Primal Newton constraint solver — the exact analog of MuJoCo's Newton
solver (the solver the reference runs through mj_step: reference
src/quadruped_datacollection.py:152 steps go1.xml with cone="elliptic"
impratio="100"; src/Humanoid_datacollection_v2.jl:260 steps humanoid.xml
with the default pyramidal cone).

MuJoCo's forward constraint problem is strictly convex in qacc:

    qacc = argmin_x  1/2 (x-a0)^T M (x-a0)  +  sum_i s_i(J_i x - aref_i)

where a0 is the unconstrained (smooth) acceleration and s_i is the convex
dual-zone penalty of constraint row/block i with regularizer R_i:

  - inequality rows (joint/tendon limits, frictionless contact normals,
    pyramidal friction-cone facets):
        s(u) = u^2/(2R) for u < 0, else 0           (f = -u/R >= 0)
  - dof-friction rows (dof_frictionloss):  Huber
        s(u) = u^2/(2R) for |u| <= R*fl, else fl*|u| - R*fl^2/2
        (force clamped to [-fl, fl])
  - elliptic friction-cone blocks (condim rows [N, T1, T2(, Wn, Wt1, Wt2)]):
    with per-dim coefficients mu_i (mjContact.friction), scaled coordinates
    u'_i = u_i mu_i/mu1 and T = ||u'||, R_t = R_N/impratio:
      top     (separating, N >= mu T):            s = 0
      bottom  (sticking,   T <= -mu N / impratio): s = N^2/(2 R_N) + T^2/(2 R_t)
      middle  (sliding):   s = (mu T - N)^2 / (2 R_m),
                           R_m = R_N (1 + mu^2/impratio)
    The R structure R_i = R_N (mu1/mu_i)^2 / impratio and the cone
    ||f'|| = mu f_N with f'_i = f_i mu1/mu_i were verified directly against
    mjData.efc_R / efc_force on reference golden frames
    (scripts/dev_go1_golden.py).

Because the problem is strictly convex, its minimizer is unique — solving
the same rows with exact second-order steps reproduces MuJoCo's qacc to
solver tolerance, independent of warmstarts. Newton with exact zone
Hessians + a safeguarded exact line search converges in <~15 iterations on
the task robots.

All shapes are static (candidate rows gated by `active`), the iteration is
a lax.while_loop — jit/vmap-compatible, no data-dependent python control
flow (TPU/XLA constraint, SURVEY.md §7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .contact import (RESTITUTION_VCAP_ENV, collect_contact_rows, impedance,
                      solref_kb)

_MINIMP = 1e-4   # mjMINIMP/mjMAXIMP impedance clamps
_MAXIMP = 0.9999


class _Rows(NamedTuple):
    """Static-shape constraint rows, grouped by class.

    Layout of the concatenated row axis (static slices):
      [ ineq rows | friction rows | elliptic blocks (nb, dim) flattened ]
    """
    J: jax.Array          # (C, nv)
    aref: jax.Array       # (C,)
    R: jax.Array          # (C,) regularizer (already impedance-scaled)
    active: jax.Array     # (C,) 0/1
    n_ineq: int
    n_fric: int
    fl: jax.Array         # (n_fric,) frictionloss bounds
    # elliptic blocks, one entry per distinct dim: (start, nb, dim, mu (nb, dim-1))
    blocks: tuple


def _cap_aref(aref, v_row, h):
    """Restitution cap on contact-normal rows (contact.RESTITUTION_VCAP_ENV,
    the environment-tier value): braking is unbounded, outward push limited
    to the cap separation velocity, floored at zero so a row already
    separating keeps its raw (negative) braking aref — see
    engine._coupled_constraint_terms."""
    return jnp.minimum(
        aref, jnp.maximum((RESTITUTION_VCAP_ENV - v_row) / h, 0.0))


def build_rows(model, state, S, dtype):
    """Assemble all constraint rows for the current state.

    Returns a _Rows with rows ordered [ineq | friction | elliptic-blocks].
    Inequality rows: joint limits, tendon limits, frictionless contact
    normals, and (pyramidal models) friction-cone facets.
    """
    nv = model.nv
    qpos, qvel = state.qpos, state.qvel
    h = float(model.timestep)
    imp_ratio = float(model.impratio)

    Js_i, arefs_i, Rs_i, act_i = [], [], [], []       # inequality rows
    Js_f, arefs_f, Rs_f, fls = [], [], [], []         # dof-friction rows
    blocks = []                                        # elliptic blocks
    Js_b, arefs_b, Rs_b, act_b = [], [], [], []

    rows = collect_contact_rows(model, state, S) if model.contact_pairs else None

    # ---- contact rows ----------------------------------------------------
    if rows is not None:
        d_r = jnp.clip(rows["d_r"], _MINIMP, _MAXIMP)
        base = d_r * rows["k_base"] * rows["pen"]
        aref_n_all = _cap_aref(base - rows["b_ref"] * rows["vn"], rows["vn"], h)
        R_n_all = (1.0 - d_r) / d_r * jnp.maximum(rows["invw"], 1e-12)

        n_plane = rows["n_plane"]
        n_self = rows["n_self"]
        cd_plane = rows["condim_plane"]               # static (n_plane,)
        mu_plane = np.asarray(rows["mu_plane_static"])

        if model.cone == 1:
            # ----- elliptic: group plane rows by condim -------------------
            fri5 = rows["fri5"]                        # (P, 5) traced
            for dim in (1, 3, 4, 6):
                sel = np.nonzero(cd_plane == dim)[0]
                if sel.size == 0:
                    continue
                if dim == 1:
                    Js_i.append(rows["JpN"][sel])
                    arefs_i.append(aref_n_all[sel])
                    Rs_i.append(R_n_all[sel])
                    act_i.append(rows["active"][sel])
                    continue
                Jrows = [rows["JpN"], rows["Jt1"], rows["Jt2"],
                         rows["JwN"], rows["Jwt1"], rows["Jwt2"]][:dim]
                vels = [rows["vn"], rows["vt1"], rows["vt2"]]
                # angular row velocities: Jw . qvel
                if dim > 3:
                    vels += [rows["JwN"] @ qvel, rows["Jwt1"] @ qvel,
                             rows["Jwt2"] @ qvel]
                mu1 = jnp.maximum(fri5[sel, 0], 1e-9)       # (nb,)
                mus = fri5[sel, : dim - 1]                  # (nb, dim-1)
                Jb = jnp.stack([Jr[sel] for Jr in Jrows], 1)   # (nb, dim, nv)
                # friction-dim aref = -b * v (no position term)
                aref_b = jnp.concatenate(
                    [aref_n_all[sel][:, None]] +
                    [(-rows["b_ref"][sel] * v[sel])[:, None]
                     for v in vels[1:]], axis=1)            # (nb, dim)
                ratio = (mu1[:, None] / jnp.maximum(mus, 1e-12)) ** 2
                R_b = jnp.concatenate(
                    [R_n_all[sel][:, None],
                     R_n_all[sel][:, None] * ratio / imp_ratio], axis=1)
                start = None  # filled at concat time
                blocks.append(dict(dim=dim, nb=sel.size, mu=mus, mu1=mu1))
                Js_b.append(Jb.reshape(sel.size * dim, nv))
                arefs_b.append(aref_b.reshape(-1))
                Rs_b.append(R_b.reshape(-1))
                act_b.append(jnp.repeat(rows["active"][sel], dim))
            # self rows (dim = condim_self_max, traced friction)
            if n_self:
                sl = slice(n_plane, n_plane + n_self)
                dim = rows["condim_self_max"]
                if dim == 1:
                    Js_i.append(rows["JpN"][sl])
                    arefs_i.append(aref_n_all[sl])
                    Rs_i.append(R_n_all[sl])
                    act_i.append(rows["active"][sl])
                else:
                    fri5s = rows["fri5"][sl]
                    mu1 = jnp.maximum(fri5s[:, 0], 1e-9)
                    mus = fri5s[:, : dim - 1]
                    Jrows = [rows["JpN"], rows["Jt1"], rows["Jt2"],
                             rows["JwN"], rows["Jwt1"], rows["Jwt2"]][:dim]
                    vels = [rows["vn"], rows["vt1"], rows["vt2"]]
                    if dim > 3:
                        vels += [rows["JwN"] @ qvel, rows["Jwt1"] @ qvel,
                                 rows["Jwt2"] @ qvel]
                    Jb = jnp.stack([Jr[sl] for Jr in Jrows], 1)
                    aref_b = jnp.concatenate(
                        [aref_n_all[sl][:, None]] +
                        [(-rows["b_ref"][sl] * v[sl])[:, None]
                         for v in vels[1:]], axis=1)
                    ratio = (mu1[:, None] / jnp.maximum(mus, 1e-12)) ** 2
                    R_b = jnp.concatenate(
                        [R_n_all[sl][:, None],
                         R_n_all[sl][:, None] * ratio / imp_ratio], axis=1)
                    blocks.append(dict(dim=dim, nb=n_self, mu=mus, mu1=mu1))
                    Js_b.append(Jb.reshape(n_self * dim, nv))
                    arefs_b.append(aref_b.reshape(-1))
                    Rs_b.append(R_b.reshape(-1))
                    act_b.append(jnp.repeat(rows["active"][sl], dim))
        else:
            # ----- pyramidal: facet rows (as mj_makeConstraint) -----------
            # self rows: frictionless single-normal rows when every self
            # candidate is condim 1 (humanoid — mj emits dim-1 rows with
            # R=(1-d)/d*invw there; forcing them into 4 coincident mu=0
            # facets zeroed R and overshot the force, golden frame 1394),
            # pyramid facets otherwise
            self_idx = n_plane + np.arange(n_self)
            self_frictionless = rows["condim_self_max"] == 1
            fr = np.concatenate([
                np.nonzero(mu_plane > 0)[0],
                self_idx if not self_frictionless else np.zeros(0, np.int64),
            ]).astype(np.int64)
            nf = np.concatenate([
                np.nonzero(mu_plane == 0)[0],
                self_idx if self_frictionless else np.zeros(0, np.int64),
            ]).astype(np.int64)
            if nf.size:
                Js_i.append(rows["JpN"][nf])
                arefs_i.append(aref_n_all[nf])
                Rs_i.append(R_n_all[nf])
                act_i.append(rows["active"][nf])
            if fr.size:
                mu_f = rows["mu"][fr][:, None, None]
                Jn = rows["JpN"][fr]
                Jt = jnp.stack([rows["Jt1"][fr], rows["Jt2"][fr]], 1)
                vt = jnp.stack([rows["vt1"][fr], rows["vt2"][fr]], 1)
                sgn = jnp.asarray([1.0, -1.0], dtype)
                Jpyr = (Jn[:, None, None, :]
                        + mu_f[..., None] * sgn[None, None, :, None]
                        * Jt[:, :, None, :])
                vel = (rows["vn"][fr][:, None, None]
                       + mu_f * sgn[None, None, :] * vt[:, :, None])
                aref_p = _cap_aref(base[fr][:, None, None]
                                   - rows["b_ref"][fr][:, None, None] * vel,
                                   vel, h)
                F = fr.size
                mu1 = rows["mu"][fr]
                # mj_diagApprox pyramid facet law (dev_frame_triage.py)
                R_pyr = ((1.0 - d_r[fr]) / d_r[fr]
                         * jnp.maximum(rows["invw"][fr], 1e-12)
                         * 2.0 * mu1 * mu1 * (1.0 + mu1 * mu1))
                Js_i.append(Jpyr.reshape(F * 4, nv))
                arefs_i.append(aref_p.reshape(F * 4))
                Rs_i.append(jnp.repeat(R_pyr, 4))
                act_i.append(jnp.repeat(rows["active"][fr], 4))

    # ---- joint limit rows ------------------------------------------------
    if model.hs_qposadr.shape[0] and model.hs_limited.any():
        qadr = jnp.asarray(model.hs_qposadr)
        dadr = jnp.asarray(model.hs_dofadr)
        q, v = qpos[qadr], qvel[dadr]
        lo = jnp.asarray(model.hs_range[:, 0], dtype)
        hi = jnp.asarray(model.hs_range[:, 1], dtype)
        lim = jnp.asarray(model.hs_limited, dtype)
        below = jnp.maximum(lo - q, 0.0)
        above = jnp.maximum(q - hi, 0.0)
        viol = below + above
        s = jnp.sign(below - above)
        k_base, b_ref = solref_kb(model.hs_limit_solref, model.hs_limit_solimp)
        d_l = jnp.clip(impedance(viol, model.hs_limit_solimp).astype(dtype),
                       _MINIMP, _MAXIMP)
        E = np.zeros((len(model.hs_dofadr), nv))
        E[np.arange(len(model.hs_dofadr)), model.hs_dofadr] = 1.0
        Js_i.append(s[:, None] * jnp.asarray(E, dtype))
        arefs_i.append(d_l * jnp.asarray(k_base, dtype) * viol
                       - jnp.asarray(b_ref, dtype) * (s * v))
        Rs_i.append((1.0 - d_l) / d_l
                    * jnp.maximum(jnp.asarray(model.hs_limit_invw0, dtype),
                                  1e-12))
        act_i.append((viol > 0).astype(dtype) * lim)

    # ---- tendon limit rows -----------------------------------------------
    if model.tendon_coef.shape[0] and model.tendon_limited.any():
        not_spatial = (np.ones(model.tendon_coef.shape[0])
                       if model.tendon_is_spatial is None
                       else 1.0 - model.tendon_is_spatial.astype(float))
        coef = jnp.asarray(model.tendon_coef, dtype)
        qd = jnp.zeros(nv, dtype).at[jnp.asarray(model.hs_dofadr)].set(
            qpos[jnp.asarray(model.hs_qposadr)])
        L = coef @ qd
        Ldot = coef @ qvel
        lo = jnp.asarray(model.tendon_range[:, 0], dtype)
        hi = jnp.asarray(model.tendon_range[:, 1], dtype)
        lim = jnp.asarray(model.tendon_limited * not_spatial, dtype)
        below = jnp.maximum(lo - L, 0.0)
        above = jnp.maximum(L - hi, 0.0)
        viol = below + above
        s = jnp.sign(below - above)
        k_base, b_ref = solref_kb(model.tendon_limit_solref,
                                  model.tendon_limit_solimp)
        d_t = jnp.clip(impedance(viol, model.tendon_limit_solimp).astype(dtype),
                       _MINIMP, _MAXIMP)
        Js_i.append(s[:, None] * coef)
        arefs_i.append(d_t * jnp.asarray(k_base, dtype) * viol
                       - jnp.asarray(b_ref, dtype) * (s * Ldot))
        Rs_i.append((1.0 - d_t) / d_t
                    * jnp.maximum(jnp.asarray(model.tendon_invweight0, dtype),
                                  1e-12))
        act_i.append((viol > 0).astype(dtype) * lim)

    # ---- spatial-tendon limit rows (round-5: traced site-chain moment) ---
    if model.spatial_tendons:
        sids = np.array([t[0] for t in model.spatial_tendons])
        if model.tendon_limited[sids].any():
            from .engine import spatial_tendon_geometry
            L_sp, M_sp = spatial_tendon_geometry(model, state)
            Ldot = M_sp @ qvel
            lo = jnp.asarray(model.tendon_range[sids, 0], dtype)
            hi = jnp.asarray(model.tendon_range[sids, 1], dtype)
            lim = jnp.asarray(model.tendon_limited[sids], dtype)
            below = jnp.maximum(lo - L_sp, 0.0)
            above = jnp.maximum(L_sp - hi, 0.0)
            viol = below + above
            s = jnp.sign(below - above)
            k_base, b_ref = solref_kb(model.tendon_limit_solref[sids],
                                      model.tendon_limit_solimp[sids])
            d_t = jnp.clip(impedance(
                viol, model.tendon_limit_solimp[sids]).astype(dtype),
                _MINIMP, _MAXIMP)
            Js_i.append(s[:, None] * M_sp)
            arefs_i.append(d_t * jnp.asarray(k_base, dtype) * viol
                           - jnp.asarray(b_ref, dtype) * (s * Ldot))
            Rs_i.append((1.0 - d_t) / d_t
                        * jnp.maximum(jnp.asarray(
                            model.tendon_invweight0[sids], dtype), 1e-12))
            act_i.append((viol > 0).astype(dtype) * lim)

    # ---- dof-friction (frictionloss) rows --------------------------------
    fl_dofs = np.nonzero(model.dof_frictionloss > 0)[0]
    if fl_dofs.size:
        kbf, bf = solref_kb(model.dof_solref[fl_dofs],
                            model.dof_solimp[fl_dofs])
        d_f = np.clip(model.dof_solimp[fl_dofs, 0], _MINIMP, _MAXIMP)  # d at pos=0
        E = np.zeros((fl_dofs.size, nv))
        E[np.arange(fl_dofs.size), fl_dofs] = 1.0
        Js_f.append(jnp.asarray(E, dtype))
        arefs_f.append(-jnp.asarray(bf, dtype) * qvel[jnp.asarray(fl_dofs)])
        Rs_f.append(jnp.asarray(
            (1.0 - d_f) / d_f
            * np.maximum(model.dof_invweight0[fl_dofs], 1e-12), dtype))
        fls.append(jnp.asarray(model.dof_frictionloss[fl_dofs], dtype))

    def cat(parts, width=None):
        if parts:
            return jnp.concatenate(parts, axis=0)
        if width is None:
            return jnp.zeros((0,), dtype)
        return jnp.zeros((0, width), dtype)

    J_i, J_f, J_b = cat(Js_i, nv), cat(Js_f, nv), cat(Js_b, nv)
    n_ineq = J_i.shape[0]
    n_fric = J_f.shape[0]
    J = jnp.concatenate([J_i, J_f, J_b], axis=0)
    aref = jnp.concatenate([cat(arefs_i), cat(arefs_f), cat(arefs_b)])
    R = jnp.maximum(
        jnp.concatenate([cat(Rs_i), cat(Rs_f), cat(Rs_b)]), 1e-14)
    active = jnp.concatenate([
        cat(act_i), jnp.ones(n_fric, dtype), cat(act_b)])
    # assign static block starts
    out_blocks = []
    off = n_ineq + n_fric
    for b in blocks:
        out_blocks.append(dict(start=off, **b))
        off += b["nb"] * b["dim"]
    return _Rows(J=J, aref=aref, R=R, active=active, n_ineq=n_ineq,
                 n_fric=n_fric, fl=cat(fls), blocks=tuple(out_blocks))


def _sgrad(rows: _Rows, u, imp_ratio, want_hess: bool):
    """Zone gradients g = ds/du (C,) and, if want_hess, the diagonal
    curvature w (C,) plus per-block full Hessians [(nb, dim, dim), ...].

    The returned force is f = -g (active rows)."""
    C = u.shape[0]
    dtype = u.dtype
    D = rows.active / rows.R
    g = jnp.zeros(C, dtype)
    w = jnp.zeros(C, dtype) if want_hess else None

    # inequality rows
    sl = slice(0, rows.n_ineq)
    ui = u[sl]
    neg = (ui < 0).astype(dtype)
    g = g.at[sl].set(D[sl] * ui * neg)
    if want_hess:
        w = w.at[sl].set(D[sl] * neg)

    # friction rows (Huber)
    if rows.n_fric:
        sf = slice(rows.n_ineq, rows.n_ineq + rows.n_fric)
        uf = u[sf]
        g = g.at[sf].set(jnp.clip(D[sf] * uf, -rows.fl, rows.fl))
        if want_hess:
            inside = (jnp.abs(D[sf] * uf) < rows.fl).astype(dtype)
            w = w.at[sf].set(D[sf] * inside)

    # elliptic blocks
    Hblks = []
    for blk in rows.blocks:
        nb, dim, start = blk["nb"], blk["dim"], blk["start"]
        sb = slice(start, start + nb * dim)
        ub = u[sb].reshape(nb, dim)
        Rb = rows.R[sb].reshape(nb, dim)
        ab = rows.active[sb].reshape(nb, dim)[:, 0]            # block active
        mu1 = blk["mu1"]                                       # (nb,)
        scale = blk["mu"] / mu1[:, None]                       # (nb, dim-1)
        N = ub[:, 0]
        up = ub[:, 1:] * scale                                 # scaled u'
        T = jnp.sqrt(jnp.sum(up * up, -1) + 1e-24)
        R_N = Rb[:, 0]
        R_t = R_N / imp_ratio
        mu = mu1
        top = N >= mu * T
        bottom = T * imp_ratio <= -mu * N
        mid = jnp.logical_and(~top, ~bottom)

        Db = ab[:, None] / Rb                                  # per-row D
        g_bot = ub * Db                                        # independent quads

        Rm = R_N * (1.0 + mu * mu / imp_ratio)
        wv = mu * T - N
        uhat = up / T[:, None]
        g_mid_N = -wv / Rm
        g_mid_t = (mu * wv / (Rm * T))[:, None] * up * scale   # = coef*u*scale^2
        g_mid = jnp.concatenate([g_mid_N[:, None], g_mid_t], 1) * ab[:, None]

        g_blk = jnp.where(top[:, None], 0.0,
                          jnp.where(bottom[:, None], g_bot, g_mid))
        g = g.at[sb].set(g_blk.reshape(-1))

        if want_hess:
            eye_t = jnp.eye(dim - 1, dtype=dtype)
            sc = scale                                         # (nb, dim-1)
            H_bot = jnp.zeros((nb, dim, dim), dtype)
            H_bot = H_bot.at[:, jnp.arange(dim), jnp.arange(dim)].set(Db)
            c = 1.0 / Rm
            us = uhat * sc                                     # (nb, dim-1)
            H_NN = c
            H_Nt = -(mu * c)[:, None] * us
            outer = us[:, :, None] * us[:, None, :]
            tang_scale2 = sc[:, :, None] * sc[:, None, :]
            H_tt = ((mu * mu * c)[:, None, None] * outer
                    + (mu * wv / (Rm * T))[:, None, None]
                    * (eye_t[None] * (sc * sc)[:, :, None] - outer))
            H_mid = jnp.zeros((nb, dim, dim), dtype)
            H_mid = H_mid.at[:, 0, 0].set(H_NN)
            H_mid = H_mid.at[:, 0, 1:].set(H_Nt)
            H_mid = H_mid.at[:, 1:, 0].set(H_Nt)
            H_mid = H_mid.at[:, 1:, 1:].set(H_tt)
            H_blk = jnp.where(top[:, None, None], 0.0,
                              jnp.where(bottom[:, None, None], H_bot, H_mid))
            H_blk = H_blk * ab[:, None, None]
            Hblks.append(H_blk)
    if want_hess:
        return g, w, Hblks
    return g


def _phi_deriv(rows: _Rows, u0, du, alpha, mMdx, c_lin, imp_ratio):
    """phi'(alpha) and phi''(alpha) along the search direction.
    c_lin = dx.M.(x-a0); mMdx = dx.M.dx; du = J dx."""
    u = u0 + alpha * du
    g, w, Hblks = _sgrad(rows, u, imp_ratio, True)
    d1 = c_lin + alpha * mMdx + jnp.sum(g * du)
    d2 = mMdx + jnp.sum(w * du * du)
    for blk, Hb in zip(rows.blocks, Hblks):
        nb, dim, start = blk["nb"], blk["dim"], blk["start"]
        dub = du[start:start + nb * dim].reshape(nb, dim)
        d2 = d2 + jnp.einsum("bi,bij,bj->", dub, Hb, dub)
    return d1, d2


def solve_qacc(model, M, a0, rows: _Rows, n_iter: int = 30,
               tol: float = 1e-12):
    """Newton-minimize the primal objective; returns (qacc, f_rows)."""
    dtype = a0.dtype
    nv = model.nv
    imp_ratio = float(model.impratio)
    J, aref = rows.J, rows.aref
    ridge = 1e-10 * jnp.max(jnp.diag(M))
    I = jnp.eye(nv, dtype=dtype)
    # gradient-norm scale for the stopping rule
    scale = jnp.maximum(jnp.linalg.norm(M @ a0), 1.0)

    def grad_and_H(x):
        u = J @ x - aref
        g, w, Hblks = _sgrad(rows, u, imp_ratio, True)
        grad = M @ (x - a0) + J.T @ g
        H = M + (J.T * w[None, :]) @ J + ridge * I
        for blk, Hb in zip(rows.blocks, Hblks):
            nb, dim, start = blk["nb"], blk["dim"], blk["start"]
            Jb = J[start:start + nb * dim].reshape(nb, dim, nv)
            H = H + jnp.einsum("bdi,bde,bej->ij", Jb, Hb, Jb)
        return u, g, grad, H

    def cond(carry):
        x, it, gn = carry
        return jnp.logical_and(it < n_iter, gn > tol * scale)

    def body(carry):
        x, it, _ = carry
        u, g, grad, H = grad_and_H(x)
        L = jax.scipy.linalg.cho_factor(H)
        dx = -jax.scipy.linalg.cho_solve(L, grad)
        du = J @ dx
        mMdx = dx @ (M @ dx)
        c_lin = dx @ (M @ (x - a0))

        # safeguarded 1D Newton on phi'(alpha) (phi convex, phi'' >= dx M dx)
        def ls_body(ab, _):
            alpha, lo, hi = ab
            d1, d2 = _phi_deriv(rows, u, du, alpha, mMdx, c_lin, imp_ratio)
            lo = jnp.where(d1 < 0, alpha, lo)
            hi = jnp.where(d1 > 0, alpha, hi)
            step = alpha - d1 / jnp.maximum(d2, 1e-30)
            inside = jnp.logical_and(step > lo, step < hi)
            alpha_new = jnp.where(inside, step, 0.5 * (lo + hi))
            return (alpha_new, lo, hi), None

        (alpha, _, _), _ = jax.lax.scan(
            ls_body, (jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
                      jnp.asarray(16.0, dtype)), None, length=12)
        x_new = x + alpha * dx
        _, _, grad_new, _ = grad_and_H(x_new)
        return (x_new, it + 1, jnp.linalg.norm(grad_new))

    x0 = a0
    _, _, g0, _ = grad_and_H(x0)
    x, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(0, jnp.int32), jnp.linalg.norm(g0)))
    u = J @ x - aref
    g = _sgrad(rows, u, imp_ratio, False)
    return x, -g


def newton_constraint_forces(model, state, S, a0, M, n_iter: int = 30):
    """Coupled constraint solve via primal Newton. Returns tau (nv,) =
    J^T f, the generalized constraint force (mj qfrc_constraint analog)."""
    dtype = state.qpos.dtype
    rows = build_rows(model, state, S, dtype)
    if rows.J.shape[0] == 0:
        return jnp.zeros(model.nv, dtype)
    _, f = solve_qacc(model, M, a0, rows, n_iter=n_iter)
    return rows.J.T @ f
