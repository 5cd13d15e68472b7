"""Fused batched adaptive solver on the BLOCK-DIAGONAL covariance backend.

Completes the fused-engine scope (ROADMAP #6): the blockdiag backend keeps
one independent (n, n) square-root factor AND one output scale per ODE
dimension (``ssm/blockdiag.py``) -- the right factorization when state
components evolve at very different magnitudes.  probdiffeq ships this
family alongside isotropic/dense (SURVEY.md section 2); the reference
exercises isotropic/dense only, so this engine is capability parity with
the un-vendored stack plus the TPU execution layout.

Layout (lanes-last, B = lane axis): the per-dimension channels are an extra
SUBLANE axis ``d`` on every covariance array --

* mean / bwd_m: ``(n, d, B)`` (same as the isotropic engine);
* covariance factors / gains: ``(n, n, d, B)``;
* per-dimension output scale / sigma / mle: ``(d, B)``;
* time / dt / errn: ``(1, B)`` -- the accept decision and the step size are
  per LANE (shared across that IVP's d channels), exactly like the generic
  stack: the error norm reduces over d before control.

Everything reuses the column-list Householder QR and unrolled matmuls from
``batched`` (they are rank-polymorphic over trailing axes), so the same
kernels serve 2-D isotropic columns and 3-D blockdiag channel columns.
Corrections: TS0 only (TS1 needs cross-derivative covariance -> dense).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .batched import (
    LANES,
    _const_matmul,
    _constants,
    _matmul_ll,
    _mid,
    _pallas_interval,
    _pallas_step,
    _qr_r_cols,
    _tri_solve_upper_ll,
    check_hbm_budget,
)
from .ivpsolve import _interpolate_at, _State
from .ssm.base import Conditional, MarkovSeq, Normal


def _mv(a, v, n):
    """(n, n, d, B) @ (n, d, B) -> (n, d, B), unrolled."""
    return _matmul_ll(a, v[:, None], n)[:, 0]


def make_step_bd_ll(vf_batched, *, nu, d, strategy="fixedpoint",
                    calibration="dynamic", control=None, ode_order=1,
                    error_unit="qoi", error_calibration=None):
    """Lanes-last blockdiag adaptive attempt; pure jnp (Pallas-safe).

    Mirrors the generic blockdiag backend's semantics: per-dimension sigma
    ``|z_i| / s_unit``, per-dimension covariance propagation, one shared
    PI-controlled dt per lane.
    """
    from .ivpsolve import Control

    ctrl = control or Control()
    o = ode_order
    n = nu + 1
    a_rows, lq_rows, lq_norms, inv_fact = _constants(nu)
    max_lq = max(abs(c) for row in lq_rows for c in row)
    a_inf_norm = max(1.0, max(sum(abs(c) for c in row) for row in a_rows))
    fixedpoint = strategy == "fixedpoint"
    needs_rev = strategy != "filter"
    n1 = ctrl.power_integral / (nu + 1.0)
    n2 = ctrl.power_proportional / (nu + 1.0)
    if error_unit not in ("qoi", "residual"):
        raise ValueError(f"error_unit must be 'qoi' or 'residual', got {error_unit!r}")
    if error_calibration is None:
        from .ivpsolvers import default_error_calibration

        error_calibration = default_error_calibration("ts0", error_unit)
    kappa = float(error_calibration)

    def precond(dt):
        pows = [None] * n
        pows[nu] = jnp.ones_like(dt)
        for i in reversed(range(nu)):
            pows[i] = pows[i + 1] * dt
        sq = jnp.sqrt(dt)
        return [sq * pows[i] * inv_fact[i] for i in range(n)]

    def _row(x2, i):
        return jax.lax.slice_in_dim(x2, i, i + 1, axis=0)

    def step(state, t_next, atol, rtol, dt_max, dt_floor, tiny_scale):
        (t, mean, chol, bwdG, bwd_m, bwd_L, scale, t_prev, mean_prev, chol_prev,
         bwdG_prev, bwd_m_prev, bwd_L_prev, dt_st, errn_prev, nsteps, mle) = state

        dt = jnp.clip(dt_st, dt_floor, dt_max)
        p = precond(dt)  # n x (1, B)
        p_arr = jnp.concatenate(p, axis=0)  # (n, B)
        t_new = t + dt

        # -- extrapolate mean (identical to the isotropic engine)
        m_bar = mean / p_arr[:, None, :]
        m_pred = p_arr[:, None, :] * _const_matmul(a_rows, m_bar)

        # -- TS0 residual + per-dimension sigma / error
        u_pred = _mid(m_pred, 0, axis=0)  # (d, B)
        args = tuple(_mid(m_pred, k, axis=0) for k in range(o))
        fx = vf_batched(args, t_new)
        z = _mid(m_pred, o, axis=0) - fx  # (d, B)
        s_unit = p[o] * lq_norms[o]  # (1, B)
        sigma = jnp.abs(z) / s_unit  # (d, B)
        if error_unit == "residual":
            err_u = sigma * s_unit
        else:
            err_u = sigma * (p[0] * lq_norms[0])
        tol_w = atol + rtol * jnp.abs(u_pred)  # (d, B)
        e2 = (_row(err_u, 0) / _row(tol_w, 0)) ** 2
        for r in range(1, d):
            e2 = e2 + (_row(err_u, r) / _row(tol_w, r)) ** 2
        errn = kappa * jnp.sqrt(e2 / (1.0 * d))  # (1, B)

        if calibration == "dynamic":
            big = float(jnp.finfo(sigma.dtype).max) ** 0.4
            sigma_safe = jnp.where(jnp.isfinite(sigma), sigma, big)
            new_scale = jnp.clip(sigma_safe, tiny_scale, big)  # (d, B)
        else:
            new_scale = scale

        # -- extrapolate covariance per channel (normalized as in isotropic)
        l_bar = jnp.clip(chol / p_arr[:, None, None, :], -1e30, 1e30)
        mag = new_scale * max_lq  # (d, B)
        for c in range(n):
            mag = jnp.maximum(mag, jnp.max(jnp.abs(l_bar[c]), axis=0))
        mag = jnp.maximum(mag * a_inf_norm, tiny_scale)
        inv_mag = 1.0 / mag  # (d, B)
        l_bar_n = l_bar * inv_mag[None, None]
        a_l = _const_matmul(a_rows, l_bar_n)  # (n, n, d, B)
        s_lq = new_scale * inv_mag  # (d, B)
        lq_r = [
            jnp.stack([lq_rows[c][k] * s_lq for k in range(n)], axis=0)
            for c in range(n)
        ]  # rows of (scaled) Lq: each (n, d, B)
        magb = mag[None, None]  # (1, 1, d, B)

        if needs_rev:
            zero_col = jnp.zeros_like(a_l[0])
            cols = [
                jnp.concatenate([a_l[c], lq_r[c]], axis=0) for c in range(n)
            ] + [
                jnp.concatenate([l_bar_n[c], zero_col], axis=0) for c in range(n)
            ]
            cols = _qr_r_cols(cols, 2 * n, 2 * n)
            r = jnp.stack(cols, axis=1)  # (2n, 2n, d, B)
            r_yy = r[:n, :n]
            r_yx = r[:n, n:]
            r_xx = r[n:, n:]
            l_pred = p_arr[:, None, None, :] * (jnp.swapaxes(r_yy, 0, 1) * magb)
            g_bar = jnp.swapaxes(_tri_solve_upper_ll(r_yy, r_yx, n), 0, 1)
            gain = (
                p_arr[:, None, None, :] * g_bar / p_arr[None, :, None, :]
            )
            bwd_L_step = p_arr[:, None, None, :] * (jnp.swapaxes(r_xx, 0, 1) * magb)
            bwd_m_step = mean - _mv(gain, m_pred, n)
        else:
            cols = [
                jnp.concatenate([a_l[c], lq_r[c]], axis=0) for c in range(n)
            ]
            cols = _qr_r_cols(cols, 2 * n, n)
            r = jnp.stack(cols, axis=1)[:n]
            l_pred = p_arr[:, None, None, :] * (jnp.swapaxes(r, 0, 1) * magb)
            gain = bwd_m_step = bwd_L_step = None

        # -- TS0 correction: rank-1 Potter update per channel
        l_obs = _mid(l_pred, o, axis=0)  # (n, d, B): row o of each factor
        m2 = jnp.max(jnp.abs(l_obs), axis=0)  # (d, B)
        m2 = jnp.maximum(m2, tiny_scale)
        l_obs_n = l_obs / m2[None]
        s2 = jnp.sum(l_obs_n**2, axis=0) + jnp.finfo(l_obs.dtype).tiny  # (d, B)
        crosscov = _mv(l_pred, l_obs_n, n)  # (n, d, B)
        gc = crosscov / s2[None]
        g_corr = gc / m2[None]
        mean_cor = m_pred - g_corr * z[None]
        chol_cor = l_pred - gc[:, None] * l_obs_n[None, :]

        # -- fixedpoint accumulation per channel
        if needs_rev:
            if fixedpoint:
                bwdG_new = _matmul_ll(bwdG, gain, n)
                bwd_m_new = _mv(bwdG, bwd_m_step, n) + bwd_m
                mag_g = tiny_scale * jnp.ones_like(mag)
                for c in range(n):
                    mag_g = jnp.maximum(
                        mag_g, jnp.max(jnp.abs(bwdG[c]), axis=0)
                    )
                inv_g = 1.0 / mag_g
                m1 = _matmul_ll(bwdG * inv_g[None, None], bwd_L_step, n)
                bl_g = bwd_L * inv_g[None, None]
                t3 = tiny_scale * jnp.ones_like(mag)
                for c in range(n):
                    t3 = jnp.maximum(t3, jnp.max(jnp.abs(m1[c]), axis=0))
                    t3 = jnp.maximum(t3, jnp.max(jnp.abs(bl_g[c]), axis=0))
                inv3 = (1.0 / t3)[None]
                cols2 = [
                    jnp.concatenate([m1[c] * inv3, bl_g[c] * inv3], axis=0)
                    for c in range(n)
                ]
                cols2 = _qr_r_cols(cols2, 2 * n, n)
                bwd_L_new = (
                    jnp.swapaxes(jnp.stack(cols2, axis=1)[:n], 0, 1)
                    * t3[None, None]
                ) * mag_g[None, None]
            else:
                bwdG_new, bwd_m_new, bwd_L_new = gain, bwd_m_step, bwd_L_step
        else:
            bwdG_new, bwd_m_new, bwd_L_new = bwdG, bwd_m, bwd_L

        # -- PI control + accept/select (identical to the isotropic engine)
        errn_s = jnp.maximum(errn, jnp.finfo(errn.dtype).tiny)
        factor = ctrl.safety * jnp.exp(
            -n1 * jnp.log(errn_s) + n2 * (jnp.log(errn_prev) - jnp.log(errn_s))
        )
        factor = jnp.where(jnp.isfinite(factor), factor, ctrl.factor_min)
        dt_next = jnp.minimum(
            dt * jnp.clip(factor, ctrl.factor_min, ctrl.factor_max), dt_max
        )
        eps = jnp.finfo(dt.dtype).eps
        dt_stall = 4.0 * eps * jnp.maximum(jnp.abs(t), 1.0)
        frozen = t >= t_next
        accept = ((errn <= 1.0) | (dt <= dt_stall)) & ~frozen
        upd = ~frozen

        def sel(acc, old, mask=None):
            mask_ = accept if mask is None else mask
            while mask_.ndim < acc.ndim:
                mask_ = mask_[None]
            return jnp.where(mask_, acc, old)

        return (
            sel(t_new, t),
            sel(mean_cor, mean),
            sel(chol_cor, chol),
            sel(bwdG_new, bwdG),
            sel(bwd_m_new, bwd_m),
            sel(bwd_L_new, bwd_L),
            sel(new_scale, scale),
            sel(t, t_prev),
            sel(mean, mean_prev),
            sel(chol, chol_prev),
            sel(bwdG, bwdG_prev),
            sel(bwd_m, bwd_m_prev),
            sel(bwd_L, bwd_L_prev),
            sel(dt_next, dt_st, mask=upd),
            sel(errn_s, errn_prev),
            sel(nsteps + 1.0, nsteps),
            sel(mle + sigma * sigma, mle),
        )

    return step


def _generic_to_state_bd(s: _State, needs_rev, dtype):
    """Vmapped generic blockdiag _State (leading batch) -> lanes-last tuple.

    Generic layouts: mean (B, d, n), chol (B, d, n, n), scale (B, d)."""

    def tm(x):  # (B, d, n) -> (n, d, B)
        return jnp.transpose(x, (2, 1, 0))

    def tc(x):  # (B, d, n, n) -> (n, n, d, B)
        return jnp.transpose(x, (2, 3, 1, 0))

    def ts(x):  # (B, d) -> (d, B)
        return jnp.transpose(x).astype(dtype)

    def t1(x):  # (B,) -> (1, B)
        return x[None, :].astype(dtype)

    if needs_rev:
        bparts = (tc(s.bwd.matrix), tm(s.bwd.noise.mean), tc(s.bwd.noise.cholesky))
        bprev = (
            tc(s.bwd_prev.matrix),
            tm(s.bwd_prev.noise.mean),
            tc(s.bwd_prev.noise.cholesky),
        )
    else:
        zG = jnp.zeros_like(tc(s.rv.cholesky))
        zm = jnp.zeros_like(tm(s.rv.mean))
        bparts = bprev = (zG, zm, zG)
    return (
        t1(s.t),
        tm(s.rv.mean),
        tc(s.rv.cholesky),
        *bparts,
        ts(s.scale_step),
        t1(s.t_prev),
        tm(s.rv_prev.mean),
        tc(s.rv_prev.cholesky),
        *bprev,
        t1(s.dt),
        t1(s.errn_prev),
        t1(s.num_steps.astype(dtype)),
        ts(s.mle_ssq),
    )


def _state_to_generic_bd(state, needs_rev):
    def tm(x):  # (n, d, B) -> (B, d, n)
        return jnp.transpose(x, (2, 1, 0))

    def tc(x):  # (n, n, d, B) -> (B, d, n, n)
        return jnp.transpose(x, (3, 2, 0, 1))

    def ts(x):  # (d, B) -> (B, d)
        return jnp.transpose(x)

    def t1(x):
        return x[0]

    rv = Normal(tm(state[1]), tc(state[2]))
    rv_prev = Normal(tm(state[8]), tc(state[9]))
    if needs_rev:
        bwd = Conditional(tc(state[3]), Normal(tm(state[4]), tc(state[5])))
        bwd_prev = Conditional(
            tc(state[10]), Normal(tm(state[11]), tc(state[12]))
        )
    else:
        bwd = bwd_prev = None
    return _State(
        t=t1(state[0]),
        rv=rv,
        bwd=bwd,
        scale_step=ts(state[6]),
        t_prev=t1(state[7]),
        rv_prev=rv_prev,
        bwd_prev=bwd_prev,
        dt=t1(state[13]),
        errn_prev=t1(state[14]),
        num_steps=t1(state[15]).astype(jnp.int32),
        mle_ssq=ts(state[16]),
    )


def solve_save_at_batched_blockdiag(
    vf,
    u0s,
    params,
    *,
    save_at,
    dt0,
    tols,
    num_derivatives=4,
    strategy="fixedpoint",
    calibration="dynamic",
    atol_factor=1e-3,
    engine="pallas",
    interpret=False,
    vf_vectorized=True,
    lanes=None,
    hbm_budget="auto",
    ode_order=1,
    error_unit="qoi",
    error_calibration=None,
    max_attempts=100_000,
):
    """Batched fixed-memory adaptive solve on the blockdiag backend.

    Same contract as ``batched.solve_save_at_batched``; per-dimension output
    scales and covariance factors (TS0 corrections only).
    """
    from . import ivpsolvers, stats, taylor

    u0s_tuple = u0s if isinstance(u0s, tuple) else (u0s,)
    if len(u0s_tuple) != ode_order:
        raise ValueError(
            f"ode_order={ode_order} needs {ode_order} initial arrays, "
            f"got {len(u0s_tuple)}"
        )
    b, d = u0s_tuple[0].shape
    nu = num_derivatives
    check_hbm_budget(
        b, (nu + 1) * d, num_derivatives=nu, num_save_at=len(save_at),
        dtype=u0s_tuple[0].dtype, budget=hbm_budget,
    )
    # VMEM-aware default tile width (multiples of the 128-lane vreg width):
    # measured on v5e (n=5, d=3): the pallas-loop kernel's scoped-VMEM live
    # set — 13 (n, n, d, lane) state factors plus the QR column lists and
    # Mosaic stack temporaries — is ~110 * n^2 * d floats per lane (32.5 KB;
    # 512 lanes hit 16.25 MB against the 16 MB scoped limit).  Target 12 MB.
    if lanes is None:
        per_lane = 110 * (nu + 1) ** 2 * d * jnp.dtype(u0s_tuple[0].dtype).itemsize
        fit = (12 << 20) // max(per_lane, 1)
        lane_width = max(LANES, min(LANES * 4, (fit // LANES) * LANES))
    else:
        lane_width = lanes
    pad = (-b) % lane_width
    if pad:
        loosest = jnp.argmax(tols)

        def _rep(u):
            row = jax.lax.dynamic_slice_in_dim(u, loosest, 1, axis=0)
            return jnp.concatenate([u, jnp.tile(row, (pad, 1))])

        u0s_tuple = tuple(_rep(u) for u in u0s_tuple)
        tols = jnp.concatenate([tols, jnp.broadcast_to(tols[loosest], (pad,))])
    bb = u0s_tuple[0].shape[0]
    dtype = u0s_tuple[0].dtype
    save_at = jnp.asarray(save_at, dtype)

    ssm = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(d,), implementation="blockdiag"
    )
    corr = ivpsolvers.correction_ts0(
        ode_order=ode_order, error_unit=error_unit,
        error_calibration=error_calibration,
    )
    strat = {
        "filter": ivpsolvers.strategy_filter,
        "fixedpoint": ivpsolvers.strategy_fixedpoint,
    }[strategy](ssm, corr)
    solver_cfg = (
        ivpsolvers.solver_dynamic(strat)
        if calibration == "dynamic"
        else ivpsolvers.solver(strat)
    )
    needs_rev = strat.needs_reversal

    def vf_p(*ys, t):
        return vf(*ys, t=t, p=params)

    if vf_vectorized:
        def vfb(args_dB, t_1B):
            return vf_p(*args_dB, t=t_1B[0])
    else:
        vf_vmapped = jax.vmap(
            lambda args, t: vf_p(*args, t=t),
            in_axes=(tuple([-1] * ode_order), -1),
            out_axes=-1,
        )

        def vfb(args_dB, t_1B):
            bsz = args_dB[0].shape[-1]
            return vf_vmapped(args_dB, jnp.broadcast_to(t_1B[0], (bsz,)))

    def init_one(u0_tuple):
        tco = taylor.odejet_padded_scan(
            lambda *y: vf_p(*y, t=save_at[0]), u0_tuple,
            num=nu + 1 - ode_order,
        )
        return solver_cfg.initial_condition(tco, jnp.ones((), dtype))

    rv0, scale0 = jax.vmap(init_one)(u0s_tuple)
    # per-dimension output scales: promote the scalar init to (B, d)
    scale0 = jax.vmap(ssm.promote_output_scale)(scale0).astype(dtype)

    ident = ssm.identity_conditional(dtype)
    ident_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (bb,) + x.shape), ident)
    s0_generic = _State(
        t=jnp.full((bb,), save_at[0], dtype),
        rv=rv0,
        bwd=ident_b if needs_rev else None,
        scale_step=scale0,
        t_prev=jnp.full((bb,), save_at[0], dtype),
        rv_prev=rv0,
        bwd_prev=ident_b if needs_rev else None,
        dt=jnp.full((bb,), dt0, dtype),
        errn_prev=jnp.ones((bb,), dtype),
        num_steps=jnp.zeros((bb,), jnp.int32),
        mle_ssq=jnp.zeros_like(scale0),
    )
    state0 = _generic_to_state_bd(s0_generic, needs_rev, dtype)

    step_ll = make_step_bd_ll(
        vfb, nu=nu, d=d, strategy=strategy, calibration=calibration,
        ode_order=ode_order, error_unit=error_unit,
        error_calibration=error_calibration,
    )
    if engine == "pallas-loop":
        interval_call = _pallas_interval(
            step_ll, interpret=interpret, lanes=lane_width,
            max_attempts=max_attempts,
        )
        step_call = None
    elif engine == "pallas":
        interval_call = None
        step_call = _pallas_step(step_ll, interpret=interpret, lanes=lane_width)
    else:
        interval_call = None
        step_call = step_ll

    atol = (atol_factor * tols)[None, :].astype(dtype)
    rtol = tols[None, :].astype(dtype)
    dt_max_v = jnp.full((1, bb), save_at[-1] - save_at[0], dtype)
    dt_floor_v = jnp.full(
        (1, bb), float(jnp.finfo(dtype).tiny) ** (1.0 / (nu + 1.5)), dtype
    )
    tiny_v = jnp.full((1, bb), float(jnp.finfo(dtype).tiny) ** 0.5, dtype)

    interp_v = jax.vmap(lambda s, t: _interpolate_at(strat, s, t), in_axes=(0, None))

    def per_checkpoint(state, t_next):
        t_next_v = jnp.full((1, bb), t_next, dtype)

        if interval_call is not None:
            state = interval_call(
                state, t_next_v, atol, rtol, dt_max_v, dt_floor_v, tiny_v
            )
        else:
            def cond(carry):
                s, k = carry
                return jnp.any(s[0] < t_next) & (k < max_attempts)

            def body(carry):
                s, k = carry
                s2 = step_call(
                    s, t_next_v, atol, rtol, dt_max_v, dt_floor_v, tiny_v
                )
                return s2, k + 1

            state, _ = jax.lax.while_loop(
                cond, body, (state, jnp.zeros((), jnp.int32))
            )
        gen = _state_to_generic_bd(state, needs_rev)
        (rv_e, cond_e), gen2 = interp_v(gen, t_next)
        state2 = _generic_to_state_bd(gen2, needs_rev, dtype)
        return state2, (rv_e, cond_e, gen2.num_steps)

    with jax.default_matmul_precision("float32"):
        final, (rvs, conds, nsteps) = jax.lax.scan(
            per_checkpoint, state0, save_at[1:]
        )

    def bt(x):
        return jnp.swapaxes(x, 0, 1)

    u_filt = ssm.qoi(rvs.mean)  # (T-1, B, d)
    u_filt = jnp.concatenate([ssm.qoi(rv0.mean)[:, None, :], bt(u_filt)], axis=1)
    nsteps = jnp.concatenate(
        [jnp.zeros((bb, 1), jnp.int32), bt(nsteps)], axis=1
    )

    if needs_rev:
        def smooth_one(rv0_one, rvs_one, conds_one):
            init_stack = jax.tree.map(
                lambda f, r: jnp.concatenate([f[None], r]), rv0_one, rvs_one
            )
            conds_full = jax.tree.map(
                lambda i, c: jnp.concatenate([i[None], c]), ident, conds_one
            )
            post = MarkovSeq(init_stack, conds_full, ssm=ssm)
            seq = stats.markov_select_terminal(post)
            margs = stats.markov_marginals(seq)
            mean = jnp.concatenate([margs.mean, init_stack.mean[None, -1]])
            return jax.vmap(ssm.qoi)(mean)

        rvs_b = jax.tree.map(bt, rvs)
        conds_b = jax.tree.map(bt, conds)
        u_smooth = jax.vmap(smooth_one)(rv0, rvs_b, conds_b)
    else:
        u_smooth = u_filt

    return u_smooth[:b], u_filt[:b], nsteps[:b]
