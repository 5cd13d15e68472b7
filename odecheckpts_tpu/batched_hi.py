"""High-precision fused batched solver: double-f32 means inside one kernel.

The rtol 1e-6..1e-9 band of the reference's work-precision protocol
(/root/reference/experiments/2_workprec_simple/run_simple.py:150-156) needs
more than f32's 2^-24: the solution mean, the time axis, and the TS0
residual z = u^(o) - f(u) (a catastrophic cancellation at tight tolerance)
all lose the signal in f32 rounding.  XLA's x64-on-TPU emulation solves this
at a ~20-50x cost and Mosaic lowers no 64-bit types at all, so this module
re-derives the fused lanes-last step of :mod:`odecheckpts_tpu.batched` with

* solution means, the time axis, and the residual in compensated (hi, lo)
  f32 pairs (:mod:`odecheckpts_tpu.df32`, ~2^-48 relative) -- pure f32 VPU
  ops that Mosaic lowers directly;
* covariance Cholesky factors, gains, and step control in plain f32 (they
  only steer step sizes / condition the mean update: a few digits suffice);
* checkpoints hit by CLAMPING dt to land exactly on each save_at point
  (the scipy-tstops protocol, cf. experiments/5_vs_interpolation) instead of
  interpolating -- the interpolation algebra would reintroduce f32-level
  error into the reported solution;
* the fixedpoint smoother in INCREMENT form: the accumulated backward mean
  is carried as the partially-smoothed mean m_sp with per-step update
  m_sp += G_acc @ gain @ (m_corrected - m_predicted), whose increment is
  O(local error) -- so f32 gain matrices never multiply O(1) magnitudes and
  the df32 accumulation stays at full precision.  The checkpoint-to-
  checkpoint backward recursion is the same identity:
  m_s(t_k) = m_sp(k) + G_acc(k) @ (m_s(t_{k+1}) - m_f(t_{k+1})).

Scope mirrors ``batched.solve_save_at_batched``: isotropic TS0 (any d) or
TS1 (d=1 -- with the compensated time axis this engine reaches stiffness
regimes the plain-f32 kernel cannot: VdP mu=1e3 needs dt ~ 1/mu below the
f32 stall floor 4*eps32*t), ode_order in {1, 2}, filter/fixedpoint,
dynamic/none calibration.  Smoothed COVARIANCES are not produced (means
only -- the work-precision deliverable); use the generic stack when
posterior spread at checkpoints is needed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import df32 as df
from .batched import (
    LANES,
    _const_matmul,
    _constants,
    _matmul_ll,
    _mid,
    _pallas_interval,
    _pallas_step,
    _tri_solve_upper_ll,
    check_hbm_budget,
)

# state tuple layout (all lanes-last):
#   0 t_hi (1,B)       1 t_lo (1,B)
#   2 mean_hi (n,d,B)  3 mean_lo (n,d,B)
#   4 chol (n,n,B)     5 scale (1,B)
#   6 G_acc (n,n,B)    7 msp_hi (n,d,B)   8 msp_lo (n,d,B)
#   9 dt (1,B)        10 errn_prev (1,B) 11 nsteps (1,B)
NUM_STATE_HI = 12

# df32 pair precision (used for the stall floor on the compensated time axis)
_EPS_DF32 = 2.0**-45


def _qr_r_cols_partial(cols, m, n_reflect):
    """First ``n_reflect`` Householder reflections of the column-list QR,
    applied to ALL columns.

    After j reflections rows 0..j-1 of every column are final, so running
    only n reflections of the (2n x 2n) revert factorization yields the
    complete R_yy (predictive factor) and R_yx (gain numerator) blocks --
    half the work of the full QR, and the skipped half only produced the
    backward covariance factor this module does not carry.
    """
    eps = jnp.finfo(cols[0].dtype).tiny
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    n_cols = len(cols)
    for j in range(min(n_reflect, m - 1)):
        col = cols[j]
        below = (rows >= j).astype(col.dtype)
        is_j = (rows == j).astype(col.dtype)
        colm = col * below
        norm2 = jnp.sum(colm * colm, axis=0, keepdims=True)
        norm = jnp.sqrt(norm2 + eps)
        head = jnp.sum(colm * is_j, axis=0, keepdims=True)
        sign = jnp.where(head >= 0, 1.0, -1.0).astype(col.dtype)
        alpha = -sign * norm
        v = colm - is_j * alpha
        vnorm2 = norm2 + alpha * alpha - 2.0 * head * alpha
        safe = vnorm2 > eps
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        for c in range(j, n_cols):
            coeff = jnp.sum(v * cols[c], axis=0, keepdims=True)
            cols[c] = cols[c] - inv * v * coeff
    return cols


def _taylor_extrap_df(mean, dt, nu):
    """df32 mean extrapolation in REAL coordinates: m_i + sum_k c_k m_{i+k}
    with c_k = dt^k / k! as df32 pairs.

    The preconditioned roundtrip p*(Pascal*(m/p)) is exact only on diagonal
    terms: each off-diagonal coefficient p_i/p_j carries the INDEPENDENT f32
    roundings of two p entries (~6e-7 relative, varying per step), which
    accumulates ~sqrt(N)*eps32*dt*|u'| error -- above the rtol 1e-9 budget.
    The real-coordinate Taylor form needs no preconditioning for the MEAN
    (it is perfectly conditioned; only the covariance QR mixes scales), and
    dt is an exact f32 value, so c_k computed by two_prod chains carries the
    full 2^-48: per-step extrapolation error ~2^-48 |m|.

    Also regular at dt -> 0 (c_k -> 0, map -> identity), which the clamped
    checkpoint-remainder steps rely on.
    """
    hi, lo = mean
    n = nu + 1
    c = [None] * n  # c[k] = dt^k / k! as a pair; c[0] unused (identity term)
    c[1] = (dt, jnp.zeros_like(dt))
    for k in range(2, n):
        c[k] = df.div1(df.mul1(c[k - 1], dt), float(k))
    out_hi, out_lo = [], []
    for i in range(n):
        acc = (hi[i], lo[i])
        for k in range(1, n - i):
            # c[k] is (1, B); rows are (d, B) -- broadcasts elementwise
            acc = df.add(acc, df.mul((hi[i + k], lo[i + k]), c[k]))
        out_hi.append(acc[0])
        out_lo.append(acc[1])
    return jnp.stack(out_hi, axis=0), jnp.stack(out_lo, axis=0)


def make_step_hi(vf_df, *, nu, d, strategy="fixedpoint", calibration="dynamic",
                 control=None, ode_order=1, correction="ts0",
                 error_unit="qoi", error_calibration=None):
    """Lanes-last adaptive attempt with df32 mean/time/residual channels.

    ``vf_df`` takes (args, t) where args is a tuple of ``ode_order``
    ((d, B) hi, (d, B) lo) pairs and t is a ((1, B), (1, B)) pair, and
    returns a ((d, B), (d, B)) pair.  Steps CLAMP to ``t_next``: an accepted
    clamped step snaps the time axis to exactly t_next and leaves the step-
    controller state (dt proposal, errn memory) untouched.
    """
    from .ivpsolve import Control

    ctrl = control or Control()
    o = ode_order
    n = nu + 1
    a_rows, lq_rows, lq_norms, inv_fact = _constants(nu)
    max_lq = max(abs(c) for row in lq_rows for c in row)
    a_inf_norm = max(1.0, max(sum(abs(c) for c in row) for row in a_rows))
    fixedpoint = strategy == "fixedpoint"
    sqrt_d = math.sqrt(1.0 * d)
    n1 = ctrl.power_integral / (nu + 1.0)
    n2 = ctrl.power_proportional / (nu + 1.0)
    if error_unit not in ("qoi", "residual"):
        raise ValueError(f"error_unit must be 'qoi' or 'residual', got {error_unit!r}")
    if error_calibration is None:
        from .ivpsolvers import default_error_calibration

        error_calibration = default_error_calibration(correction, error_unit)
    kappa = float(error_calibration)
    ts1 = correction == "ts1"
    if ts1 and d != 1:
        raise NotImplementedError("ts1 in the hi engine covers d=1")

    def vf_jacs(args, t):
        # per-lane Jacobians from the hi channel (f32 suffices: they only
        # steer the error unit and the observation row, never the mean)
        outs = []
        for k in range(o):
            def fk(a, _k=k):
                full = args[:_k] + ((a, jnp.zeros_like(a)),) + args[_k + 1:]
                return vf_df(full, t)[0]

            _, jv = jax.jvp(fk, (args[k][0],), (jnp.ones_like(args[k][0]),))
            outs.append(jv)
        return tuple(outs)

    def precond(dt):
        pows = [None] * n
        pows[nu] = jnp.ones_like(dt)
        for i in reversed(range(nu)):
            pows[i] = pows[i + 1] * dt
        sq = jnp.sqrt(dt)
        return [sq * pows[i] * inv_fact[i] for i in range(n)]

    def step(state, t_next, atol, rtol, dt_max, dt_floor, tiny_scale):
        (t_hi, t_lo, mean_hi, mean_lo, chol, scale,
         g_acc, msp_hi, msp_lo, dt_st, errn_prev, nsteps) = state

        # remainder to the checkpoint on the compensated time axis
        s, e = df.two_sum(t_next, -t_hi)
        rem = jnp.maximum(s + (e - t_lo), 0.0)
        frozen = rem <= 0.0

        dt_prop = jnp.clip(dt_st, dt_floor, dt_max)
        clamped = rem <= dt_prop
        # mean path: the exact remainder (regular at 0); covariance path:
        # floored (the preconditioned QR overflows f32 below ~1e-5 dt_max,
        # and tiny clamped remainder steps freeze the covariance anyway)
        dt_mean = jnp.minimum(dt_prop, rem)
        tiny = clamped & (rem <= 1e-5 * dt_max)
        dt = jnp.maximum(dt_mean, dt_floor)

        p = precond(dt)
        p_arr = jnp.concatenate(p, axis=0)  # (n, B)
        pb = p_arr[:, None, :]
        t_new = df.add1((t_hi, t_lo), dt_mean)

        # -- extrapolate mean in df32 (real coordinates, 2^-48 relative)
        m_pred = _taylor_extrap_df((mean_hi, mean_lo), dt_mean, nu)
        m_pred_hi, m_pred_lo = m_pred

        # -- linearize (TS0 on derivative o), residual in df32
        u_pred = _mid(m_pred_hi, 0, axis=0)  # (d, B) hi only: error weights
        args = tuple(
            (_mid(m_pred_hi, k, axis=0), _mid(m_pred_lo, k, axis=0))
            for k in range(o)
        )
        fx = vf_df(args, t_new)
        z = df.sub((_mid(m_pred_hi, o, axis=0), _mid(m_pred_lo, o, axis=0)), fx)
        z_hi = z[0]  # full f32 relative accuracy OF THE SMALL RESIDUAL
        jacs = vf_jacs(args, t_new) if ts1 else ()

        # -- local scale + error (f32: only steers the controller)
        def _row(x2, i):
            return jax.lax.slice_in_dim(x2, i, i + 1, axis=0)

        if ts1:
            # ||H P Lq|| with a cancellation floor (cf. batched.make_step_ll)
            s2u = None
            for jc in range(n):
                v = p[o] * lq_rows[o][jc]
                for k in range(o):
                    v = v - jacs[k] * (p[k] * lq_rows[k][jc])
                s2u = v * v if s2u is None else s2u + v * v
            floor = 1.2e-7 * (p[o] * lq_norms[o])
            s_unit = jnp.sqrt(s2u + floor * floor)
        else:
            s_unit = p[o] * lq_norms[o]
        zz = _row(z_hi, 0) ** 2
        tol_acc = 1.0 / (atol + rtol * jnp.abs(_row(u_pred, 0))) ** 2
        for i in range(1, d):
            zz = zz + _row(z_hi, i) ** 2
            tol_acc = tol_acc + 1.0 / (atol + rtol * jnp.abs(_row(u_pred, i))) ** 2
        sigma = jnp.sqrt(zz) / (s_unit * sqrt_d)
        if error_unit == "residual":
            err_u = sigma * s_unit  # exp-3 residual protocol, cf. batched
        else:
            err_u = sigma * (p[0] * lq_norms[0])
        errn = kappa * err_u * jnp.sqrt(tol_acc / (1.0 * d))

        if calibration == "dynamic":
            # finite ceiling against inf covariance columns -> 0*inf = NaN
            # in the QR (cf. batched.make_step_ll)
            big = float(jnp.finfo(sigma.dtype).max) ** 0.4
            sigma_safe = jnp.where(jnp.isfinite(sigma), sigma, big)
            new_scale = jnp.clip(sigma_safe, tiny_scale, big)
        else:
            new_scale = scale

        # -- extrapolate covariance (f32, as in batched.make_step_ll).
        # Clip + per-lane magnitude normalization: see make_step_ll -- the
        # stiff dynamic scale (~1e14) and the dt^-(nu+0.5) precondition push
        # the QR inputs past sqrt(f32 max); every consumer of the R blocks
        # is invariant under joint scaling, l_pred multiplies the max back.
        l_bar = jnp.clip(chol / pb, -1e30, 1e30)
        lq = jnp.stack(
            [jnp.stack([jnp.full_like(dt[0], c) for c in row], axis=0)
             for row in lq_rows],
            axis=0,
        )
        mag = new_scale * max_lq
        for c in range(n):
            mag = jnp.maximum(mag, jnp.max(jnp.abs(l_bar[c]), axis=0, keepdims=True))
        mag = jnp.maximum(mag * a_inf_norm, tiny_scale)
        inv_mag = 1.0 / mag
        l_bar_n = l_bar * inv_mag[None]
        a_l = _const_matmul(a_rows, l_bar_n)  # pre-normalized
        lq_scaled = (new_scale * inv_mag)[None, :, :] * lq
        magb = mag[None]  # (1, 1, B)

        if fixedpoint:
            zero_col = jnp.zeros_like(a_l[0])
            cols = [
                jnp.concatenate([a_l[c], lq_scaled[c]], axis=0) for c in range(n)
            ] + [
                jnp.concatenate([l_bar_n[c], zero_col], axis=0) for c in range(n)
            ]
            cols = _qr_r_cols_partial(cols, 2 * n, n)
            r_yy = jnp.stack([c[:n] for c in cols[:n]], axis=1)
            r_yx = jnp.stack([c[:n] for c in cols[n:]], axis=1)
            l_pred = pb * jnp.swapaxes(r_yy, 0, 1) * magb
            g_bar = jnp.swapaxes(_tri_solve_upper_ll(r_yy, r_yx, n), 0, 1)
            gain = pb * g_bar / p_arr[None, :, :]
        else:
            cols = [
                jnp.concatenate([a_l[c], lq_scaled[c]], axis=0) for c in range(n)
            ]
            cols = _qr_r_cols_partial(cols, 2 * n, n)
            l_pred = (
                pb * jnp.swapaxes(jnp.stack([c[:n] for c in cols], axis=1), 0, 1)
                * magb
            )
            gain = None

        # -- TS0/TS1 correction (rank-1 Potter update), mean in df32.
        # Observation row normalized before squaring (stiff TS1 Jacobians
        # ~1e6 push |l_obs|^2 past f32 max; the gain is scale-invariant).
        l_obs = _mid(l_pred, o, axis=0)  # (n, B)
        for k in range(o):
            if ts1:
                l_obs = l_obs - jacs[k] * _mid(l_pred, k, axis=0)
        m2 = _row(jnp.abs(l_obs), 0)
        for i in range(1, n):
            m2 = jnp.maximum(m2, _row(jnp.abs(l_obs), i))
        m2 = jnp.maximum(m2, tiny_scale)
        l_obs_n = l_obs / m2
        s2 = _row(l_obs_n, 0) ** 2
        for i in range(1, n):
            s2 = s2 + _row(l_obs_n, i) ** 2
        s2 = s2 + jnp.finfo(s2.dtype).tiny  # cancelled innovation -> zero gain
        crosscov = _matmul_ll(l_pred, l_obs_n[:, None, :], n)  # (n, 1, B)
        gc = crosscov / s2[None, :, :]  # = g_corr * m2 (l_pred units)
        g_corr = gc / m2[None]
        corr_term = df.mul1((z[0][None, :, :], z[1][None, :, :]), g_corr)
        mean_cor = df.sub(m_pred, corr_term)
        chol_cor = l_pred - gc * l_obs_n[None, :, :]

        # -- fixedpoint accumulation, increment form (O(local error) terms)
        if fixedpoint:
            diff = -(g_corr * z_hi[None, :, :])  # = (mean_cor - m_pred) to f32
            incr = _matmul_ll(g_acc, _matmul_ll(gain, diff, n), n)
            msp_new = df.add1((msp_hi, msp_lo), incr)
            g_acc_new = _matmul_ll(g_acc, gain, n)
        else:
            msp_new = (msp_hi, msp_lo)
            g_acc_new = g_acc

        # -- PI control
        errn_s = jnp.maximum(errn, jnp.finfo(errn.dtype).tiny)
        factor = ctrl.safety * jnp.exp(
            -n1 * jnp.log(errn_s) + n2 * (jnp.log(errn_prev) - jnp.log(errn_s))
        )
        factor = jnp.where(jnp.isfinite(factor), factor, ctrl.factor_min)
        dt_next = jnp.minimum(
            dt * jnp.clip(factor, ctrl.factor_min, ctrl.factor_max), dt_max
        )

        # the compensated time axis resolves increments down to ~2^-45 |t|
        dt_stall = 4.0 * _EPS_DF32 * jnp.maximum(jnp.abs(t_hi), 1.0)
        # tiny remainder steps force-accept: their truncation error is
        # ~rem^(nu+1), far below any tolerance, and their covariance
        # arithmetic (frozen below) may have overflowed
        accept = ((errn <= 1.0) | (dt <= dt_stall) | tiny) & ~frozen

        def sel(acc, old, mask=None):
            mask_ = accept if mask is None else mask
            while mask_.ndim < acc.ndim:
                mask_ = mask_[None]
            return jnp.where(mask_, acc, old)

        # accepted clamped steps snap t to exactly t_next and keep the
        # controller state (dt proposal, errn memory) untouched
        snap = accept & clamped
        t_out_hi = sel(jnp.where(snap, t_next, t_new[0]), t_hi)
        t_out_lo = sel(jnp.where(snap, jnp.zeros_like(t_lo), t_new[1]), t_lo)
        # rejected steps shrink dt via dt_next (factor < 1 there)
        dt_out = jnp.where(frozen | snap, dt_st, dt_next)

        # tiny steps advance the mean by pure extrapolation (no correction)
        # and freeze covariance/calibration/backward accumulation
        def sel_tiny(full, pred_only, old):
            m = tiny
            while m.ndim < full.ndim:
                m = m[None]
            return sel(jnp.where(m, pred_only, full), old)

        return (
            t_out_hi,
            t_out_lo,
            sel_tiny(mean_cor[0], m_pred_hi, mean_hi),
            sel_tiny(mean_cor[1], m_pred_lo, mean_lo),
            sel_tiny(chol_cor, chol, chol),
            sel_tiny(new_scale, scale, scale),
            sel_tiny(g_acc_new, g_acc, g_acc),
            sel_tiny(msp_new[0], msp_hi, msp_hi),
            sel_tiny(msp_new[1], msp_lo, msp_lo),
            dt_out,
            sel(jnp.where(snap, errn_prev, errn_s), errn_prev),
            sel_tiny(nsteps + 1.0, nsteps, nsteps),
        )

    return step


def _taylor_init_f64(vf, u0s_tuple, params, t0, *, nu, ode_order,
                     split_dtype=np.float32):
    """Per-lane Taylor-mode init in float64 on the host CPU.

    The exact initial state must carry df32 precision; f32 jets would seed
    the tight-tolerance solve with 2^-24-level derivative errors.  Runs
    eagerly under ``jax.enable_x64`` on the CPU backend (one-time cost),
    returns (hi, lo) numpy arrays of shape (B, n, d) in ``split_dtype``."""
    from . import taylor

    cpu = jax.local_devices(backend="cpu")[0]
    u0s_np = tuple(np.asarray(u, np.float64) for u in u0s_tuple)
    with jax.enable_x64(True), jax.default_device(cpu):
        def vf_p(*ys, t):
            return vf(*ys, t=t, p=params)

        def init_one(u0_tuple):
            tc = taylor.odejet_padded_scan(
                lambda *y: vf_p(*y, t=jnp.float64(t0)), u0_tuple,
                num=nu + 1 - ode_order,
            )
            return jnp.stack(tc, axis=0)  # (n, d)

        m0 = jax.vmap(init_one)(tuple(jnp.asarray(u) for u in u0s_np))
        m0 = np.asarray(m0, np.float64)
    if split_dtype == np.float64:
        return m0, np.zeros_like(m0)
    hi = m0.astype(np.float32)
    lo = (m0 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def wrap_vf_plain(vf, params):
    """Fallback df32 vector field evaluating ``vf`` on the hi channel only.

    Accuracy floor: the residual inherits ~2^-24 |f| evaluation noise, which
    feeds the mean through the (small) correction gain -- adequate to about
    rtol 1e-7; supply a true df32 vf (cf. problems.rigid_body_df) beyond."""

    def vf_df(args, t):
        fx = vf(*(a[0] for a in args), t=t[0][0], p=params)
        return fx, jnp.zeros_like(fx)

    return vf_df


def make_hi_solver(
    vf,
    params,
    *,
    save_at,
    dt0,
    vf_df=None,
    num_derivatives=4,
    strategy="fixedpoint",
    calibration="dynamic",
    atol_factor=1e-3,
    engine="pallas",
    interpret=False,
    lanes=None,
    control=None,
    hbm_budget="auto",
    ode_order=1,
    correction="ts0",
    error_unit="qoi",
    error_calibration=None,
    dtype=jnp.float32,
    shard_mesh=None,
    shard_axis="batch",
    max_attempts=100_000,
):
    """Build ``solve(u0s, tols) -> ((us_hi, us_lo), (uf_hi, uf_lo), nsteps)``.

    ``save_at`` values should be exactly representable in f32 (checkpoints
    are hit by clamping on the compensated time axis; a non-representable
    checkpoint lands on its f32 rounding).  The returned solve holds one
    jitted device program; the f64 Taylor init runs eagerly on the host CPU
    per call.  Combine outputs as ``np.float64(hi) + lo``.

    ``dtype=jnp.float64`` runs the identical algorithm on f64 pairs
    (double-double, ~2^-104) -- the CPU oracle mode used by the tests;
    requires x64 and the xla engine.

    ``shard_mesh``: a 1-D ``jax.sharding.Mesh`` lays the solve out over
    devices with ``jax.shard_map`` along ``shard_axis`` -- IVP ensembles are
    embarrassingly parallel, so each shard runs the fused step kernel on its
    local lanes with no collectives until the output gather.  Pass an
    explicit ``lanes`` so the per-shard tile width is deterministic.
    """
    nu = num_derivatives
    n = nu + 1
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    save_at_np = np.asarray(save_at, np_dtype)
    t0 = float(save_at_np[0])
    fixedpoint = strategy == "fixedpoint"
    vf_df_ = vf_df if vf_df is not None else wrap_vf_plain(vf, params)

    def device_solve(m0_hi, m0_lo, tols):
        # m0: (B, n, d) dtype pairs; tols: (B,)
        bb = m0_hi.shape[0]
        d = m0_hi.shape[2]

        def ll(x):  # (B, n, d) -> (n, d, B)
            return jnp.moveaxis(x, 0, -1)

        mean_hi, mean_lo = ll(m0_hi), ll(m0_lo)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, bb))
        state0 = (
            jnp.full((1, bb), t0, dtype),
            jnp.zeros((1, bb), dtype),
            mean_hi,
            mean_lo,
            jnp.zeros((n, n, bb), dtype),
            jnp.ones((1, bb), dtype),
            eye,
            mean_hi,
            mean_lo,
            jnp.full((1, bb), dt0, dtype),
            jnp.ones((1, bb), dtype),
            jnp.zeros((1, bb), dtype),
        )

        step_ll = make_step_hi(
            vf_df_, nu=nu, d=d, strategy=strategy, calibration=calibration,
            control=control, ode_order=ode_order, correction=correction,
            error_unit=error_unit, error_calibration=error_calibration,
        )
        lane_width = lanes or min(LANES * 4, max(LANES, bb))

        # Pair-aware done predicate: a lane whose accepted step rounds t_hi
        # exactly onto t_next with t_lo < 0 still has a positive remainder
        # (step() snaps it on the next attempt, setting t_lo to exactly 0),
        # so it must keep the loop alive; checking the hi word alone drops
        # its checkpoint ~ulp(t)/2 early.
        def _active_hi(s, t_next):
            return (s[0] < t_next) | ((s[0] == t_next) & (s[1] < 0))

        if engine == "pallas-loop":
            interval_call = _pallas_interval(
                step_ll, interpret=interpret, lanes=lane_width,
                num_state=NUM_STATE_HI, max_attempts=max_attempts,
                active_fn=_active_hi,
            )
            step_call = None
        elif engine == "pallas":
            interval_call = None
            step_call = _pallas_step(
                step_ll, interpret=interpret, lanes=lane_width,
                num_state=NUM_STATE_HI,
            )
        else:
            interval_call = None
            step_call = step_ll

        atol = (atol_factor * tols)[None, :].astype(dtype)
        rtol = tols[None, :].astype(dtype)
        dt_max_v = jnp.full((1, bb), float(save_at_np[-1] - save_at_np[0]), dtype)
        dt_floor_v = jnp.full(
            (1, bb), float(jnp.finfo(dtype).tiny) ** (1.0 / (nu + 1.5)), dtype
        )
        tiny_v = jnp.full((1, bb), float(jnp.finfo(dtype).tiny) ** 0.5, dtype)

        def per_checkpoint(state, t_next):
            t_next_v = jnp.full((1, bb), t_next, dtype)

            if interval_call is not None:
                state = interval_call(
                    state, t_next_v, atol, rtol, dt_max_v, dt_floor_v, tiny_v
                )
            else:
                def cond(carry):
                    s, k = carry
                    return jnp.any(_active_hi(s, t_next)) & (k < max_attempts)

                def body(carry):
                    s, k = carry
                    s2 = step_call(
                        s, t_next_v, atol, rtol, dt_max_v, dt_floor_v, tiny_v
                    )
                    return s2, k + 1

                # attempt cap = chip-hang guard (cf. solve_save_at_batched)
                state, _ = jax.lax.while_loop(
                    cond, body, (state, jnp.zeros((), jnp.int32))
                )
            (t_hi, t_lo, mean_hi, mean_lo, chol, scale,
             g_acc, msp_hi, msp_lo, dt_st, errn_prev, nsteps) = state
            emit = (mean_hi, mean_lo, msp_hi, msp_lo, g_acc, nsteps)
            # fixedpoint reset: next interval accumulates from THIS checkpoint
            state_next = (
                t_hi, t_lo, mean_hi, mean_lo, chol, scale,
                jnp.broadcast_to(
                    jnp.eye(n, dtype=dtype)[:, :, None], (n, n, bb)
                ),
                mean_hi, mean_lo, dt_st, errn_prev, nsteps,
            )
            return state_next, emit

        _final, (mf_hi, mf_lo, msp_hi_s, msp_lo_s, g_s, nsteps_s) = jax.lax.scan(
            per_checkpoint, state0, jnp.asarray(save_at_np[1:])
        )
        # stacks over T-1 checkpoints, lanes-last blocks

        # filtering qoi: u row of the mean at each checkpoint (+ t0 entry)
        uf_hi = jnp.concatenate([mean_hi[None, 0], mf_hi[:, 0]], axis=0)
        uf_lo = jnp.concatenate([mean_lo[None, 0], mf_lo[:, 0]], axis=0)
        nsteps_out = jnp.concatenate(
            [jnp.zeros((1, 1, bb), dtype), nsteps_s], axis=0
        )[:, 0]  # (T, B)

        if fixedpoint:
            # backward recursion over checkpoint intervals, small-difference
            # form: m_s(k) = msp(k) + G(k) (m_s(k+1) - m_f(k+1))
            m_last = (mf_hi[-1], mf_lo[-1])  # (n, d, B)

            def bwd(carry, inp):
                msp_h, msp_l, g_k, mf_h, mf_l = inp
                delta = df.sub(carry, (mf_h, mf_l))[0]  # small, f32
                m_k = df.add1((msp_h, msp_l), _matmul_ll(g_k, delta, n))
                return m_k, m_k

            _m0s, m_s = jax.lax.scan(
                bwd, m_last, (msp_hi_s, msp_lo_s, g_s, mf_hi, mf_lo),
                reverse=True,
            )
            # m_s[k] = smoothed state at checkpoint k (0..T-2); final = m_last
            us_hi = jnp.concatenate([m_s[0][:, 0], mf_hi[None, -1, 0]], axis=0)
            us_lo = jnp.concatenate([m_s[1][:, 0], mf_lo[None, -1, 0]], axis=0)
        else:
            us_hi, us_lo = uf_hi, uf_lo

        def bt(x):  # (T, d, B) -> (B, T, d)
            return jnp.moveaxis(x, -1, 0)

        return (
            (bt(us_hi), bt(us_lo)),
            (bt(uf_hi), bt(uf_lo)),
            jnp.moveaxis(nsteps_out, -1, 0).astype(jnp.int32),
        )

    if shard_mesh is not None:
        from jax.sharding import PartitionSpec

        _p = PartitionSpec(shard_axis)

        def _sharded(m0_hi, m0_lo, tols):
            return jax.shard_map(
                device_solve,
                mesh=shard_mesh,
                in_specs=(_p, _p, _p),
                out_specs=_p,  # pytree prefix: every output leaf is sharded
                check_vma=False,
            )(m0_hi, m0_lo, tols)

        jitted = jax.jit(_sharded)
        n_shards = int(np.prod([shard_mesh.shape[a] for a in shard_mesh.axis_names]))
    else:
        jitted = jax.jit(device_solve)
        n_shards = 1

    # the host-side f64 Taylor init is seconds at 32k+ lanes and repeats per
    # call; benchmark/production loops re-solve the same ensemble at many
    # tolerances, so memoize the latest ensemble's init by content hash
    init_cache = {}

    def solve(u0s, tols):
        import hashlib

        u0s_tuple = u0s if isinstance(u0s, tuple) else (u0s,)
        if len(u0s_tuple) != ode_order:
            raise ValueError(
                f"ode_order={ode_order} needs {ode_order} initial arrays, "
                f"got {len(u0s_tuple)}"
            )
        b, d = np.shape(u0s_tuple[0])
        check_hbm_budget(
            b, d, num_derivatives=nu, num_save_at=len(save_at_np),
            dtype=jnp.float32, budget=hbm_budget,
        )
        lane_width = lanes or min(LANES * 4, max(LANES, b))
        h = hashlib.sha1()
        for u in u0s_tuple:
            u_np = np.asarray(u)
            h.update(str(u_np.shape).encode())
            h.update(np.ascontiguousarray(u_np).tobytes())
        key = h.hexdigest()
        if key in init_cache:
            m0_hi, m0_lo = init_cache[key]
        else:
            m0_hi, m0_lo = _taylor_init_f64(
                vf, u0s_tuple, params, t0, nu=nu, ode_order=ode_order,
                split_dtype=np_dtype,
            )
            init_cache.clear()  # hold one ensemble (32k lanes ~ 10 MB)
            init_cache[key] = (m0_hi, m0_lo)
        pad = (-b) % (lane_width * n_shards)
        tols_np = np.asarray(tols, np_dtype)
        if pad:
            # pad with the LOOSEST lane (as make_bucketed_solver does): the
            # engines iterate each tile to its slowest lane, so padding with
            # the tightest-tolerance lane would replicate the maximum step
            # count across up to lane_width*n_shards-1 wasted lanes
            loosest = int(np.argmax(tols_np))
            m0_hi = np.concatenate(
                [m0_hi, np.tile(m0_hi[loosest : loosest + 1], (pad, 1, 1))]
            )
            m0_lo = np.concatenate(
                [m0_lo, np.tile(m0_lo[loosest : loosest + 1], (pad, 1, 1))]
            )
            tols_np = np.concatenate(
                [tols_np, np.full((pad,), tols_np[loosest], np_dtype)]
            )
        (us, uf, nsteps) = jitted(
            jnp.asarray(m0_hi), jnp.asarray(m0_lo), jnp.asarray(tols_np)
        )
        return (
            (us[0][:b], us[1][:b]),
            (uf[0][:b], uf[1][:b]),
            nsteps[:b],
        )

    return solve


def solve_save_at_hi(vf, u0s, params, *, save_at, dt0, tols, **kwargs):
    """One-shot convenience wrapper around :func:`make_hi_solver`."""
    solve = make_hi_solver(vf, params, save_at=save_at, dt0=dt0, **kwargs)
    return solve(u0s, tols)


def combine64(pair):
    """Collapse an (hi, lo) output pair to float64 on the host."""
    return np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)


def make_routed_solver(
    vf,
    params,
    *,
    save_at,
    dt0,
    vf_df=None,
    rtol_split=1e-5,
    num_buckets_f32=4,
    lanes=None,
    engine="pallas",
    interpret=False,
    **solve_kwargs,
):
    """Precision-routed mixed-tolerance driver (host-side builder).

    A production ensemble sweeps rtol across decades; one engine cannot be
    optimal for all of them.  This router composes the two fused engines:

    * lanes with rtol >= ``rtol_split`` go to the plain-f32 kernel through
      the step-count bucketing of :func:`batched.make_bucketed_solver`
      (loose lanes take few steps; padding them to tight lanes wastes
      while-iterations), and
    * lanes below the split go to the df32 pair kernel (plain f32 cannot
      represent their solutions at all: 2^-24 > 10 * rtol).

    The split threshold is where the f32 engine's accuracy floor
    (~4e-5 absolute on the rigid-body tspan-50 protocol: sqrt(N_steps)
    rounding accumulation) stops clearing a 10x-rtol gate; 1e-5 matches the
    bench partition (bench.py SWEEP_F32/SWEEP_F64).  Both sub-solvers hold
    ONE jitted program each; per-lane results are identical to running each
    lane in its own engine (lanes are mask-isolated).

    Returns ``solve(u0s, tols) -> (u64, nsteps)`` with ``u64`` the (B, T, d)
    float64 smoothed solution on the host (f32 lanes upcast, df32 lanes
    pair-combined); ``tols`` must be concrete (host values).
    """
    from . import batched

    lo_solve = batched.make_bucketed_solver(
        vf, params, save_at=save_at, dt0=dt0, num_buckets=num_buckets_f32,
        engine=engine, interpret=interpret, lanes=lanes, **solve_kwargs,
    )
    hi_solve = make_hi_solver(
        vf, params, save_at=save_at, dt0=dt0, vf_df=vf_df, engine=engine,
        interpret=interpret, lanes=lanes, **solve_kwargs,
    )

    def solve(u0s, tols):
        tols_np = np.asarray(tols)
        b = tols_np.shape[0]
        is_tuple = isinstance(u0s, tuple)
        loose = tols_np >= rtol_split
        idx_lo = np.nonzero(loose)[0]
        idx_hi = np.nonzero(~loose)[0]

        def take(idx):
            if is_tuple:
                return tuple(u[idx] for u in u0s)
            return u0s[idx]

        t_dim = len(np.asarray(save_at))
        d_dim = (u0s[0] if is_tuple else u0s).shape[-1]
        u64 = np.zeros((b, t_dim, d_dim), np.float64)
        nsteps = np.zeros((b, t_dim), np.int64)
        if idx_lo.size:
            (u_s, _uf, n), _ = lo_solve(take(idx_lo), jnp.asarray(tols_np[idx_lo]))
            u64[idx_lo] = np.asarray(u_s, np.float64)
            nsteps[idx_lo] = np.asarray(n)
        if idx_hi.size:
            us, _uf, n = hi_solve(take(idx_hi), tols_np[idx_hi])
            u64[idx_hi] = combine64(us)
            nsteps[idx_hi] = np.asarray(n)
        return u64, nsteps

    return solve
