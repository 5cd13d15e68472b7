"""Fused batched adaptive solver on the DENSE covariance backend.

Extends the lanes-last fused engine (``batched.py``) to the dense
``(n*d, n*d)`` square-root covariance -- the backend the reference selects
for stiff problems with cross-derivative correlations and the only one
supporting TS1/EK1 for d > 1
(/root/reference/experiments/1_van_der_pol/vdp.py:61-66 is the d=1 dense-TS1
class; this module covers the multi-dimensional extension: stiff ensembles of
small systems, e.g. Brusselator TS1 at small N, VdP-as-2d-system).

Layout (all lanes-last, B = lane axis):

* mean / bwd_m: flat derivative-major ``(nd, B)`` (rows ``i*d + k`` =
  derivative i, dimension k -- exactly the generic dense backend's ordering,
  ``ssm/dense.py:9-13``), so vector-field arguments are contiguous d-row
  slices;
* covariance factors: ``(nd, nd, B)`` row stacks;
* the IBM transition ``kron(A, I_d)`` is applied block-row-wise with the
  Pascal literals unrolled (no Kronecker materialization);
* QR work: the column-list Householder from ``batched`` at sizes
  ``(2nd, 2nd)`` (prediction revert) and ``(nd, d+nd)`` (correction revert).

Compile cost scales as O((nd)^3) unrolled vector ops: intended for small d
(<= ~8; d=1..4 measured).  Larger d stays on the generic vmapped path.

The state tuple matches ``batched.NUM_STATE`` field-for-field (shapes
differ), so ``_pallas_step`` / ``_pallas_interval`` are reused unchanged.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .batched import (
    LANES,
    NUM_STATE,
    _constants,
    _mid,
    _pallas_interval,
    _pallas_step,
    _qr_r_cols,
    _tri_solve_upper_ll,
    check_hbm_budget,
)
from .ivpsolve import _interpolate_at, _State
from .ssm.base import Conditional, MarkovSeq, Normal


def _row1(x2, i):
    """Row i of an (m, B) stack as (1, B)."""
    return jax.lax.slice_in_dim(x2, i, i + 1, axis=0)


def _dblock(x, k, d):
    """Rows [k*d, (k+1)*d) of an (nd, ..., B) stack.

    2-D (nd, B) stacks are sliced row-by-row and re-concatenated: a size-d
    slice at an unaligned SUBLANE offset crashes Mosaic's vector-layout pass
    (vector_extract_strided_slice: ``limits[i] <= dim(i)``), while size-1 row
    slices lower fine (the isotropic engine relies on them).  On >=3-D
    stacks axis 0 is an untiled leading dim and the direct slice is trivial.
    """
    if x.ndim == 2:
        return jnp.concatenate(
            [_row1(x, k * d + j) for j in range(d)], axis=0
        )
    return jax.lax.slice_in_dim(x, k * d, (k + 1) * d, axis=0)


def _col(x3, c):
    """Column c of an (m, n, B) row-stack as (m, B)."""
    return _mid(x3, c, axis=1)


def _rowscale(p, d, x):
    """Multiply rows of an (nd, ..., B) stack by the per-derivative scalars
    ``p`` (list of n (1, B) arrays), repeated d times each.

    Built as a full (nd, B) row-multiplier (concat of broadcasts) instead of
    slicing ``x`` into blocks: no sublane-offset slices (Mosaic-safe)."""
    rows = jnp.concatenate([pi for pi in p for _ in range(d)], axis=0)
    if x.ndim == 2:
        return x * rows
    return x * rows[:, None, :]


def _apply_a_blocks(a_rows, x, d, n):
    """kron(A, I_d) @ x for an (nd, ..., B) stack; A given as python literals."""
    blocks_in = [_dblock(x, j, d) for j in range(n)]
    out = []
    for i in range(n):
        acc = None
        for j, c in enumerate(a_rows[i]):
            if c == 0.0:
                continue
            term = blocks_in[j] if c == 1.0 else c * blocks_in[j]
            acc = term if acc is None else acc + term
        out.append(acc if acc is not None else jnp.zeros_like(blocks_in[0]))
    return jnp.concatenate(out, axis=0)


def _matmul_rows(a, b, m, inner):
    """(m, inner, B) @ (inner, k, B) via unrolled broadcast-sum."""
    out = a[:, 0:1, :] * b[0:1, :, :]
    for j in range(1, inner):
        out = out + a[:, j : j + 1, :] * b[j : j + 1, :, :]
    return out


def make_step_dense_ll(vf_batched, *, nu, d, strategy="fixedpoint",
                       calibration="dynamic", control=None, ode_order=1,
                       correction="ts1", error_unit="qoi",
                       error_calibration=None):
    """Lanes-last dense-backend adaptive attempt; pure jnp (Pallas-safe).

    Mirrors ``batched.make_step_ll`` semantics with the dense backend's
    covariance algebra (``ssm/dense.py``): full (nd, nd) factors, multi-row
    TS0/TS1 corrections via the single-QR revert, per-lane (d, d) Jacobians
    from d basis-vector jvps.
    """
    from .ivpsolve import Control

    ctrl = control or Control()
    o = ode_order
    n = nu + 1
    nd = n * d
    a_rows, lq_rows, lq_norms, inv_fact = _constants(nu)
    max_lq = max(abs(c) for row in lq_rows for c in row)
    a_inf_norm = max(1.0, max(sum(abs(c) for c in row) for row in a_rows))
    fixedpoint = strategy == "fixedpoint"
    needs_rev = strategy != "filter"
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

    def vf_jacs(args, t):
        # J_k = d f / d u^(k) as a list (over k) of lists (over columns c)
        # of (d, B) arrays: one unit-basis jvp per column.
        #
        # Mosaic workarounds (both measured on v5e): (a) ``.at[c].set``
        # lowers to scatter (unimplemented) -- build the one-hot from an
        # iota compare; (b) a CONSTANT one-hot tangent gets folded through
        # the vf's row indexing into per-row constants whose vector.extract
        # crashes the vector-layout pass ("limits[i] <= dim(i)") -- mask a
        # TRACED ones array instead so nothing constant-folds.
        outs = []
        for k in range(o):
            ones_t = jnp.ones_like(args[k]) + 0.0 * args[k]
            zeros_t = 0.0 * args[k]
            cols = []
            for c in range(d):
                def fk(a, _k=k):
                    return vf_batched(args[:_k] + (a,) + args[_k + 1 :], t)

                rows_i = jax.lax.broadcasted_iota(
                    jnp.int32, args[k].shape, 0
                )
                onehot = jnp.where(rows_i == c, ones_t, zeros_t)
                _, jv = jax.jvp(fk, (args[k],), (onehot,))
                cols.append(jv)
            outs.append(cols)
        return outs

    def precond(dt):
        pows = [None] * n
        pows[nu] = jnp.ones_like(dt)
        for i in reversed(range(nu)):
            pows[i] = pows[i + 1] * dt
        sq = jnp.sqrt(dt)
        return [sq * pows[i] * inv_fact[i] for i in range(n)]

    def lq_rows_scaled(scale_1B):
        """ROWS of kron(Lq, I_d) * scale as (nd, B) vectors: row i*d+j has
        Lq[i, kk]*scale at position kk*d+j (needed because the revert-QR
        input columns are built from the transposed blocks, i.e. from rows)."""
        out = []
        zero = jnp.zeros_like(scale_1B)
        for i in range(n):
            for j in range(d):
                entries = []
                for kk in range(n):
                    c = lq_rows[i][kk]
                    for jj in range(d):
                        entries.append(c * scale_1B if (jj == j and c != 0.0) else zero)
                out.append(jnp.concatenate(entries, axis=0))
        return out  # nd rows, each (nd, B)

    def step(state, t_next, atol, rtol, dt_max, dt_floor, tiny_scale):
        (t, mean, chol, bwdG, bwd_m, bwd_L, scale, t_prev, mean_prev, chol_prev,
         bwdG_prev, bwd_m_prev, bwd_L_prev, dt_st, errn_prev, nsteps, mle) = state

        dt = jnp.clip(dt_st, dt_floor, dt_max)
        p = precond(dt)  # n x (1, B)
        p_inv = [1.0 / pi for pi in p]
        t_new = t + dt

        # -- extrapolate mean: m_pred = P (A kron I) P^-1 m
        m_bar = _rowscale(p_inv, d, mean)
        m_pred = _rowscale(p, d, _apply_a_blocks(a_rows, m_bar, d, n))

        # -- linearize at the predicted mean
        u_pred = _dblock(m_pred, 0, d)  # (d, B)
        args = tuple(_dblock(m_pred, k, d) for k in range(o))
        fx = vf_batched(args, t_new)
        z = _dblock(m_pred, o, d) - fx  # (d, B)
        jacs = vf_jacs(args, t_new) if ts1 else []

        # -- sigma + step-control error from the residual model
        # h_q rows (d, nd, B): row r of H Q_unit^{1/2}; block k col j entry:
        #   (p_o Lq[o,k] I - sum_k' p_k' Lq[k',k] J_k')[r, j]
        # assembled column-wise; rows are jointly row-normalized with z
        # (exact invariance of sigma/gain under row scaling)
        hq_rows = []
        for r in range(d):
            cols = []
            for kk in range(n):
                base = p[o] * lq_rows[o][kk]
                for j in range(d):
                    acc = base if j == r else None
                    if ts1:
                        for k in range(o):
                            if lq_rows[k][kk] == 0.0:
                                continue
                            term = (p[k] * lq_rows[k][kk]) * _row1(jacs[k][j], r)
                            acc = -term if acc is None else acc - term
                    if acc is None:
                        acc = jnp.zeros_like(p[0])
                    cols.append(acc)
            hq_rows.append(jnp.concatenate(cols, axis=0))  # (nd, B)

        # row norms for normalization
        eps_t = jnp.finfo(z.dtype).tiny
        row_mag = []
        for r in range(d):
            m2 = jnp.max(jnp.abs(hq_rows[r]), axis=0, keepdims=True)
            row_mag.append(jnp.maximum(m2, tiny_scale))
        hq_n = [hq_rows[r] / row_mag[r] for r in range(d)]
        z_n = jnp.concatenate([_row1(z, r) / row_mag[r] for r in range(d)], axis=0)

        # R_s (d, d, B) from QR of hq^T (nd, d): columns are the hq rows.
        # Row scaling of (h_q, z) is exactly invariant for the whitened norm:
        # with D = diag(row_mag)^-1, R' = R D and z' = D z give the same w.
        rs_cols = _qr_r_cols([hq_n[r] for r in range(d)], nd, d)
        r_s = jnp.stack(rs_cols, axis=1)[:d]  # (d, d, B) upper
        # whiten z: solve R_s^T w = z_n (lower-triangular forward subst)
        white = [None] * d
        for i in range(d):
            col_i = _col(r_s, i)  # (d, B): column i of R_s
            acc = _row1(z_n, i)
            for j in range(i):
                acc = acc - _row1(col_i, j) * white[j]
            diag = _row1(col_i, i)
            diag = jnp.where(jnp.abs(diag) > eps_t, diag, eps_t)
            white[i] = acc / diag
        ww = white[0] ** 2
        for i in range(1, d):
            ww = ww + white[i] ** 2
        sigma = jnp.sqrt(ww) / sqrt_d

        if error_unit == "residual":
            # sqrt(diag S) per row, un-normalized
            err_rows = []
            for r in range(d):
                s2 = hq_rows[r][0:1] ** 2
                for q in range(1, nd):
                    s2 = s2 + hq_rows[r][q : q + 1] ** 2
                err_rows.append(sigma * jnp.sqrt(s2))
            err_u = jnp.concatenate(err_rows, axis=0)  # (d, B)
        else:
            err_u = jnp.broadcast_to(
                sigma * (p[0] * lq_norms[0]), (d,) + sigma.shape[1:]
            )
        tol_w = atol + rtol * jnp.abs(u_pred)
        e2 = (_row1(err_u, 0) / _row1(tol_w, 0)) ** 2
        for r in range(1, d):
            e2 = e2 + (_row1(err_u, r) / _row1(tol_w, r)) ** 2
        errn = kappa * jnp.sqrt(e2 / (1.0 * d))

        if calibration == "dynamic":
            big = float(jnp.finfo(sigma.dtype).max) ** 0.4
            sigma_safe = jnp.where(jnp.isfinite(sigma), sigma, big)
            new_scale = jnp.clip(sigma_safe, tiny_scale, big)
        else:
            new_scale = scale

        # -- extrapolate covariance (preconditioned, jointly normalized)
        l_bar = jnp.clip(_rowscale(p_inv, d, chol), -1e30, 1e30)
        mag = new_scale * max_lq
        for c in range(nd):
            mag = jnp.maximum(mag, jnp.max(jnp.abs(_col(l_bar, c)), axis=0, keepdims=True))
        mag = jnp.maximum(mag * a_inf_norm, tiny_scale)
        inv_mag = 1.0 / mag
        l_bar_n = l_bar * inv_mag[None]
        a_l = _apply_a_blocks(a_rows, l_bar_n, d, n)
        lq_r = lq_rows_scaled(new_scale * inv_mag)
        magb = mag[None]

        if needs_rev:
            # revert-QR input columns are ROWS of the blocks (the stacked
            # matrix is [[ (A Lbar)^T, Lbar^T ], [ Lq^T, 0 ]], exactly as in
            # the isotropic engine): col c (c < nd) = [a_l[c]; lq_row c],
            # col nd+c = [l_bar_n[c]; 0]
            zero_col = jnp.zeros_like(a_l[0])
            cols = [
                jnp.concatenate([a_l[c], lq_r[c]], axis=0)
                for c in range(nd)
            ] + [
                jnp.concatenate([l_bar_n[c], zero_col], axis=0)
                for c in range(nd)
            ]
            cols = _qr_r_cols(cols, 2 * nd, 2 * nd)
            r = jnp.stack(cols, axis=1)  # (2nd, 2nd, B)
            r_yy = r[:nd, :nd, :]
            r_yx = r[:nd, nd:, :]
            r_xx = r[nd:, nd:, :]
            l_pred_bar = jnp.swapaxes(r_yy, 0, 1) * magb
            g_bar = jnp.swapaxes(_tri_solve_upper_ll(r_yy, r_yx, nd), 0, 1)
            l_bwd_bar = jnp.swapaxes(r_xx, 0, 1) * magb
            l_pred = _rowscale(p, d, l_pred_bar)
            # column scaling by p_inv: gain[:, j*d+c] *= p_inv[j].  Built as
            # a stacked (1, nd, B) row multiplier -- a middle-axis offset
            # slice here crashes Mosaic's vector-layout pass.
            p_inv_cols = jnp.stack(
                [p_inv[col // d][0] for col in range(nd)], axis=0
            )[None]  # (1, nd, B)
            gain = _rowscale(p, d, g_bar) * p_inv_cols
            bwd_L_step = _rowscale(p, d, l_bwd_bar)
            bwd_m_step = mean - _matmul_rows(gain, m_pred[:, None, :], nd, nd)[:, 0, :]
        else:
            cols = [
                jnp.concatenate([a_l[c], lq_r[c]], axis=0)
                for c in range(nd)
            ]
            cols = _qr_r_cols(cols, 2 * nd, nd)
            r = jnp.stack(cols, axis=1)[:nd]
            l_pred = _rowscale(p, d, jnp.swapaxes(r, 0, 1) * magb)
            gain = bwd_m_step = bwd_L_step = None

        # -- multi-row TS0/TS1 correction: one QR revert on (nd, d + nd)
        # h_l rows (nd, B): H L with H = E_o - sum_k J_k E_k
        hl_rows = []
        for r in range(d):
            acc = _dblock(l_pred, o, d)[r]  # (nd, B) row o*d+r of L
            for k in range(o):
                if not ts1:
                    break
                blk = _dblock(l_pred, k, d)  # (d, nd, B)
                for c in range(d):
                    acc = acc - _row1(jacs[k][c], r)[0][None, :] * blk[c]
            hl_rows.append(acc)  # (nd, B)
        # joint row normalization (h_l row r, z row r)
        hl_mag = []
        for r in range(d):
            m2 = jnp.max(jnp.abs(hl_rows[r]), axis=0, keepdims=True)
            hl_mag.append(jnp.maximum(m2, tiny_scale))
        hl_n = [hl_rows[r] / hl_mag[r] for r in range(d)]
        z_c = jnp.concatenate(
            [_row1(z, r) / hl_mag[r] for r in range(d)], axis=0
        )  # (d, B) normalized residual

        # X = [[ (HL)^T, L^T ]]: col r (r < d) = HL row r, col d+c = L row c
        lp_cols = [l_pred[c] for c in range(nd)]
        # joint scalar normalization of every column for QR conditioning;
        # the per-row h_l scaling D and the scalar inv_l both pass through
        # Householder QR as exact column scalings of R, so:
        #   gain' = solve(r_yy', r_yx') applied to the NORMALIZED residual
        #   z_c = D z reproduces gain_true @ z exactly, and
        #   l_cor = (r_xx')^T * lmag undoes the scalar on the L block.
        lmag = tiny_scale
        for c in range(nd):
            lmag = jnp.maximum(lmag, jnp.max(jnp.abs(lp_cols[c]), axis=0, keepdims=True))
        inv_l = 1.0 / lmag
        cols_c = [hl * inv_l for hl in hl_n] + [c_ * inv_l for c_ in lp_cols]
        cols_c = _qr_r_cols(cols_c, nd, d + nd)
        r_c = jnp.stack(cols_c, axis=1)  # (nd, d+nd, B) upper-trapezoid
        r_yy = r_c[:d, :d, :]
        r_yx = r_c[:d, d:, :]
        r_xx = r_c[d:, d:, :] * lmag[None]
        gain_c = jnp.swapaxes(_tri_solve_upper_ll(r_yy, r_yx, d), 0, 1)
        # mean_cor = m_pred - gain' @ z_c (normalized units; see above)
        delta = _col(gain_c, 0) * _row1(z_c, 0)
        for r in range(1, d):
            delta = delta + _col(gain_c, r) * _row1(z_c, r)
        mean_cor = m_pred - delta
        # corrected factor: rows of (r_xx padded)^T -> (nd, nd, B)
        chol_cor = jnp.swapaxes(
            jnp.concatenate([r_xx, jnp.zeros_like(r_xx[:d])], axis=0)[:nd],
            0,
            1,
        )

        # -- fixedpoint accumulation (nd-sized, mirrors the isotropic path)
        if needs_rev:
            if fixedpoint:
                bwdG_new = _matmul_rows(bwdG, gain, nd, nd)
                bwd_m_new = (
                    _matmul_rows(bwdG, bwd_m_step[:, None, :], nd, nd)[:, 0, :]
                    + bwd_m
                )
                mag_g = tiny_scale
                for c in range(nd):
                    mag_g = jnp.maximum(
                        mag_g, jnp.max(jnp.abs(_col(bwdG, c)), axis=0, keepdims=True)
                    )
                inv_g = 1.0 / mag_g
                m1 = _matmul_rows(bwdG * inv_g[None], bwd_L_step, nd, nd)
                bl_g = bwd_L * inv_g[None]
                t3 = tiny_scale
                for c in range(nd):
                    t3 = jnp.maximum(
                        t3, jnp.max(jnp.abs(_col(m1, c)), axis=0, keepdims=True)
                    )
                    t3 = jnp.maximum(
                        t3, jnp.max(jnp.abs(_col(bl_g, c)), axis=0, keepdims=True)
                    )
                inv3 = 1.0 / t3
                # QR input columns are ROWS of [m1; bl_g] (transposed stack)
                cols2 = [
                    jnp.concatenate([m1[c] * inv3, bl_g[c] * inv3], axis=0)
                    for c in range(nd)
                ]
                cols2 = _qr_r_cols(cols2, 2 * nd, nd)
                bwd_L_new = (
                    jnp.swapaxes(jnp.stack(cols2, axis=1)[:nd], 0, 1) * t3[None]
                ) * mag_g[None]
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


def _generic_to_state_dense(s: _State, needs_rev, dtype):
    """Vmapped generic dense _State (leading batch) -> lanes-last tuple."""

    def t2(x):  # (B, m) -> (m, B)
        return jnp.moveaxis(x, 0, -1)

    def t3(x):  # (B, m, k) -> (m, k, B)
        return jnp.moveaxis(x, 0, -1)

    def t1(x):  # (B,) -> (1, B)
        return x[None, :].astype(dtype)

    if needs_rev:
        bparts = (t3(s.bwd.matrix), t2(s.bwd.noise.mean), t3(s.bwd.noise.cholesky))
        bprev = (
            t3(s.bwd_prev.matrix),
            t2(s.bwd_prev.noise.mean),
            t3(s.bwd_prev.noise.cholesky),
        )
    else:
        zG = jnp.zeros_like(t3(s.rv.cholesky))
        zm = jnp.zeros_like(t2(s.rv.mean))
        bparts = bprev = (zG, zm, zG)
    return (
        t1(s.t),
        t2(s.rv.mean),
        t3(s.rv.cholesky),
        *bparts,
        t1(s.scale_step),
        t1(s.t_prev),
        t2(s.rv_prev.mean),
        t3(s.rv_prev.cholesky),
        *bprev,
        t1(s.dt),
        t1(s.errn_prev),
        t1(s.num_steps.astype(dtype)),
        t1(s.mle_ssq),
    )


def _state_to_generic_dense(state, needs_rev):
    """Lanes-last dense tuple -> vmapped generic _State (leading batch)."""

    def t2(x):  # (m, B) -> (B, m)
        return jnp.moveaxis(x, -1, 0)

    def t3(x):
        return jnp.moveaxis(x, -1, 0)

    def t1(x):
        return x[0]

    rv = Normal(t2(state[1]), t3(state[2]))
    rv_prev = Normal(t2(state[8]), t3(state[9]))
    if needs_rev:
        bwd = Conditional(t3(state[3]), Normal(t2(state[4]), t3(state[5])))
        bwd_prev = Conditional(
            t3(state[10]), Normal(t2(state[11]), t3(state[12]))
        )
    else:
        bwd = bwd_prev = None
    return _State(
        t=t1(state[0]),
        rv=rv,
        bwd=bwd,
        scale_step=t1(state[6]),
        t_prev=t1(state[7]),
        rv_prev=rv_prev,
        bwd_prev=bwd_prev,
        dt=t1(state[13]),
        errn_prev=t1(state[14]),
        num_steps=t1(state[15]).astype(jnp.int32),
        mle_ssq=t1(state[16]),
    )


def solve_save_at_batched_dense(
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
    correction="ts1",
    error_unit="qoi",
    error_calibration=None,
    max_attempts=100_000,
):
    """Batched fixed-memory adaptive solve on the dense backend.

    Same contract as ``batched.solve_save_at_batched`` (returns
    ``(u_smoothed (B, T, d), u_filtered (B, T, d), num_steps (B, T))``), with
    the dense (n*d, n*d) covariance required for TS1 at d > 1.  Compile cost
    grows as O((nd)^3); intended for small-d stiff ensembles.
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
    n = nu + 1
    check_hbm_budget(
        b, n * d, num_derivatives=nu, num_save_at=len(save_at),
        dtype=u0s_tuple[0].dtype, budget=hbm_budget,
    )
    # VMEM-aware default tile width (multiples of the 128-lane vreg width):
    # the in-kernel state carries ~7 dense (nd, nd, lanes) factors and the
    # QR roughly doubles the live set; target ~4 MB so the pallas-loop
    # engine's whole-interval state stays VMEM-resident (measured on v5e:
    # nd=20 fits at 128 lanes, exhausts VMEM at 256)
    if lanes is None:
        per_lane = 14 * (n * d) ** 2 * jnp.dtype(u0s_tuple[0].dtype).itemsize
        fit = (4 << 20) // max(per_lane, 1)
        lane_width = max(LANES, min(LANES * 4, (fit // LANES) * LANES))
    else:
        lane_width = lanes
    pad = (-b) % lane_width
    if pad:
        loosest = jnp.argmax(tols)

        def rep(u):
            row = jax.lax.dynamic_slice_in_dim(u, loosest, 1, axis=0)
            return jnp.concatenate([u, jnp.tile(row, (pad, 1))])

        u0s_tuple = tuple(rep(u) for u in u0s_tuple)
        tols = jnp.concatenate(
            [tols, jnp.full((pad,), 1.0, tols.dtype) * tols[loosest]]
        )
    bb = u0s_tuple[0].shape[0]
    dtype = u0s_tuple[0].dtype
    save_at = jnp.asarray(save_at, dtype)

    ssm = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(d,), implementation="dense"
    )
    corr = (
        ivpsolvers.correction_ts1(ode_order=ode_order)
        if correction == "ts1"
        else ivpsolvers.correction_ts0(ode_order=ode_order)
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
        mle_ssq=jnp.zeros((bb,), dtype),
    )
    state0 = _generic_to_state_dense(s0_generic, needs_rev, dtype)

    step_ll = make_step_dense_ll(
        vfb, nu=nu, d=d, strategy=strategy, calibration=calibration,
        ode_order=ode_order, correction=correction, error_unit=error_unit,
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
        gen = _state_to_generic_dense(state, needs_rev)
        (rv_e, cond_e), gen2 = interp_v(gen, t_next)
        state2 = _generic_to_state_dense(gen2, needs_rev, dtype)
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
