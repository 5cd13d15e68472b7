"""QR-only square-root linear algebra for probabilistic ODE solvers.

This is the numerical core that the reference's pip dependency (probdiffeq's
``impl`` backends; selected at /root/reference/src/odecheckpts/ivpsolvers.py:33)
performs internally.  Everything here follows the QR-only square-root Kalman
filter recipe (arXiv:2208.06452): covariances are never formed; all updates act
on right factors ``R`` with ``Sigma = R^T R`` via a single QR decomposition.

TPU-first design notes
----------------------
* The hot shapes are tiny -- ``(2(nu+1), nu+1)`` stacks with ``nu <= 8`` --
  and appear under heavy ``vmap`` (thousands of independent IVPs).  XLA's
  generic ``lax.linalg.qr`` is not the fast path for those shapes on TPU, so
  ``qr_r`` provides an unrolled Householder elimination built from plain
  elementwise/matmul ops: under ``vmap`` it compiles to fully batched VPU/MXU
  work with no per-matrix control flow.  Larger (dense-impl) shapes fall back
  to ``jnp.linalg.qr``.
* All functions are shape-polymorphic in leading batch dimensions and contain
  no data-dependent control flow, so they are free to ``jit``/``vmap``/
  ``shard_map``/differentiate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this column count, use the unrolled Householder QR (fast + batched on
# TPU); between it and _LOOP_MAX_COLS, the fori_loop Householder (same
# arithmetic, one-reflection program — keeps relay compiles fast at the dense
# backend's (2nd, 2nd) revert shapes, where XLA's blocked QR was measured
# 9.4x SLOWER than the elementwise Householder at d=8, nu=4:
# experiments/6_tpu_batched_sweep/data_dense_mxu.json); above that, XLA's QR.
_UNROLL_MAX_COLS = 24
_LOOP_MAX_COLS = 128


def _sign_safe(x):
    """sign(x) that maps 0 -> 1 (keeps Householder reflections well-defined)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _scaled_col_stats(colm, is_j, eps):
    """Column norm stats in per-column POWER-OF-TWO scaled coordinates.

    ``colm``: (..., m) masked column.  Returns ``(cs, norm2, norm, head)``
    with ``cs = colm / 2^e`` for ``e = floor(log2(max|colm|))``.

    Why: the Householder reflection is invariant to scaling its vector, but
    the column-norm SQUARES entries -- and on TPU the x64 mode is a
    pair-of-f32 emulation whose exponent range (and subnormal flush) is
    f32's, not f64's.  Stiff preconditioned factors carry columns spanning
    ~1e-22..1e12 in one matrix: the tiny columns' squares flush to zero on
    chip (norm 0 -> skipped reflection -> non-triangular R -> NaN
    downstream), while true f64 on CPU resolves them.  Scaling each column
    by a power of two is EXACT in floating point (pure exponent shift), so
    CPU results are bit-identical and the chip sees O(1) squares.
    (Measured round 5: probe_range shows (1e25)^2 = NaN on-device under
    x64; the on-chip stiff VdP sequential solve was non-finite at
    34,080/37,377 grid points before this rescale.)
    """
    cmax = jnp.max(jnp.abs(colm), axis=-1, keepdims=True)
    cok = jnp.isfinite(cmax) & (cmax > 0)
    ce = jnp.exp2(jnp.floor(jnp.log2(jnp.where(cok, cmax, 1.0))))
    ce = jax.lax.stop_gradient(jnp.where(cok, ce, 1.0))
    cs = colm / ce
    norm2 = jnp.sum(cs * cs, axis=-1, keepdims=True)
    # tiny floor keeps sqrt differentiable at exactly-zero columns (rank-
    # deficient factors occur by construction after exact corrections)
    norm = jnp.sqrt(norm2 + eps)
    head = jnp.sum(cs * is_j, axis=-1, keepdims=True)
    return cs, norm2, norm, head


def _qr_r_householder(x):
    """R factor of QR via unrolled masked Householder reflections.

    ``x``: (..., m, n), m/n static and small.  Returns (..., min(m, n), n)
    upper-triangular with ``R^T R = x^T x``.  Unrolled over the (static)
    columns; the reflector is the j-th column masked to rows >= j and is
    applied to the FULL matrix (already-eliminated columns are untouched
    since their rows >= j are zero) -- concat-free, so the whole elimination
    is fusable batched elementwise/matvec work under vmap.
    """
    m, n = x.shape[-2], x.shape[-1]
    k = min(m, n)
    eps = jnp.finfo(x.dtype).tiny
    rows = jnp.arange(m)
    for j in range(min(n, m - 1)):
        col = x[..., :, j]  # (..., m)
        below = (rows >= j).astype(x.dtype)
        is_j = (rows == j).astype(x.dtype)
        colm = col * below
        cs, norm2, norm, head = _scaled_col_stats(colm, is_j, eps)
        alpha = -_sign_safe(head) * norm
        v = cs - is_j * alpha
        # ||v||^2 = ||cs||^2 + alpha^2 - 2 head alpha  (scaled coordinates;
        # the reflection H = I - 2 v v^T/||v||^2 is invariant to scaling v)
        vnorm2 = norm2 + alpha * alpha - 2.0 * head * alpha
        # Degenerate column (already eliminated): skip the reflection.
        safe = vnorm2 > eps
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        coeff = jnp.einsum("...i,...ik->...k", v, x)  # (..., n)
        x = x - inv[..., None] * v[..., :, None] * coeff[..., None, :]
    return x[..., :k, :]


def _qr_r_householder_loop(x):
    """``fori_loop`` variant of `_qr_r_householder` for mid-size columns.

    Identical per-reflection arithmetic with the column index traced instead
    of unrolled: the compiled program holds ONE reflection body regardless of
    the column count (the dense backend's revert reaches (2nd, 2nd) = (80, 80)
    at d=8, nu=4 — 79 unrolled reflections would bloat every step of the
    adaptive while loop).  Static trip count, so it lowers to `scan` and
    stays reverse-mode differentiable.
    """
    m, n = x.shape[-2], x.shape[-1]
    k = min(m, n)
    eps = jnp.finfo(x.dtype).tiny
    rows = jnp.arange(m)

    def body(j, x):
        col = jnp.take(x, j, axis=-1)  # (..., m)
        below = (rows >= j).astype(x.dtype)
        is_j = (rows == j).astype(x.dtype)
        colm = col * below
        cs, norm2, norm, head = _scaled_col_stats(colm, is_j, eps)
        alpha = -_sign_safe(head) * norm
        v = cs - is_j * alpha
        vnorm2 = norm2 + alpha * alpha - 2.0 * head * alpha
        safe = vnorm2 > eps
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        coeff = jnp.einsum("...i,...ik->...k", v, x)
        return x - inv[..., None] * v[..., :, None] * coeff[..., None, :]

    x = jax.lax.fori_loop(0, min(n, m - 1), body, x)
    return x[..., :k, :]


def qr_r(x):
    """Upper-triangular/trapezoidal ``R`` with ``R^T R = x^T x``; diag(R) >= 0.

    ``x``: (..., m, n).  Returns (..., min(m, n), n).  The sign normalization
    makes the factor unique, which keeps results deterministic across
    backends.
    """
    m, n = x.shape[-2], x.shape[-1]
    k = min(m, n)
    # Magnitude guard (round 4, refined round 5): stiff f32 factors
    # legitimately reach ~1e22 (preconditioner powers dt^-(nu+1/2) at
    # dt ~ 1e-5 on VdP mu=1e3 adaptive grids), and the Householder column
    # norm SQUARES entries -- overflow to inf -> NaN through the whole
    # downstream solve.  The rescale is a POWER OF TWO, so it is exact in
    # floating point (a pure exponent shift, no mantissa rounding), and it
    # only engages outside a wide safe exponent band: inside the band
    # c == 1 and the elimination is bit-identical to unnormalized
    # arithmetic, keeping generic and fused stacks' accept/reject
    # decisions in exact agreement.  (Round-4 regression: dividing by the
    # raw max added two roundings per factor and flipped knife-edge
    # accept steps between the stacks.)
    amax = jnp.max(jnp.abs(x), axis=(-2, -1), keepdims=True)
    ok = jnp.isfinite(amax) & (amax > 0)
    e = jnp.floor(jnp.log2(jnp.where(ok, amax, 1.0)))
    band = jnp.finfo(x.dtype).maxexp // 3
    c = jnp.where(ok & (jnp.abs(e) > band), jnp.exp2(e), jnp.ones_like(amax))
    c = jax.lax.stop_gradient(c)
    if min(m - 1, n) <= _UNROLL_MAX_COLS:
        r = _qr_r_householder(x / c)
    elif min(m - 1, n) <= _LOOP_MAX_COLS:
        r = _qr_r_householder_loop(x / c)
    else:
        r = jnp.linalg.qr(x / c, mode="r")
    d = _sign_safe(jnp.diagonal(r, axis1=-2, axis2=-1))
    return r[..., :k, :] * (c * d[..., :, None])


def chol_from_stack(*stacked):
    """Lower Cholesky-like factor of ``sum_i X_i^T X_i`` from right factors.

    Arguments are (..., m_i, n) blocks; returns (..., n, n) lower-triangular L
    with ``L L^T = sum_i X_i^T X_i``.  This is the sqrt-Kalman "propagate
    covariance through a sum" primitive (predict step: X_1 = (A L_prev)^T,
    X_2 = s * Lq^T).
    """
    x = jnp.concatenate(stacked, axis=-2)
    return jnp.swapaxes(qr_r(x), -1, -2)


def revert_markov(a_l, l_q, l_prev):
    """Joint square-root factorization of one Gauss-Markov transition.

    Given the previous covariance factor ``l_prev`` (n, n, lower,
    Sigma = L L^T), the transformed factor ``a_l = A @ l_prev`` and the process
    noise factor ``l_q`` (n, n, lower, already scaled), compute in ONE QR:

      * ``l_pred``  -- lower factor of the predicted covariance
        ``A Sigma A^T + Q``;
      * ``gain``    -- the backward (RTS) gain ``G = Sigma A^T S_pred^{-1}``;
      * ``l_bwd``   -- lower factor of the backward conditional covariance
        ``Sigma - G S_pred G^T``.

    This is the "reversal" that powers the smoother and the paper's
    fixed-point (O(#checkpoints)-memory) strategy; see SURVEY.md section 1-L1
    and arXiv:2208.06452.  Batched over leading dims.
    """
    n = l_prev.shape[-1]
    zeros = jnp.zeros_like(l_q)
    # Rows span [predicted | previous]:  X = [[ (A L)^T, L^T ], [ Lq^T, 0 ]]
    top = jnp.concatenate(
        [jnp.swapaxes(a_l, -1, -2), jnp.swapaxes(l_prev, -1, -2)], axis=-1
    )
    bottom = jnp.concatenate([jnp.swapaxes(l_q, -1, -2), zeros], axis=-1)
    r = qr_r(jnp.concatenate([top, bottom], axis=-2))
    r_yy = r[..., :n, :n]  # upper-tri; R_yy^T R_yy = S_pred
    r_yx = r[..., :n, n:]  # R_yy^T R_yx = A Sigma (cross-cov)
    r_xx = r[..., n:, n:]  # backward conditional factor
    l_pred = jnp.swapaxes(r_yy, -1, -2)
    # G = (R_yy^{-1} R_yx)^T  -- triangular solve, no explicit inverse.
    gain = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(r_yy, r_yx, lower=False), -1, -2
    )
    l_bwd = jnp.swapaxes(r_xx, -1, -2)
    return l_pred, gain, l_bwd


def revert_observation(l_prev, h_l, l_noise=None):
    """Square-root correction for a linear observation ``y = H x + eps``.

    ``l_prev``: (n, n) lower prior factor; ``h_l``: (m, n) = H @ L;
    ``l_noise``: optional (m, m) lower observation-noise factor (None = exact,
    noise-free constraint as in the TS* corrections).  One QR of
    ``[[ (H L)^T, L^T ], [ L_eps^T, 0 ]]`` yields the observation factor
    (m, m, lower, with ``S = L_s L_s^T``), the Kalman gain
    ``K = Sigma H^T S^{-1}`` and the corrected covariance factor (n, n lower;
    in the noise-free case exactly rank n-m and zero-padded to square so
    shapes stay static).  Used by the dense backend for TS0/TS1 corrections
    and by the data-likelihood updates in ``stats``.
    """
    n = l_prev.shape[-1]
    m = h_l.shape[-2]
    x = jnp.concatenate(
        [jnp.swapaxes(h_l, -1, -2), jnp.swapaxes(l_prev, -1, -2)], axis=-1
    )
    if l_noise is not None:
        zeros = jnp.zeros(l_noise.shape[:-2] + (m, n), l_noise.dtype)
        noise_rows = jnp.concatenate([jnp.swapaxes(l_noise, -1, -2), zeros], axis=-1)
        x = jnp.concatenate([x, noise_rows], axis=-2)
    r = qr_r(x)  # upper-trapezoidal
    r_yy = r[..., :m, :m]
    r_yx = r[..., :m, m:]
    r_xx = r[..., m:, m:]
    l_obs = jnp.swapaxes(r_yy, -1, -2)
    gain = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(r_yy, r_yx, lower=False), -1, -2
    )
    if r_xx.shape[-2] < n:
        pad = jnp.zeros(r_xx.shape[:-2] + (n - r_xx.shape[-2], n), r_xx.dtype)
        r_xx = jnp.concatenate([r_xx, pad], axis=-2)
    l_cor = jnp.swapaxes(r_xx[..., :n, :], -1, -2)
    return l_obs, gain, l_cor


def tri_logdet(l):
    """log |det L| for a triangular factor (sum of log |diagonal|)."""
    diag = jnp.diagonal(l, axis1=-2, axis2=-1)
    return jnp.sum(jnp.log(jnp.abs(diag)), axis=-1)


def tri_solve_lower(l, b):
    """Solve ``L x = b`` with L lower-triangular (batched via the primitive)."""
    return jax.scipy.linalg.solve_triangular(l, b, lower=True)
