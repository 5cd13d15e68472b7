"""Parallel-in-time fixed-grid filtering via associative scan.

The backward (smoothing / sampling) passes are already associative scans
(``stats.markov_marginals(parallel=True)``); this module adds the FORWARD
filter pass for ``solve_fixed_grid``, after the parallel-in-time Kalman
filter of Särkkä & García-Fernández (and its orthogonal-transformation
refinement, arXiv:2502.11686; SURVEY.md §5 stretch goal).

Formulation.  With linearization points fixed, each solver step is an
affine-Gaussian filtering element

    a_k = (A_k, b_k, C_k, eta_k, J_k)

where p(x_k | x_{k-1}, z_k) = N(A_k x_{k-1} + b_k, C_k) and
p(z_k | x_{k-1}) carries the information pair (eta_k, J_k); elements combine
associatively, so a filter pass runs in O(log W) depth under
``jax.lax.associative_scan``.  Because the ODE "observation" is exact
(z = H x - v with zero measurement noise), S = H Q H^T is the local
innovation covariance and every element is prefix-independent.

Nonlinearity and windowing.  TS0/TS1 linearize at the running predicted
mean, which is sequential information; the pass therefore ITERATES:
linearize all steps of a segment at the previous sweep's predicted means
(one vmapped vector-field evaluation per sweep), run the associative
filter, repeat.  Iterating over the WHOLE horizon from a constant initial
trajectory diverges on long spans (the affine filter extrapolates the
linearization error), so the grid is processed in windows of ``window``
steps: sequential across windows, parallel + iterated within each window.
Sequential depth per solve is O(T/W · iterations · log W) instead of O(T).
At convergence the window recursion satisfies exactly the sequential
recursion l_k = Phi_k m_{k-1}, so results equal the sequential filter to
floating-point reassociation error (tested within sqrt-eps).

Numerics.  Elements are combined in covariance (not square-root) form:
J-blocks scale like Q(dt)^{-1} ~ dt^{-(2(nu-o)+1)}, so this pass wants
float64 (slow-but-correct on TPU); the sequential driver remains the
f32-friendly path.  A square-root (QR-element) variant is the natural
follow-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ivpsolvers as _solvers
from . import linalg, prior
from .ssm.base import MarkovSeq, Normal


def _solve_qr(t, b):
    """Solve ``t x = b`` via Householder QR + unrolled back-substitution.

    TPU lowers ``jnp.linalg.solve`` through LuDecomposition, which is
    f32-only on that backend; this path uses only jnp primitives (the
    dimensions here are small and static, so the unrolled loops are cheap).
    """
    m = t.shape[-1]
    aug = jnp.concatenate([t, b], axis=-1)
    r = linalg.qr_r(aug)  # rows sign-normalized consistently: R x = Q^T b
    rr, qb = r[..., :m], r[..., m:]
    rows = [None] * m
    for i in reversed(range(m)):
        acc = qb[i]
        for j in range(i + 1, m):
            acc = acc - rr[i, j] * rows[j]
        rows[i] = acc / rr[i, i]
    return jnp.stack(rows, axis=0)


def _cholesky_small(c):
    """Unrolled lower Cholesky for small PSD matrices, batched over leading
    axes (TPU's CholeskyDecomposition custom call is f32-only; the caller
    adds a jitter, so pivots stay positive)."""
    m = c.shape[-1]
    cols = []
    l_rows = [[None] * m for _ in range(m)]
    for j in range(m):
        s = c[..., j, j]
        for k in range(j):
            s = s - l_rows[j][k] * l_rows[j][k]
        d = jnp.sqrt(jnp.maximum(s, jnp.zeros_like(s)))
        d_safe = jnp.where(d > 0, d, jnp.ones_like(d))
        col = [jnp.zeros_like(d)] * j + [d]
        l_rows[j][j] = d
        for i in range(j + 1, m):
            s_ij = c[..., i, j]
            for k in range(j):
                s_ij = s_ij - l_rows[i][k] * l_rows[j][k]
            lij = jnp.where(d > 0, s_ij / d_safe, jnp.zeros_like(s_ij))
            l_rows[i][j] = lij
            col.append(lij)
        cols.append(jnp.stack(col, axis=-1))
    return jnp.stack(cols, axis=-1)


def _combine(e_i, e_j):
    """Associative combination of filtering elements (earlier i, later j)."""
    a_i, b_i, c_i, eta_i, j_i = e_i
    a_j, b_j, c_j, eta_j, j_j = e_j
    m = a_i.shape[-1]
    eye = jnp.eye(m, dtype=a_i.dtype)
    t = eye + c_i @ j_j  # (I + C_i J_j); (I + J_j C_i) = t^T for symmetric C, J
    a = a_j @ _solve_qr(t, a_i)
    b = a_j @ _solve_qr(t, b_i + c_i @ eta_j) + b_j
    c = a_j @ _solve_qr(t, c_i) @ a_j.T + c_j
    eta = a_i.T @ _solve_qr(t.T, eta_j - j_j @ b_i) + eta_i
    j = a_i.T @ _solve_qr(t.T, j_j @ a_i) + j_i
    return (a, b, 0.5 * (c + c.T), eta, 0.5 * (j + j.T))


def _element(phi, q, h, v):
    """Filtering element of one step: transition x_k = Phi x_{k-1} + w,
    w ~ N(0, Q), conditioned on the exact observation H x_k = v."""
    s = h @ q @ h.T  # innovation covariance (r, r)
    k_gain = _solve_qr(s, h @ q).T  # (m, r)
    i_kh = jnp.eye(phi.shape[-1], dtype=phi.dtype) - k_gain @ h
    a = i_kh @ phi
    b = k_gain @ v
    c = i_kh @ q @ i_kh.T  # exact observation: (I-KH) Q (I-KH)^T
    eta = phi.T @ h.T @ _solve_qr(s, v)
    j = phi.T @ h.T @ _solve_qr(s, h @ phi)
    return (a, b, 0.5 * (c + c.T), eta, 0.5 * (j + j.T))


def _identity_element(m_dim, c_dim, dtype):
    """Neutral element (used to pad the last window): x_k = x_{k-1}."""
    eye = jnp.eye(m_dim, dtype=dtype)
    zmm = jnp.zeros((m_dim, m_dim), dtype)
    zmc = jnp.zeros((m_dim, c_dim), dtype)
    return (eye, zmc, zmm, zmc, zmm)


def _adapters(ssm):
    """Backend adapter: materialize (Phi, Q, H, v) matrices per step and map
    between the ssm mean format and (m, c) column form."""
    nu = ssm.num_derivatives
    d, n = ssm.d, ssm.n

    if ssm.name == "isotropic":
        # state matrix acts on the derivative axis; d columns ride along
        # (blockdiag carries per-dimension covariance factors -- not yet
        # mapped onto the shared-(n,n) element layout here)
        def materialize(dt, scale, jacs, o):
            del jacs
            phi = prior.phi_direct(dt, nu)
            p, _ = prior.preconditioner(dt, nu)
            _, l_q = prior.system_matrices(nu, dt.dtype)
            qc = scale * (p[:, None] * l_q)
            h = jax.nn.one_hot(o, n, dtype=dt.dtype)[None, :]  # (1, n)
            return phi, qc @ qc.T, h

        def to_cols(mean):  # (n, d) -> (n, d)
            return mean

        def from_cols(b):
            return b

        m_dim, c_dim = n, d
    elif ssm.name == "dense":
        eye_d = jnp.eye(d)

        def materialize(dt, scale, jacs, o):
            phi_n = prior.phi_direct(dt, nu)
            p, _ = prior.preconditioner(dt, nu)
            _, l_q = prior.system_matrices(nu, dt.dtype)
            phi = jnp.kron(phi_n, eye_d.astype(dt.dtype))
            qc = jnp.kron(scale * (p[:, None] * l_q), eye_d.astype(dt.dtype))
            h = jnp.zeros((d, n * d), dt.dtype)
            h = h.at[:, o * d : (o + 1) * d].set(eye_d.astype(dt.dtype))
            for k, jac in enumerate(jacs):
                h = h.at[:, k * d : (k + 1) * d].add(-jac)
            return phi, qc @ qc.T, h

        def to_cols(mean):  # (nd,) -> (nd, 1)
            return mean[:, None]

        def from_cols(b):
            return b[:, 0]

        m_dim, c_dim = n * d, 1
    else:
        raise NotImplementedError(ssm.name)
    return materialize, to_cols, from_cols, m_dim, c_dim


def solve_fixed_grid_parallel(
    vf, init, *, grid, solver, iterations=8, window=16
):
    """Fixed-grid filter solve, parallel-in-time within windows.

    Same semantics as ``ivpsolve.solve_fixed_grid`` with the filter strategy
    (calibration "none" or "dynamic"); returns the same Solution layout
    (posterior without backward conditionals).  See the module docstring for
    the windowed iterated-linearization scheme; ``window`` steps run as one
    associative scan, ``iterations`` sweeps per window re-linearize.
    """
    # TPU matmul passes at default precision corrupt the element combines
    # (observed: NaN on-chip, bit-clean on CPU); force exact accumulation
    with jax.default_matmul_precision("highest"):
        return _solve_fixed_grid_parallel(
            vf, init, grid=grid, solver=solver, iterations=iterations,
            window=window,
        )


def _solve_fixed_grid_parallel(vf, init, *, grid, solver, iterations, window):
    from .ivpsolve import Solution, _validate_increasing

    ssm = solver.ssm
    strategy = solver.strategy
    corr = strategy.correction
    if strategy.needs_reversal:
        raise NotImplementedError("parallel fixed-grid supports the filter strategy")
    if solver.calibration == _solvers.MLE:
        raise NotImplementedError("mle calibration is post-hoc; use none/dynamic")
    rv0, scale0 = init
    dtype = rv0.mean.dtype
    _validate_increasing(grid, "grid")
    grid = jnp.asarray(grid, dtype)

    o = corr.ode_order
    materialize, to_cols, from_cols, m_dim, c_dim = _adapters(ssm)
    ts, dts = grid[1:], jnp.diff(grid)
    t1 = len(ts)
    w = max(1, min(window, t1))
    pad = (-t1) % w
    ts_p = jnp.concatenate([ts, jnp.full((pad,), ts[-1], dtype)])
    dts_p = jnp.concatenate([dts, jnp.full((pad,), dts[-1], dtype)])
    valid = jnp.concatenate(
        [jnp.ones((t1,), bool), jnp.zeros((pad,), bool)]
    )
    num_w = (t1 + pad) // w
    ts_w = ts_p.reshape(num_w, w)
    dts_w = dts_p.reshape(num_w, w)
    valid_w = valid.reshape(num_w, w)

    # covariance-form floor: J ~ 1/(scale^2 dt^(2(nu-o)+1)) must not overflow
    # through combinations.  The sqrt sequential path can clamp sigma at
    # tiny^0.5, but here a (first-sweep) zero residual with that floor makes
    # J ~ 1e169 and element products diverge; floor at eps relative to the
    # base output scale instead (no effect once sigma is physical).
    tiny = jnp.asarray(jnp.finfo(dtype).eps, dtype) * jnp.maximum(
        jnp.abs(ssm.promote_output_scale(scale0)).astype(dtype), 1.0
    )
    scale_none = ssm.promote_output_scale(scale0).astype(dtype)
    ident = _identity_element(m_dim, c_dim, dtype)
    eye_m = jnp.eye(m_dim, dtype=dtype)

    def _z_cols(z):
        # residual in the element's (r, c) observation-value layout
        return z[:, None] if c_dim == 1 else z[None, :]

    def element_one(lin, t, dt, ok):
        _, cache = ssm.extrapolate_mean(lin, dt)  # only the cache (p, p_inv)
        z, jacs = _solvers.linearize(strategy, vf, lin, t)
        sigma, _err = _solvers.error_and_scale(strategy, z, jacs, cache)
        if solver.calibration == _solvers.DYNAMIC:
            scale = jnp.maximum(sigma, tiny)
        else:
            scale = scale_none
        phi, q, h = materialize(dt, scale, jacs, o)
        v = h @ to_cols(lin) - _z_cols(z)  # exact observation H x_k = v
        el = _element(phi, q, h, v)
        el = jax.tree.map(lambda x, i: jnp.where(ok, x, i), el, ident)
        return el, jnp.where(ok, scale, scale_none), sigma

    def marginal_from_prefix(prefix, m0c, p0):
        """p(x_k | z_{1:k}) for a window-start state N(m0, P0): pull the
        prefix's information pair back to x_0, then push through (A, b, C)."""
        a, b, c, eta, j = prefix
        # gain = P0 (I + J P0)^{-1}, via the transposed system (f64-safe QR)
        gain = _solve_qr((eye_m + j @ p0).T, p0.T).T
        m0_upd = m0c + gain @ (eta - j @ m0c)
        p0_upd = p0 - gain @ j @ p0
        mean = a @ m0_upd + b
        cov = a @ p0_upd @ a.T + c
        return mean, 0.5 * (cov + cov.T)

    def window_step(carry, inputs):
        m0c, p0 = carry
        ts_k, dts_k, ok_k = inputs

        def sweep(lin, _):
            els, scales, _sigmas = jax.vmap(element_one)(lin, ts_k, dts_k, ok_k)
            prefix = jax.lax.associative_scan(
                lambda e_i, e_j: jax.vmap(_combine)(e_i, e_j), els
            )
            means_c, covs = jax.vmap(
                lambda pk: marginal_from_prefix(pk, m0c, p0)
            )(prefix)
            means = jax.vmap(from_cols)(means_c)
            # next linearization: l_k = Phi_k m_{k-1}, m_0 = window start
            m_prev = jnp.concatenate([from_cols(m0c)[None], means[:-1]])
            lin_next = jax.vmap(lambda mm, dd: ssm.extrapolate_mean(mm, dd)[0])(
                m_prev, dts_k
            )
            return lin_next, (means, covs, scales)

        # constant initial trajectory at the window-start mean: short windows
        # keep the iteration inside its contraction region
        lin0 = jnp.broadcast_to(
            from_cols(m0c), (w,) + rv0.mean.shape
        )
        lin_fin, _ = jax.lax.scan(sweep, lin0, None, length=max(iterations - 1, 1))
        _, (means, covs, scales) = sweep(lin_fin, None)
        # identity padding makes the last prefix equal the last VALID state
        m_end = to_cols(means[-1])
        p_end = covs[-1]
        return (m_end, p_end), (means, covs, scales)

    # isotropic cholesky is (n, n) shared across d columns; dense is (nd, nd)
    p0_init = rv0.cholesky @ rv0.cholesky.T
    _, (means_w, covs_w, scales_w) = jax.lax.scan(
        window_step, (to_cols(rv0.mean), p0_init), (ts_w, dts_w, valid_w)
    )
    means = means_w.reshape((num_w * w,) + rv0.mean.shape)[:t1]
    covs = covs_w.reshape(num_w * w, m_dim, m_dim)[:t1]
    scales = scales_w.reshape(num_w * w)[:t1]

    eps = jnp.finfo(dtype).eps
    jitter = eps * jnp.maximum(jnp.trace(covs, axis1=-2, axis2=-1), 1.0)
    chol_cols = _cholesky_small(
        covs + jitter[:, None, None] * jnp.eye(m_dim, dtype=dtype)
    )
    rvs_rest = Normal(means, chol_cols)
    rvs = jax.tree.map(
        lambda f, r: jnp.concatenate([f[None], r]), rv0, rvs_rest
    )
    scales_full = jnp.concatenate([scale_none[None], scales])

    return Solution(
        t=grid,
        u=ssm.qoi(rvs.mean),
        u_std=ssm.qoi_std(rvs),
        output_scale=scales_full,
        marginals=None,
        posterior=MarkovSeq(rvs, None, ssm=ssm),
        num_steps=jnp.arange(len(grid), dtype=jnp.int32),
        ssm=ssm,
    )
