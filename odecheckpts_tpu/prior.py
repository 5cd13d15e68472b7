"""Preconditioned integrated-Wiener-process ("IBM") prior discretization.

Capability parity with ``probdiffeq.ivpsolvers.prior_ibm`` (call sites:
/root/reference/src/odecheckpts/ivpsolvers.py:42,
/root/reference/experiments/1_van_der_pol/vdp.py:63).

The prior over the stacked state ``x = (u, u', ..., u^(nu))`` is a nu-times
integrated Wiener process.  Its exact one-step discretization over dt is

    x_{k+1} = Phi(dt) x_k + w,   w ~ N(0, s^2 Q(dt)),
    Phi_ij = dt^(j-i)/(j-i)!,    Q_ij = dt^(2nu+1-i-j) / ((2nu+1-i-j)
                                        * (nu-i)! * (nu-j)!).

Direct use of (Phi, Q) is catastrophically ill-conditioned for small dt and
large nu.  We therefore work in Taylor ("Nordsieck-like") coordinates with the
step-size preconditioner

    P(dt) = diag(p_i),   p_i = sqrt(dt) * dt^(nu-i) / (nu-i)!,

under which the transition becomes the *dt-independent* pair

    A_ij  = binom(nu-i, j-i)          (unit upper-triangular Pascal matrix),
    Qbar_ij = 1/(2nu+1-i-j)           (Hilbert-type, fixed),

i.e. ``Phi = P A P^{-1}`` and ``Q = P Qbar P``.  A and chol(Qbar) are computed
once per nu in float64 on the host and baked into the compiled program as
constants.  This is the robustness cornerstone that lets the solver run in
f32-first TPU arithmetic (SURVEY.md section 7, hard part #2).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np  # noqa: F401  (host-side constants)


@functools.lru_cache(maxsize=None)
def _ibm_constants_f64(num_derivatives: int):
    nu = num_derivatives
    n = nu + 1
    i = np.arange(n)
    a = np.zeros((n, n))
    for row in range(n):
        for col in range(row, n):
            a[row, col] = math.comb(nu - row, col - row)
    q = 1.0 / (2 * nu + 1 - i[:, None] - i[None, :])
    l_q = np.linalg.cholesky(q)
    factorials = np.array([math.factorial(nu - k) for k in range(n)], dtype=float)
    return a, l_q, factorials


def system_matrices(num_derivatives: int, dtype):
    """dt-independent (A, chol(Qbar)) of the preconditioned IBM transition."""
    a, l_q, _ = _ibm_constants_f64(num_derivatives)
    return jnp.asarray(a, dtype=dtype), jnp.asarray(l_q, dtype=dtype)


def phi_direct(dt, num_derivatives: int):
    """The unpreconditioned transition Phi(dt)_ij = dt^(j-i)/(j-i)!.

    Used for *interpolation* reversals: when the state covariance dwarfs the
    process noise of a short sub-interval, the preconditioned reversal
    amplifies roundoff by p_i/p_j (catastrophic in f32), while the direct form
    is well-scaled (all entries <= max(1, dt)^nu and no P^{-1} appears).
    """
    nu = num_derivatives
    n = nu + 1
    dt = jnp.asarray(dt)
    ones = jnp.ones((n,), dtype=dt.dtype)
    powers = jnp.cumprod(jnp.where(jnp.arange(n) == 0, 1.0, dt) * ones)  # dt^k
    i = np.arange(n)
    k = i[None, :] - i[:, None]  # j - i
    mask = (k >= 0).astype(float)
    inv_fact = np.zeros((n, n))
    for r in range(n):
        for c in range(r, n):
            inv_fact[r, c] = 1.0 / math.factorial(c - r)
    coeff = jnp.asarray(mask * inv_fact, dtype=dt.dtype)
    return coeff * powers[jnp.clip(jnp.asarray(k), 0, nu)]


def preconditioner(dt, num_derivatives: int):
    """Scaling vectors (p, 1/p) with p_i = sqrt(dt) dt^(nu-i)/(nu-i)!.

    ``dt`` may be a traced scalar; powers are computed via cumulative products
    of static length, so no transcendental calls appear in the hot loop.
    """
    nu = num_derivatives
    _, _, factorials = _ibm_constants_f64(nu)
    dt = jnp.asarray(dt)
    # powers dt^(nu-i) for i=0..nu, i.e. [dt^nu, ..., dt, 1]:
    # cumprod([1, dt, ..., dt]) = [1, dt, ..., dt^nu], then reverse.
    ones = jnp.ones((nu + 1,), dtype=dt.dtype)
    powers = jnp.cumprod(jnp.where(jnp.arange(nu + 1) == 0, 1.0, dt) * ones)[::-1]
    scales = jnp.asarray(1.0 / factorials, dtype=dt.dtype)
    sqrt_dt = jnp.sqrt(dt)
    p = sqrt_dt * powers * scales
    return p, 1.0 / p
