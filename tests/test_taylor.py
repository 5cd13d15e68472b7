"""Taylor-mode initialization vs closed-form series (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import taylor


def _logistic_derivatives(u0, num):
    """Closed form: u = 1/(1+c e^-t); derivatives via exact recursion."""
    # d/dt u = u(1-u). Use autodiff-free sympy-like manual recursion in numpy
    # through the analytic solution instead: u(t) = 1 / (1 + c exp(-t)).
    import math

    c = (1 - u0) / u0
    eps = 1e-30

    def u(t):
        return 1.0 / (1.0 + c * np.exp(-t))

    # numerical high-order derivatives via central differences would be too
    # inaccurate; use the recursion u' = u(1-u) symbolically on polynomials
    # in u: represent each derivative as polynomial coefficients in u.
    polys = [np.array([0.0, 1.0])]  # u
    for _ in range(num):
        pk = polys[-1]
        # derivative: d/dt p(u) = p'(u) * u(1-u)
        dp = np.polynomial.polynomial.polyder(pk)
        prod = np.polynomial.polynomial.polymul(dp, np.array([0.0, 1.0, -1.0]))
        polys.append(prod)
    del math, u, eps
    return [np.polynomial.polynomial.polyval(u0, p) for p in polys]


@pytest.mark.parametrize("fn", [taylor.odejet_unroll, taylor.odejet_padded_scan])
@pytest.mark.parametrize("num", [1, 2, 4, 6])
def test_first_order_logistic(fn, num):
    def vf(u):
        return u * (1.0 - u)

    u0 = jnp.asarray([0.3])
    coeffs = fn(vf, (u0,), num=num)
    assert len(coeffs) == num + 1
    expected = _logistic_derivatives(0.3, num)
    for c, e in zip(coeffs, expected):
        np.testing.assert_allclose(np.asarray(c), [e], rtol=1e-9)


@pytest.mark.parametrize("fn", [taylor.odejet_unroll, taylor.odejet_padded_scan])
def test_second_order_harmonic_oscillator(fn):
    """u'' = -u with u0=1, du0=0  =>  derivatives cycle (1, 0, -1, 0, 1, ...)."""

    def vf(u, du):
        return -u

    u0 = jnp.asarray([1.0])
    du0 = jnp.asarray([0.0])
    coeffs = fn(vf, (u0, du0), num=5)
    assert len(coeffs) == 7
    expected = [1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0]
    for c, e in zip(coeffs, expected):
        np.testing.assert_allclose(np.asarray(c), [e], atol=1e-12)


def test_variants_agree_multidim():
    def vf(u):
        return jnp.stack([u[1] * u[2], -u[0] * u[2], 0.5 * u[0] * u[1]])

    u0 = jnp.asarray([1.0, 0.1, 0.9])
    a = taylor.odejet_unroll(vf, (u0,), num=5)
    b = taylor.odejet_padded_scan(vf, (u0,), num=5)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-12)
