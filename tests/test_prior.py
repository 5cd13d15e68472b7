"""The preconditioned IBM discretization must equal the textbook (Phi, Q)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import prior


def _phi_q_direct(nu, dt):
    n = nu + 1
    phi = np.zeros((n, n))
    q = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            phi[i, j] = dt ** (j - i) / math.factorial(j - i)
    for i in range(n):
        for j in range(n):
            k = 2 * nu + 1 - i - j
            q[i, j] = dt**k / (k * math.factorial(nu - i) * math.factorial(nu - j))
    return phi, q


@pytest.mark.parametrize("nu", [1, 2, 4, 8])
@pytest.mark.parametrize("dt", [0.1, 1.0, 1e-4])
def test_preconditioned_system_equals_direct_discretization(nu, dt):
    a, l_q = prior.system_matrices(nu, jnp.float64)
    p, p_inv = prior.preconditioner(jnp.asarray(dt, jnp.float64), nu)
    phi_direct, q_direct = _phi_q_direct(nu, dt)

    phi = np.diag(p) @ np.asarray(a) @ np.diag(p_inv)
    np.testing.assert_allclose(phi, phi_direct, rtol=1e-10, atol=1e-12)

    q_bar = np.asarray(l_q) @ np.asarray(l_q).T
    q = np.diag(p) @ q_bar @ np.diag(p)
    np.testing.assert_allclose(q, q_direct, rtol=1e-7, atol=1e-20)


def test_preconditioner_inverse():
    p, p_inv = prior.preconditioner(jnp.asarray(0.03), 4)
    np.testing.assert_allclose(p * p_inv, np.ones(5), rtol=1e-12)
