"""Unit tests of the square-root algebra against naive covariance arithmetic.

These are the tests the reference lacks (SURVEY.md section 4: "add unit tests
of sqrt-Kalman algebra ... in float64").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import linalg


@pytest.mark.parametrize("shape", [(5, 3), (3, 3), (10, 8), (40, 30), (64, 50)])
def test_qr_r_reproduces_gram_matrix(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    r = linalg.qr_r(x)
    assert r.shape == (shape[1], shape[1])
    np.testing.assert_allclose(r.T @ r, x.T @ x, rtol=1e-10, atol=1e-10)
    # upper-triangular with non-negative diagonal (uniqueness)
    np.testing.assert_allclose(r, jnp.triu(r), atol=1e-12)
    assert jnp.all(jnp.diagonal(r) >= 0)


def test_qr_r_batched_matches_loop():
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 6, 4))
    r_batched = jax.vmap(linalg.qr_r)(x)
    for i in range(7):
        np.testing.assert_allclose(r_batched[i], linalg.qr_r(x[i]), atol=1e-12)


def test_chol_from_stack():
    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (6, 4))
    b = jax.random.normal(jax.random.PRNGKey(3), (4, 4))
    l = linalg.chol_from_stack(a, b)
    np.testing.assert_allclose(l @ l.T, a.T @ a + b.T @ b, atol=1e-10)
    np.testing.assert_allclose(l, jnp.tril(l), atol=1e-12)


def test_revert_markov_matches_dense_formulas():
    n = 4
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(4), 4)
    l_prev = jnp.tril(jax.random.normal(k1, (n, n))) + 3 * jnp.eye(n)
    a = jax.random.normal(k2, (n, n))
    l_q = jnp.tril(jax.random.normal(k3, (n, n))) + 2 * jnp.eye(n)

    l_pred, gain, l_bwd = linalg.revert_markov(a @ l_prev, l_q, l_prev)

    sigma = l_prev @ l_prev.T
    q = l_q @ l_q.T
    s_pred = a @ sigma @ a.T + q
    np.testing.assert_allclose(l_pred @ l_pred.T, s_pred, atol=1e-9)
    gain_expected = sigma @ a.T @ np.linalg.inv(s_pred)
    np.testing.assert_allclose(gain, gain_expected, atol=1e-9)
    cov_bwd_expected = sigma - gain_expected @ s_pred @ gain_expected.T
    np.testing.assert_allclose(l_bwd @ l_bwd.T, cov_bwd_expected, atol=1e-9)


@pytest.mark.parametrize("noisy", [False, True])
def test_revert_observation_matches_dense_formulas(noisy):
    n, m = 6, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    l_prev = jnp.tril(jax.random.normal(k1, (n, n))) + 3 * jnp.eye(n)
    h = jax.random.normal(k2, (m, n))
    l_noise = 0.5 * jnp.eye(m) if noisy else None

    l_obs, gain, l_cor = linalg.revert_observation(l_prev, h @ l_prev, l_noise)

    sigma = l_prev @ l_prev.T
    s = h @ sigma @ h.T + (0.25 * np.eye(m) if noisy else 0.0)
    np.testing.assert_allclose(l_obs @ l_obs.T, s, atol=1e-9)
    gain_expected = sigma @ h.T @ np.linalg.inv(s)
    np.testing.assert_allclose(gain, gain_expected, atol=1e-9)
    cov_cor = sigma - gain_expected @ s @ gain_expected.T
    np.testing.assert_allclose(l_cor @ l_cor.T, cov_cor, atol=1e-9)
    assert l_cor.shape == (n, n)


def test_qr_r_grad_defined():
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 4))
    g = jax.grad(lambda m: jnp.sum(linalg.qr_r(m) ** 2))(x)
    assert jnp.all(jnp.isfinite(g))


def test_qr_r_dense_revert_shape_uses_loop_householder():
    """(2nd, 2nd) = (80, 80) at d=8, nu=4 — the dense backend's revert QR.
    Round 4 measured XLA's blocked QR 9.4x slower than the elementwise
    Householder at this shape (data_dense_mxu.json); qr_r now routes it
    through the fori_loop Householder.  Gate: same Gram matrix and same
    |R| as XLA's QR."""
    x = jax.random.normal(jax.random.PRNGKey(7), (80, 80))
    r = linalg.qr_r(x)
    assert r.shape == (80, 80)
    np.testing.assert_allclose(r.T @ r, x.T @ x, rtol=5e-10, atol=5e-10)
    np.testing.assert_allclose(r, jnp.triu(r), atol=1e-10)
    r_xla = np.asarray(jnp.linalg.qr(x, mode="r"))
    np.testing.assert_allclose(np.abs(r), np.abs(r_xla), rtol=1e-8, atol=1e-8)


def test_qr_r_loop_matches_unrolled():
    """The fori_loop body performs the identical reflection arithmetic; XLA
    fuses the two programs differently so agreement is to rounding (~1e-15),
    not bitwise.  (Cross-stack determinism is unaffected: any given shape
    routes through exactly one variant.)"""
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 30, 28))
    r_unrolled = jax.vmap(linalg._qr_r_householder)(x)
    r_loop = jax.vmap(linalg._qr_r_householder_loop)(x)
    np.testing.assert_allclose(
        np.asarray(r_unrolled), np.asarray(r_loop), rtol=1e-13, atol=1e-13
    )


def test_qr_r_pow2_rescale_is_identity_in_safe_band():
    """Inside the safe exponent band the rescale factor is exactly 1, so
    qr_r is bit-identical to the raw Householder elimination (this is the
    round-5 contract that keeps generic and fused accept/reject decisions
    in exact agreement)."""
    x = jax.random.normal(jax.random.PRNGKey(9), (10, 5))
    np.testing.assert_array_equal(
        np.asarray(linalg.qr_r(x)),
        np.asarray(linalg.qr_r(x * 1.0)),
    )
    raw = linalg._qr_r_householder(x)
    d = jnp.where(jnp.diagonal(raw) >= 0, 1.0, -1.0)
    np.testing.assert_array_equal(
        np.asarray(linalg.qr_r(x)), np.asarray(raw * d[:, None])
    )


def test_qr_r_magnitude_normalized_f32():
    """Stiff f32 factors legitimately reach ~1e22 (preconditioner powers at
    dt ~ 1e-5); the Householder column norm SQUARES entries, so without the
    scale-invariant normalization the QR overflows to inf/NaN (round 4:
    this is what NaN'd the generic-path VdP mu=1e3 f32 solve that the fused
    engines' per-lane normalization already survived)."""
    x64 = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", False)
    try:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(10, 5)) * 1e22, jnp.float32
        )
        r = linalg.qr_r(x)
        assert r.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(r)))
        # scale-invariance: R(x) == 1e22 * R(x / 1e22)
        r_small = linalg.qr_r(x / 1e22)
        np.testing.assert_allclose(
            np.asarray(r) / 1e22, np.asarray(r_small), rtol=1e-5, atol=1e-5
        )
    finally:
        jax.config.update("jax_enable_x64", x64)
