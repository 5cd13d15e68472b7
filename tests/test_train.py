"""Reverse-mode AD through the adaptive solver + parameter estimation.

The differentiability contract of the reference's training experiments
(/root/reference/experiments/old/neural_ode/train_ode.py:63-91,119-121):
gradients of the negative log-marginal likelihood w.r.t. vector-field
parameters, through the PI-adaptive loop, using the bounded while loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import control_flow, facade, train


def _data(a_true=1.4):
    def vf(u, *, t, p):
        return p * u * (1.0 - u)

    u0 = (jnp.asarray([0.2]),)
    save_at = jnp.linspace(0.0, 2.0, num=8)
    solve_true = facade.solve(
        "ts0-3", vf, u0[0], save_at, dt0=0.1, atol=1e-6, rtol=1e-6, calibrate="none"
    )
    with control_flow.overwrite_with_bounded(max_steps=128):
        y_true = jax.jit(lambda: solve_true(u0, a_true)[0])()
    return vf, u0, save_at, jnp.asarray(y_true)[:, 0], None


def test_gradient_through_adaptive_solver_is_finite_and_points_to_truth():
    vf, u0, save_at, y, _ = _data()
    solve = facade.solve(
        "ts0-3", vf, u0[0], save_at, dt0=0.1, atol=1e-5, rtol=1e-5, calibrate="none"
    )
    obs = train.Observations(ts=save_at, ys=y, noise_std=1e-3)
    loss_fn = train.nlml(solve, obs, u0=u0)

    with control_flow.overwrite_with_bounded(max_steps=128):
        l1, g1 = jax.jit(jax.value_and_grad(loss_fn))(jnp.asarray(1.0))
        l2, _g2 = jax.jit(jax.value_and_grad(loss_fn))(jnp.asarray(1.4))

    assert np.isfinite(float(l1)) and np.isfinite(float(g1))
    # truth (a=1.4) must have lower loss; gradient at a=1.0 points towards it
    assert float(l2) < float(l1)
    assert float(g1) < 0.0


@pytest.mark.slow
def test_optimization_recovers_parameter():
    optax = pytest.importorskip("optax")
    vf, u0, save_at, y, _ = _data()
    solve = facade.solve(
        "ts0-3", vf, u0[0], save_at, dt0=0.1, atol=1e-6, rtol=1e-6, calibrate="none"
    )
    obs = train.Observations(ts=save_at, ys=y, noise_std=1e-3)
    loss_fn = train.nlml(solve, obs, u0=u0)

    theta, losses = train.fit(
        loss_fn,
        jnp.asarray(0.8),
        optax.adam(0.1),
        num_steps=60,
        max_solver_steps=256,
    )
    assert abs(float(theta) - 1.4) < 0.05, (theta, losses[-5:])


def test_bounded_while_loop_matches_unbounded():
    def cond(c):
        return c[0] < 100.0

    def body(c):
        return (c[0] + c[1], c[1] * 1.1)

    init = (jnp.asarray(0.0), jnp.asarray(1.0))
    a = jax.lax.while_loop(cond, body, init)
    b = control_flow.bounded_while_loop(cond, body, init, max_steps=100)
    np.testing.assert_allclose(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1])
