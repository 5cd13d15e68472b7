"""The error_unit knob: residual mode must over-resolve relative to qoi mode."""

import jax
import jax.numpy as jnp
import numpy as np

from odecheckpts_tpu import facade, problems


def _steps(error_unit, tol=1e-5):
    vf, u0, tspan, params = problems.logistic()
    save_at = jnp.linspace(*tspan, num=5)
    fun = facade.solve(
        "ts0-3", vf, u0[0], save_at, dt0=0.1, atol=1e-3 * tol, rtol=tol,
        error_unit=error_unit,
    )
    u, aux = jax.jit(lambda: fun(u0, params))()
    return np.asarray(u), int(aux["solution"].num_steps[-1])


def test_residual_mode_takes_more_steps_and_agrees():
    u_q, n_q = _steps("qoi")
    u_r, n_r = _steps("residual")
    assert n_r > n_q  # u^(o)-unit errors are the conservative choice
    np.testing.assert_allclose(u_q, u_r, rtol=1e-3, atol=1e-6)

    def exact(ts, u0=0.1):
        c = (1 - u0) / u0
        return 1.0 / (1.0 + c * np.exp(-np.asarray(ts)))

    save_at = np.linspace(0.0, 2.5, 5)
    np.testing.assert_allclose(u_r[:, 0], exact(save_at), rtol=1e-4)
