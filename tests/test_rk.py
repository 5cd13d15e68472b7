"""Native RK baselines: convergence order + accuracy vs closed form/scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import problems, rk


@pytest.mark.parametrize("method", ["bosh3", "tsit5", "dopri5", "dopri8"])
def test_rk_accuracy_logistic(method):
    vf, (u0,), tspan, params = problems.logistic()
    save_at = jnp.linspace(*tspan, num=5)
    ys, nsteps = jax.jit(
        lambda: rk.solve_rk_save_at(
            method, vf, u0, save_at=save_at, dt0=0.1, atol=1e-10, rtol=1e-10,
            params=params,
        )
    )()

    def exact(ts, u0=0.1):
        c = (1 - u0) / u0
        return 1.0 / (1.0 + c * np.exp(-np.asarray(ts)))

    np.testing.assert_allclose(np.asarray(ys)[:, 0], exact(save_at), rtol=1e-8)
    assert int(nsteps) > 0


@pytest.mark.parametrize(
    "method,order", [("bosh3", 3), ("tsit5", 5), ("dopri5", 5), ("dopri8", 8)]
)
def test_rk_convergence_order(method, order):
    """Error must scale ~ tol across a tolerance sweep (validates tableaus)."""
    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.asarray(tspan)

    def err_at(tol):
        ys, _ = rk.solve_rk_save_at(
            method, vf, u0, save_at=save_at, dt0=0.1, atol=tol, rtol=tol,
            params=params,
        )
        ys_ref, _ = rk.solve_rk_save_at(
            "dopri5", vf, u0, save_at=save_at, dt0=0.1, atol=1e-13, rtol=1e-13,
            params=params,
        )
        return float(jnp.max(jnp.abs(ys[-1] - ys_ref[-1])))

    e_loose = err_at(1e-4)
    e_tight = err_at(1e-8)
    assert e_tight < e_loose
    assert e_tight < 1e-6


def test_rk_fixed_step_order_check():
    """Richardson-style order verification on a smooth nonlinear problem.

    Integrates with forced small fixed steps by setting factor bounds tight;
    instead we check global error reduction when tolerance drops 100x matches
    at least order/(order+1) scaling in work.
    """
    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.asarray(tspan)
    _, n1 = rk.solve_rk_save_at(
        "tsit5", vf, u0, save_at=save_at, dt0=0.1, atol=1e-6, rtol=1e-6, params=params
    )
    _, n2 = rk.solve_rk_save_at(
        "tsit5", vf, u0, save_at=save_at, dt0=0.1, atol=1e-10, rtol=1e-10, params=params
    )
    # 5th-order: 1e4 tolerance drop ~ 10^(4/5) ~ 6.3x steps; allow loose bounds
    ratio = int(n2) / max(int(n1), 1)
    assert 2.0 < ratio < 25.0
