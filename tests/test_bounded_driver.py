"""The fully-jitted bounded save-every-step driver vs the eager reference."""

import jax
import jax.numpy as jnp
import numpy as np

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, taylor


def _setup(kind="smoother", nu=3, tol=1e-6):
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(1,))
    strat = {
        "filter": ivpsolvers.strategy_filter,
        "smoother": ivpsolvers.strategy_smoother,
    }[kind](prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=tol, rtol=tol)
    return vf_p, init, tspan, asolver


def test_bounded_matches_eager_save_every_step():
    vf_p, init, (t0, t1), asolver = _setup()
    sol_eager = ivpsolve.solve_adaptive_save_every_step(
        vf_p, init, t0=t0, t1=t1, dt0=0.1, adaptive_solver=asolver
    )
    (sol_bounded, (valid, _)) = jax.jit(
        lambda: ivpsolve.solve_adaptive_save_every_step_bounded(
            vf_p, init, t0=t0, t1=t1, dt0=0.1, adaptive_solver=asolver,
            max_steps=256,
        )
    )()
    n_eager = len(sol_eager.t)
    # bounded trace includes rejected iterations; valid marks accepted entries
    valid = np.asarray(valid)
    ts_b = np.asarray(sol_bounded.t)[valid]
    us_b = np.asarray(sol_bounded.u)[valid]
    # the eager driver additionally interpolates the terminal point; compare
    # the common accepted prefix
    n = min(n_eager - 1, len(ts_b))
    assert n > 10
    np.testing.assert_allclose(ts_b[:n], np.asarray(sol_eager.t)[:n], rtol=1e-8)
    np.testing.assert_allclose(us_b[:n], np.asarray(sol_eager.u)[:n], rtol=1e-6)


def test_compact_bounded_solution():
    vf_p, init, (t0, t1), asolver = _setup()
    (sol_b, (valid, _)) = ivpsolve.solve_adaptive_save_every_step_bounded(
        vf_p, init, t0=t0, t1=t1, dt0=0.1, adaptive_solver=asolver, max_steps=256
    )
    sol_c = ivpsolve.compact_bounded_solution(sol_b, valid)
    sol_e = ivpsolve.solve_adaptive_save_every_step(
        vf_p, init, t0=t0, t1=t1, dt0=0.1, adaptive_solver=asolver
    )
    n = min(len(sol_c.t), len(sol_e.t) - 1)
    np.testing.assert_allclose(
        np.asarray(sol_c.t)[:n], np.asarray(sol_e.t)[:n], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_c.u)[:n], np.asarray(sol_e.u)[:n], rtol=1e-6
    )
    # posterior stacks compacted consistently
    assert sol_c.posterior.init.mean.shape[0] == len(sol_c.t)
