"""Parallel-in-time (associative-scan) backward pass vs sequential scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor


@pytest.mark.parametrize(
    "impl", ["isotropic", pytest.param("dense", marks=pytest.mark.slow)]
)
def test_parallel_marginals_match_sequential(impl):
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(3,), implementation=impl
    )
    strat = ivpsolvers.strategy_fixedpoint(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-6, rtol=1e-6)
    save_at = jnp.linspace(*tspan, num=17)
    sol = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )
    seq = stats.markov_select_terminal(sol.posterior)
    m_seq = stats.markov_marginals(seq)
    m_par = stats.markov_marginals(seq, parallel=True)
    np.testing.assert_allclose(
        np.asarray(m_par.mean), np.asarray(m_seq.mean), rtol=1e-8, atol=1e-10
    )
    # covariances agree as gram matrices (factors differ by orthogonal maps)
    cov_seq = np.einsum("...ij,...kj->...ik", np.asarray(m_seq.cholesky), np.asarray(m_seq.cholesky))
    cov_par = np.einsum("...ij,...kj->...ik", np.asarray(m_par.cholesky), np.asarray(m_par.cholesky))
    np.testing.assert_allclose(cov_par, cov_seq, rtol=1e-6, atol=1e-12)


def test_parallel_sampling_matches_sequential():
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_fixedpoint(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-7, rtol=1e-7)
    save_at = jnp.linspace(*tspan, num=17)
    sol = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )
    seq = stats.markov_select_terminal(sol.posterior)
    key = jax.random.PRNGKey(3)
    (q_seq, s_seq), (qt_seq, _) = stats.markov_sample(key, seq, shape=(4,))
    (q_par, s_par), (qt_par, _) = stats.markov_sample(
        key, seq, shape=(4,), parallel=True
    )
    np.testing.assert_allclose(np.asarray(qt_par), np.asarray(qt_seq), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(q_par), np.asarray(q_seq), rtol=1e-6, atol=1e-9
    )
