"""Posterior statistics: sampling, likelihoods, uncertainty calibration."""

import jax
import jax.numpy as jnp
import numpy as np

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor


def _setup_fixedpoint(num_save=6, tol=1e-7, nu=3):
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(1,))
    strat = ivpsolvers.strategy_fixedpoint(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, output_scale=1.0)
    asolver = ivpsolve.adaptive(solver, atol=tol, rtol=tol)
    save_at = jnp.linspace(*tspan, num=num_save)
    sol = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )
    return sol, save_at


def test_markov_sample_mean_converges_to_marginal_means():
    sol, save_at = _setup_fixedpoint()
    seq = stats.markov_select_terminal(sol.posterior)
    key = jax.random.PRNGKey(0)
    (qoi, samples), (qoi_term, _) = stats.markov_sample(
        key, seq, shape=(4000,), reverse=True
    )
    assert qoi.shape == (4000, len(save_at) - 1, 1)
    assert qoi_term.shape == (4000, 1)
    full = jnp.concatenate([qoi, qoi_term[:, None, :]], axis=-2)

    margs = stats.markov_marginals(seq)
    mean_expected = jnp.concatenate(
        [margs.mean, sol.posterior.init.mean[None, -1]]
    )[:, 0, :]
    sample_mean = full.mean(axis=0)
    np.testing.assert_allclose(sample_mean, mean_expected, atol=2e-4)


def test_log_marginal_likelihood_finite_and_peaks_at_truth():
    sol, save_at = _setup_fixedpoint()
    u_true = np.asarray(sol.u)

    def lml(shift):
        data = jnp.asarray(u_true) + shift
        return stats.log_marginal_likelihood(
            data, standard_deviation=1e-2 * jnp.ones(len(save_at)), posterior=sol.posterior
        )

    l0 = float(lml(0.0))
    l1 = float(lml(0.05))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l0 > l1  # likelihood decreases away from the posterior mean


def test_log_marginal_likelihood_differentiable():
    sol, save_at = _setup_fixedpoint()
    u_true = jnp.asarray(sol.u)

    def loss(shift):
        return -stats.log_marginal_likelihood(
            u_true + shift,
            standard_deviation=1e-2 * jnp.ones(len(save_at)),
            posterior=sol.posterior,
        )

    g = jax.grad(loss)(0.01)
    assert np.isfinite(float(g))
    assert float(g) > 0.0


def test_uncertainty_calibration_covers_truth():
    """Posterior std must cover the actual error at moderate tolerance."""
    sol, save_at = _setup_fixedpoint(tol=1e-4)

    def exact(ts, u0=0.1):
        c = (1 - u0) / u0
        return 1.0 / (1.0 + c * np.exp(-np.asarray(ts)))

    err = np.abs(np.asarray(sol.u)[:, 0] - exact(save_at))
    std = np.asarray(sol.u_std)[:, 0]
    # errors should be within ~100x of the reported std (weak sanity check on
    # calibration; dynamic calibration is not exactly the MLE)
    assert np.all(err[1:] < 100 * std[1:] + 1e-12)
    assert np.all(std[1:] > 0)
