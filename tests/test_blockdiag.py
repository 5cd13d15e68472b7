"""Blockdiag backend: agreement with the isotropic backend + per-dim scales."""

import jax
import jax.numpy as jnp
import numpy as np

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor


def _solve(impl, tol=1e-7, nu=3, kind="fixedpoint"):
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(3,), implementation=impl
    )
    strat = {
        "filter": ivpsolvers.strategy_filter,
        "fixedpoint": ivpsolvers.strategy_fixedpoint,
    }[kind](prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, output_scale=1.0)
    asolver = ivpsolve.adaptive(solver, atol=tol, rtol=tol)
    save_at = jnp.linspace(*tspan, num=6)
    sol = jax.jit(
        lambda: ivpsolve.solve_adaptive_save_at(
            vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
        )
    )()
    return sol


def test_blockdiag_matches_isotropic_solution():
    sol_bd = _solve("blockdiag")
    sol_iso = _solve("isotropic")
    np.testing.assert_allclose(
        np.asarray(sol_bd.u), np.asarray(sol_iso.u), rtol=1e-4, atol=1e-7
    )
    # per-dimension output scales
    assert sol_bd.output_scale.shape[-1] == 3


def test_blockdiag_marginals_and_sampling_and_lml():
    sol = _solve("blockdiag")
    seq = stats.markov_select_terminal(sol.posterior)
    margs = stats.markov_marginals(seq)
    mean = jnp.concatenate([margs.mean, sol.posterior.init.mean[None, -1]])
    qoi = jax.vmap(sol.ssm.qoi)(mean)
    np.testing.assert_allclose(np.asarray(qoi), np.asarray(sol.u), rtol=1e-3, atol=1e-5)

    (qs, _), (q_term, _) = stats.markov_sample(
        jax.random.PRNGKey(0), seq, shape=(500,), reverse=True
    )
    full = jnp.concatenate([qs, q_term[:, None, :]], axis=-2)
    np.testing.assert_allclose(
        np.asarray(full.mean(axis=0)), np.asarray(qoi), atol=5e-3
    )

    ll = stats.log_marginal_likelihood(
        sol.u, standard_deviation=1e-2 * jnp.ones(6), posterior=sol.posterior
    )
    assert np.isfinite(float(ll))
