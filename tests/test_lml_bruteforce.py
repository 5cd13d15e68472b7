"""log_marginal_likelihood vs a brute-force dense joint-Gaussian computation.

The sqrt backward Kalman pass (observe -> condition -> marginalize along the
MarkovSeq) must equal the textbook multivariate-normal log-density of the
observations under the full joint posterior -- computable directly in numpy
for a small number of checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor


def _dense_joint(seq, n, d, num):
    """Joint mean/cov of the stacked states (x_0, ..., x_{N-1}), numpy."""
    # terminal
    m_T = np.asarray(seq.init.mean).reshape(n * d, order="C")  # iso: (n, d)
    l_T = np.kron(np.asarray(seq.init.cholesky), np.eye(d))
    cov_T = l_T @ l_T.T

    means = [m_T]
    covs = {(num - 1, num - 1): cov_T}
    # build backwards: x_{k-1} = G_k x_k + b_k + noise_k
    for k in reversed(range(num - 1)):
        g = np.kron(np.asarray(seq.conditional.matrix[k]), np.eye(d))
        b = np.asarray(seq.conditional.noise.mean[k]).reshape(n * d)
        l_n = np.kron(np.asarray(seq.conditional.noise.cholesky[k]), np.eye(d))
        means.insert(0, g @ means[0] + b)
        # covariances with all later states
        covs[(k, k)] = g @ covs[(k + 1, k + 1)] @ g.T + l_n @ l_n.T
        for j in range(k + 1, num):
            covs[(k, j)] = g @ covs[(k + 1, j)]
            covs[(j, k)] = covs[(k, j)].T
    mean = np.concatenate(means)
    cov = np.block([[covs[(i, j)] for j in range(num)] for i in range(num)])
    return mean, cov


def test_lml_matches_dense_joint_gaussian():
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu, d, num = 2, 1, 5
    n = nu + 1
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(d,))
    strat = ivpsolvers.strategy_fixedpoint(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tco = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tco, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-6, rtol=1e-6)
    save_at = jnp.linspace(*tspan, num=num)
    sol = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )

    key = jax.random.PRNGKey(0)
    data = sol.u + 0.05 * jax.random.normal(key, sol.u.shape)
    sigma = 0.03
    lml = float(
        stats.log_marginal_likelihood(
            data, standard_deviation=sigma * jnp.ones(num), posterior=sol.posterior
        )
    )

    # brute force: states ordered forward in time; H selects the qoi (deriv 0)
    seq = stats.markov_select_terminal(sol.posterior)
    mean, cov = _dense_joint(seq, n, d, num)
    h = np.zeros((num * d, num * n * d))
    for k in range(num):
        for i in range(d):
            h[k * d + i, k * n * d + i] = 1.0  # derivative-major per state
    # NB isotropic layout is (derivative, dim): state vector stacked (n, d)
    mu_y = h @ mean
    s_y = h @ cov @ h.T + sigma**2 * np.eye(num * d)
    y = np.asarray(data).reshape(num * d)
    resid = y - mu_y
    chol = np.linalg.cholesky(s_y)
    white = np.linalg.solve(chol, resid)
    lml_dense = float(
        -0.5 * white @ white
        - np.sum(np.log(np.diag(chol)))
        - 0.5 * num * d * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(lml, lml_dense, rtol=1e-8)
