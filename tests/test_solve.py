"""End-to-end solver tests: every strategy/driver against independent oracles.

Differential-testing strategy per SURVEY.md section 4: probabilistic solver vs
an independent implementation (closed form / scipy / native RK), plus the
self-consistency identities the reference relies on (checkpoint == offgrid
interpolation == dense RK; filter == smoother terminal values; fixed memory
footprints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor


def _logistic_exact(ts, u0=0.1):
    c = (1.0 - u0) / u0
    return 1.0 / (1.0 + c * np.exp(-np.asarray(ts)))


def _build_solver(kind, *, impl="isotropic", nu=4, method="ts0", ode_order=1,
                  ode_shape=(1,), calibrate="dynamic"):
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=ode_shape, implementation=impl
    )
    if method == "ts0":
        corr = ivpsolvers.correction_ts0(ode_order=ode_order)
    else:
        corr = ivpsolvers.correction_ts1(ode_order=ode_order)
    strat = {
        "filter": ivpsolvers.strategy_filter,
        "smoother": ivpsolvers.strategy_smoother,
        "fixedpoint": ivpsolvers.strategy_fixedpoint,
    }[kind](prior, corr)
    build = {
        "dynamic": ivpsolvers.solver_dynamic,
        "none": ivpsolvers.solver,
        "mle": ivpsolvers.solver_mle,
    }[calibrate]
    return build(strat)


def _init(solver, vf, u0s, t0, nu, ode_order=1, output_scale=1.0):
    vf_auto = lambda *y: vf(*y, t=t0)  # noqa: E731
    tcoeffs = taylor.odejet_padded_scan(vf_auto, u0s, num=nu + 1 - ode_order)
    return solver.initial_condition(tcoeffs, output_scale)


@pytest.mark.parametrize("impl", ["isotropic", "dense"])
def test_terminal_values_match_logistic_closed_form(impl):
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    solver = _build_solver("filter", impl=impl, nu=4)
    init = _init(solver, vf_p, u0s, tspan[0], nu=4)
    asolver = ivpsolve.adaptive(solver, atol=1e-9, rtol=1e-9)
    sol = jax.jit(
        lambda: ivpsolve.solve_adaptive_terminal_values(
            vf_p, init, t0=tspan[0], t1=tspan[1], dt0=0.1, adaptive_solver=asolver
        )
    )()
    expected = _logistic_exact([tspan[1]])
    np.testing.assert_allclose(np.asarray(sol.u), expected, rtol=1e-6)
    assert int(sol.num_steps) > 5


@pytest.mark.parametrize("impl", ["isotropic", "dense"])
@pytest.mark.parametrize("calibrate", ["dynamic", "none", "mle"])
def test_save_at_fixedpoint_matches_closed_form(impl, calibrate):
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    solver = _build_solver("fixedpoint", impl=impl, nu=3, calibrate=calibrate)
    init = _init(solver, vf_p, u0s, tspan[0], nu=3)
    asolver = ivpsolve.adaptive(solver, atol=1e-8, rtol=1e-8)
    save_at = jnp.linspace(*tspan, num=7)
    sol = jax.jit(
        lambda: ivpsolve.solve_adaptive_save_at(
            vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
        )
    )()
    # filtering marginals at the checkpoints
    np.testing.assert_allclose(
        np.asarray(sol.u)[:, 0], _logistic_exact(save_at), rtol=1e-5
    )
    # smoothing marginals via the backward pass (the facade's primary output)
    seq = stats.markov_select_terminal(sol.posterior)
    margs = stats.markov_marginals(seq, reverse=True)
    mean = jnp.concatenate([margs.mean, sol.posterior.init.mean[None, -1]])
    qoi = jax.vmap(sol.ssm.qoi)(mean)
    np.testing.assert_allclose(np.asarray(qoi)[:, 0], _logistic_exact(save_at), rtol=1e-5)
    # memory contract: solution objects scale with #save_at only
    assert sol.u.shape[0] == 7
    assert sol.posterior.init.mean.shape[0] == 7


@pytest.mark.slow  # checkpoint==interpolate also pinned (vs RK) by the fast
def test_save_at_equals_save_every_step_plus_offgrid_interpolation():  # facade matrix
    """The reference's core cross-check (tests/test_ivpsolvers.py:21-24 vs 11-16)."""
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    save_at = jnp.linspace(*tspan, num=5)
    small = 1e-6  # domain pad so save_at is interior (reference: ivpsolvers.py:133-139)

    solver_fp = _build_solver("fixedpoint", nu=nu, ode_shape=(3,))
    init = _init(solver_fp, vf_p, u0s, tspan[0], nu=nu)
    asolver = ivpsolve.adaptive(solver_fp, atol=1e-9, rtol=1e-9)
    sol_fp = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )
    seq = stats.markov_select_terminal(sol_fp.posterior)
    margs = stats.markov_marginals(seq)
    mean_fp = jnp.concatenate([margs.mean, sol_fp.posterior.init.mean[None, -1]])
    u_fp = jax.vmap(sol_fp.ssm.qoi)(mean_fp)

    solver_sm = _build_solver("smoother", nu=nu, ode_shape=(3,))
    asolver_sm = ivpsolve.adaptive(solver_sm, atol=1e-9, rtol=1e-9)
    sol_sm = ivpsolve.solve_adaptive_save_every_step(
        vf_p,
        init,
        t0=tspan[0] - small,
        t1=tspan[1] + small,
        dt0=0.1,
        adaptive_solver=asolver_sm,
    )
    u_interp, _ = stats.offgrid_marginals_searchsorted(
        ts=save_at, solution=sol_sm, solver=solver_sm
    )
    np.testing.assert_allclose(np.asarray(u_fp), np.asarray(u_interp), rtol=2e-4, atol=5e-6)


def test_fixed_grid_filter_matches_adaptive():
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    solver = _build_solver("filter", nu=3)
    init = _init(solver, vf_p, u0s, tspan[0], nu=3)
    grid = jnp.linspace(*tspan, num=200)
    sol = jax.jit(
        lambda: ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    )()
    assert sol.u.shape == (200, 1)
    np.testing.assert_allclose(
        np.asarray(sol.u)[:, 0], _logistic_exact(grid), rtol=1e-4, atol=1e-7
    )


def test_smoother_fixed_grid_posterior_marginals_match_filter_terminal():
    """Terminal smoothing marginal == terminal filtering marginal."""
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    grid = jnp.linspace(*tspan, num=100)

    sol_f = ivpsolve.solve_fixed_grid(
        vf_p,
        _init(_build_solver("filter", nu=3), vf_p, u0s, tspan[0], nu=3),
        grid=grid,
        solver=_build_solver("filter", nu=3),
    )
    sol_s = ivpsolve.solve_fixed_grid(
        vf_p,
        _init(_build_solver("smoother", nu=3), vf_p, u0s, tspan[0], nu=3),
        grid=grid,
        solver=_build_solver("smoother", nu=3),
    )
    np.testing.assert_allclose(sol_f.u[-1], sol_s.u[-1], rtol=1e-10)
    # smoothing marginals from the markov backward pass agree with the truth
    seq = stats.markov_select_terminal(sol_s.posterior)
    margs = stats.markov_marginals(seq)
    np.testing.assert_allclose(
        np.asarray(margs.mean[:, 0, 0]),
        _logistic_exact(grid[:-1]),
        rtol=1e-4,
        atol=1e-7,
    )


def test_second_order_ode_order_2():
    """Harmonic oscillator as a 2nd-order problem: u'' = -u."""

    def vf(u, du, *, t):
        return -u

    u0 = jnp.asarray([1.0])
    du0 = jnp.asarray([0.0])
    nu = 4
    solver = _build_solver("fixedpoint", nu=nu, ode_order=2)
    init = _init(solver, vf, (u0, du0), 0.0, nu=nu, ode_order=2)
    asolver = ivpsolve.adaptive(solver, atol=1e-9, rtol=1e-9)
    save_at = jnp.linspace(0.0, 2.0 * jnp.pi, num=9)
    sol = ivpsolve.solve_adaptive_save_at(
        vf, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )
    np.testing.assert_allclose(
        np.asarray(sol.u)[:, 0], np.cos(np.asarray(save_at)), atol=1e-6
    )


def test_ts1_dense_on_stiffish_vdp():
    """TS1 + dense on Van der Pol mu=10 (moderately stiff, fast check)."""
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=10.0)
    nu = 4
    solver = _build_solver(
        "filter", impl="dense", nu=nu, method="ts1", ode_order=2, ode_shape=(1,)
    )
    init = _init(solver, vf, (u0, du0), 0.0, nu=nu, ode_order=2)
    asolver = ivpsolve.adaptive(solver, atol=1e-8, rtol=1e-8)
    sol = ivpsolve.solve_adaptive_terminal_values(
        vf, init, t0=0.0, t1=2.0, dt0=0.01, adaptive_solver=asolver
    )
    import scipy.integrate

    def vf_first_order(t, y):
        return np.concatenate([y[1:], np.asarray(vf(y[:1], y[1:], t=t))])

    ref = scipy.integrate.solve_ivp(
        vf_first_order,
        (0.0, 2.0),
        np.concatenate([np.asarray(u0), np.asarray(du0)]),
        rtol=1e-11,
        atol=1e-11,
        method="LSODA",
        dense_output=True,
    )
    np.testing.assert_allclose(np.asarray(sol.u), ref.y[:1, -1], rtol=1e-6)


def test_vmap_over_tolerances():
    """The batched-sweep contract: one compiled solve, many tolerances."""
    vf, u0s, tspan, params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    save_at = jnp.linspace(*tspan, num=5)

    def solve_one(tol):
        solver = _build_solver("fixedpoint", nu=nu)
        init = _init(solver, vf_p, u0s, tspan[0], nu=nu)
        asolver = ivpsolve.adaptive(solver, atol=1e-3 * tol, rtol=tol)
        sol = ivpsolve.solve_adaptive_save_at(
            vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
        )
        return sol.u, sol.num_steps[-1]

    tols = jnp.asarray([1e-3, 1e-5, 1e-7])
    us, steps = jax.jit(jax.vmap(solve_one))(tols)
    assert us.shape == (3, 5, 1)
    expected = _logistic_exact(save_at)
    for i, tol in enumerate(tols):
        np.testing.assert_allclose(
            np.asarray(us)[i, :, 0], expected, rtol=10 * float(tol) ** 0.5
        )
    # tighter tolerance must cost more steps
    assert int(steps[2]) > int(steps[0])


@pytest.mark.slow
def test_vdp_mu1e3_at_rtol_1e8_matches_lsoda():
    """BASELINE.json: match reference solutions at rtol 1e-8 on Van der Pol.

    Full stiff problem (mu=1e3, t in [0, 6.3], TS1(4) dense filter, the
    reference's exp-1 configuration at tol 1e-8 instead of 1e-3;
    /root/reference/experiments/1_van_der_pol/vdp.py:61-79).  Oracle: scipy
    LSODA at 1e-12.  Two error-unit modes:

    * "qoi" (default): equidistributes solution error; with the round-3
      error calibration (ERROR_CALIBRATION_TS1_QOI) ~4.7k steps and terminal
      agreement < 1e-7 (the BASELINE "match at rtol 1e-8" target in qoi
      mode; measured 7.8e-8);
    * "residual" (reference-stack behavior): ~3.3M steps, terminal agreement
      ~1e-10 -- and O(1) memory via terminal-values, which is what makes a
      3.3M-step stiff solve feasible at all.
    """
    import scipy.integrate

    vf, (u0, du0), (t0, t1) = problems.van_der_pol(mu=10.0**3)
    nu = 4

    def vf_first_order(t, y):
        return np.concatenate([y[1:], np.asarray(vf(y[:1], y[1:], t=t))])

    ref = scipy.integrate.solve_ivp(
        vf_first_order, (t0, t1),
        np.concatenate([np.asarray(u0), np.asarray(du0)]),
        rtol=1e-12, atol=1e-12, method="LSODA",
    )
    truth = ref.y[0, -1]

    def solve(unit):
        prior_ = ivpsolvers.prior_ibm(
            num_derivatives=nu, ode_shape=(1,), implementation="dense"
        )
        strat = ivpsolvers.strategy_filter(
            prior_, ivpsolvers.correction_ts1(ode_order=2, error_unit=unit)
        )
        solver = ivpsolvers.solver_dynamic(strat)
        tco = taylor.odejet_padded_scan(
            lambda *y: vf(*y, t=t0), (u0, du0), num=nu - 1
        )
        init = solver.initial_condition(tco, 1.0)
        asolver = ivpsolve.adaptive(solver, atol=1e-8, rtol=1e-8)
        sol = jax.jit(
            lambda: ivpsolve.solve_adaptive_terminal_values(
                vf, init, t0=t0, t1=t1, dt0=0.01, adaptive_solver=asolver
            )
        )()
        return int(sol.num_steps), float(sol.u[0])

    steps_qoi, u_qoi = solve("qoi")
    assert abs(u_qoi - truth) < 1e-7, (u_qoi, truth)
    assert 2500 < steps_qoi < 8000, steps_qoi

    steps_res, u_res = solve("residual")
    assert abs(u_res - truth) < 1e-8, (u_res, truth)
    assert steps_res > 1_000_000, steps_res  # O(1) memory makes this viable


def test_mle_calibration_equals_rms_of_step_sigmas():
    """Differential semantics check of calibrate="mle" (old-API
    ``calibrated.mle``, reference playground/smoothing.py:74): the running-MLE
    output scale equals the RMS of the per-step sigma-hats, and the posterior
    equals the uncalibrated posterior with every covariance factor rescaled
    by it.  The sigma-hats are recomputed INDEPENDENTLY from the uncalibrated
    run's stored states (predict -> linearize -> error_and_scale per stored
    interval); the only unshared step is the terminal overshoot the driver
    interpolates away, hence the 0.5% factor tolerance.
    """
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior_ = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_smoother(prior_, ivpsolvers.correction_ts0())

    def run(make_solver):
        solver = make_solver(strat)
        tco = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
        init = solver.initial_condition(tco, 1.0)
        asolver = ivpsolve.adaptive(solver, atol=1e-6, rtol=1e-6)
        return solver, ivpsolve.solve_adaptive_save_every_step(
            vf_p, init, t0=tspan[0], t1=tspan[1], dt0=0.1, adaptive_solver=asolver
        )

    solver_none, sol_none = run(ivpsolvers.solver)
    _, sol_mle = run(ivpsolvers.solver_mle)

    # identical step selection and means (calibration rescales widths only)
    np.testing.assert_allclose(np.asarray(sol_mle.t), np.asarray(sol_none.t))
    np.testing.assert_allclose(
        np.asarray(sol_mle.u), np.asarray(sol_none.u), rtol=1e-12
    )

    # independent sigma-hat recomputation along the stored trajectory
    ssm = solver_none.ssm
    means = sol_none.posterior.init.mean

    def sigma_one(m_prev, dt, t_new):
        m_pred, cache = ssm.extrapolate_mean(m_prev, dt)
        z, jacs = ivpsolvers.linearize(strat, vf_p, m_pred, t_new)
        sigma, _err = ivpsolvers.error_and_scale(strat, z, jacs, cache)
        return sigma

    sigmas = np.asarray(
        jax.vmap(sigma_one)(means[:-1], jnp.diff(sol_none.t), sol_none.t[1:])
    )
    rms = float(np.sqrt(np.mean(sigmas**2)))
    factor = float(np.asarray(sol_mle.output_scale)[0])
    np.testing.assert_allclose(factor, rms, rtol=5e-3)

    # posterior widths: mle = none * factor, element-for-element
    np.testing.assert_allclose(
        np.asarray(sol_mle.u_std), np.asarray(sol_none.u_std) * factor, rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sol_mle.posterior.init.cholesky),
        np.asarray(sol_none.posterior.init.cholesky) * factor,
        rtol=1e-9, atol=1e-300,
    )
