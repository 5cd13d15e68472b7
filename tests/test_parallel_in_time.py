"""Parallel-in-time passes vs sequential scans (forward filter + backward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor


# both params slow (64s+ each, measured r5): the parallel-vs-sequential
# oracle stays in the fast tier via test_adaptive_parallel_in_time_
# matches_sequential_resolve and the prefix-scan equivalence tests
@pytest.mark.parametrize(
    "impl",
    [
        pytest.param("isotropic", marks=pytest.mark.slow),
        pytest.param("dense", marks=pytest.mark.slow),
    ],
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


@pytest.mark.slow  # 24s warm (r5); PIT-vs-seq canary: adaptive_resolve test
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


# -- forward (filter) pass: windowed associative scan -------------------------


def _fixed_grid_setup(calib, num=160):
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    make = {"none": ivpsolvers.solver, "dynamic": ivpsolvers.solver_dynamic}
    solver = make[calib](strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(*tspan, num=num)
    return vf_p, init, grid, solver


@pytest.mark.slow
@pytest.mark.parametrize("calib", ["none", "dynamic"])
def test_parallel_forward_filter_matches_sequential(calib):
    """Windowed associative-scan filter == sequential scan within sqrt-eps
    (isotropic TS0; arXiv:2502.11686-style forward pass)."""
    vf_p, init, grid, solver = _fixed_grid_setup(calib)
    sol_seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    sol_par = ivpsolve.solve_fixed_grid(
        vf_p, init, grid=grid, solver=solver, parallel=True, iterations=20
    )
    np.testing.assert_allclose(
        np.asarray(sol_par.u), np.asarray(sol_seq.u), rtol=1e-7, atol=1e-10
    )
    # tiny early-time stds carry the covariance jitter (eps * trace) the
    # parallel path adds before the cholesky; compare with a matching atol
    np.testing.assert_allclose(
        np.asarray(sol_par.u_std), np.asarray(sol_seq.u_std), rtol=1e-4, atol=1e-9
    )


@pytest.mark.slow
def test_parallel_forward_filter_dense_ts1():
    """Dense TS1 (the VdP configuration).  The covariance-form combination
    floors at ~cond(Q(dt)) * eps, so the gate is looser than sqrt-eps for
    nu=4; the square-root element variant is the documented follow-up."""
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=10.0)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=0.0), (u0, du0), num=nu - 1
    )
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(0.0, 2.0, num=400)
    sol_seq = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
    sol_par = ivpsolve.solve_fixed_grid(
        vf, init, grid=grid, solver=solver, parallel=True, iterations=20
    )
    np.testing.assert_allclose(
        np.asarray(sol_par.u), np.asarray(sol_seq.u), rtol=0, atol=5e-4
    )
    assert np.all(np.isfinite(np.asarray(sol_par.u_std)))


def test_parallel_rejects_bad_warmstart():
    vf_p, init, grid, solver = _fixed_grid_setup("none")
    for bad in ("euler", "rk:0", "rk:-2", "rk:x", "rk:"):
        with pytest.raises(ValueError, match="warmstart"):
            ivpsolve.solve_fixed_grid(
                vf_p, init, grid=grid, solver=solver, parallel=True,
                warmstart=bad,
            )


@pytest.mark.slow
def test_strided_rk_warmstart_matches_dense_warmstart():
    """``warmstart="rk:<s>"`` anchors the RK4 sweep every s-th grid point
    (sequential depth T/s) and fills intermediate left endpoints with one
    vmapped RK4 offset step.  The fill error is O((s*dt)^5) -- far inside
    the window iteration's contraction basin -- so at the same iteration
    budget the strided start must land inside the dense start's band.

    The stride has to keep stride*dt small against the dynamics' Lipschitz
    time (rigid body: ~1): measured on this problem, stride*dt = 0.5 leaves
    an O(3e-2) fill error that costs ~3 extra sweeps, while stride*dt =
    0.125 (num=641, stride 8) starts within 1e-5 of the trajectory and
    iteration 3 lands at 1.1e-5 vs the dense start's 2.3e-7."""
    vf_p, init, grid, solver = _fixed_grid_setup("dynamic", num=641)
    seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    kw = dict(grid=grid, solver=solver, parallel=True, iterations=3,
              form="sqrt")
    par_dense = ivpsolve.solve_fixed_grid(vf_p, init, warmstart="rk", **kw)
    par_strided = ivpsolve.solve_fixed_grid(
        vf_p, init, warmstart="rk:8", **kw
    )
    err_dense = np.max(np.abs(np.asarray(par_dense.u) - np.asarray(seq.u)))
    err_strided = np.max(np.abs(np.asarray(par_strided.u) - np.asarray(seq.u)))
    assert err_dense < 5e-6
    assert err_strided < 2e-4


@pytest.mark.slow
def test_sqrt_form_matches_sequential_tighter_than_cov():
    """QR-element combination (arXiv:2502.11686-style): same fixed point as
    the covariance form, with the conditioning exponent halved -- in f64 it
    lands an order of magnitude closer to the sequential scan."""
    vf_p, init, grid, solver = _fixed_grid_setup("dynamic")
    seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    kw = dict(grid=grid, solver=solver, parallel=True, iterations=20)
    par_sqrt = ivpsolve.solve_fixed_grid(vf_p, init, form="sqrt", **kw)
    np.testing.assert_allclose(
        np.asarray(par_sqrt.u), np.asarray(seq.u), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(par_sqrt.u_std), np.asarray(seq.u_std), rtol=1e-8, atol=1e-14
    )


@pytest.mark.slow
def test_sqrt_form_is_f32_viable():
    """The headline capability: float32 element combination at f32 roundoff
    levels (TPU is f32-first: this is what makes the parallel pass
    deployable on-chip without x64 emulation).

    Round-3 update: with the default reparameterizations (precondition +
    deviation) BOTH forms sit at roundoff -- the covariance form's
    J ~ Q^-2 conditioning failure (~1e-3 error, the round-2b finding)
    reappears only in the ablation with both switched off, which this test
    pins as the historical record."""
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    u32 = tuple(jnp.asarray(u, jnp.float32) for u in u0s)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u32, num=nu)
    init = solver.initial_condition(tcoeffs, jnp.float32(1.0))
    grid = jnp.linspace(*tspan, num=160, dtype=jnp.float32)
    seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    kw = dict(grid=grid, solver=solver, parallel=True, iterations=20)
    err_cov = float(jnp.max(jnp.abs(
        ivpsolve.solve_fixed_grid(vf_p, init, form="cov", **kw).u - seq.u)))
    err_sqrt = float(jnp.max(jnp.abs(
        ivpsolve.solve_fixed_grid(vf_p, init, form="sqrt", **kw).u - seq.u)))
    assert err_sqrt < 5e-5, err_sqrt
    assert err_cov < 5e-5, err_cov
    # ablation: raw covariance elements (no dt-preconditioning, absolute
    # means) lose the combine to conditioning by >= 20x
    err_cov_raw = float(jnp.max(jnp.abs(
        ivpsolve.solve_fixed_grid(
            vf_p, init, form="cov", precondition=False, deviation=False, **kw
        ).u - seq.u)))
    assert err_cov_raw > 20.0 * err_cov, (err_cov_raw, err_cov)


@pytest.mark.slow
def test_sqrt_form_stays_bounded_on_stiff_vdp():
    """Stiff VdP (mu=1e3, dense TS1, 20k-point grid): the covariance form
    overflows (~1e65); sqrt elements stay O(1).  The windowed linearization
    still converges to a DIFFERENT fixed point than the sequential
    recursion on stiff dynamics (ROADMAP: open), so the gate here is
    boundedness, not parity."""
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=1000.0)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=0.0), (u0, du0), num=nu - 1
    )
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(0.0, 2.0, num=20000)
    seq = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
    assert np.all(np.isfinite(np.asarray(seq.u)))
    par = ivpsolve.solve_fixed_grid(
        vf, init, grid=grid, solver=solver, parallel=True, iterations=30,
        window=4, form="sqrt",
    )
    assert np.all(np.isfinite(np.asarray(par.u)))
    assert float(jnp.max(jnp.abs(par.u))) < 10.0


def test_bad_form_rejected():
    vf_p, init, grid, solver = _fixed_grid_setup("none")
    with pytest.raises(ValueError, match="form"):
        ivpsolve.solve_fixed_grid(
            vf_p, init, grid=grid, solver=solver, parallel=True, form="qr"
        )


@pytest.mark.slow
def test_parallel_smoother_matches_sequential_through_backward_pass():
    """Reversal strategies in the parallel fixed-grid pass: backward
    conditionals reverted from the filtered marginals must reproduce the
    sequential smoother's SMOOTHED marginals end to end."""
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_smoother(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(*tspan, num=48)

    def smoothed(sol):
        seq = stats.markov_select_terminal(sol.posterior)
        margs = stats.markov_marginals(seq)
        return margs.mean, jnp.einsum(
            "...ij,...kj->...ik", margs.cholesky, margs.cholesky
        )

    m_seq, c_seq = smoothed(
        ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    )
    m_par, c_par = smoothed(
        ivpsolve.solve_fixed_grid(
            vf_p, init, grid=grid, solver=solver, parallel=True, iterations=20
        )
    )
    np.testing.assert_allclose(np.asarray(m_par), np.asarray(m_seq),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c_par), np.asarray(c_seq),
                               rtol=1e-4, atol=1e-10)


@pytest.mark.slow
def test_rk_warmstart_accelerates_convergence():
    """Prediction-consistent RK4+jet seeding: at iterations=3 the warm pass
    matches the sequential filter ~2000x tighter than the cold start (whose
    default needs ~8+ sweeps); seeds must be PREDICTIONS, not on-trajectory
    jets -- exact jets zero the first-sweep residuals and collapse dynamic
    calibration (regression: element J-blocks overflowed)."""
    vf_p, init, grid, solver = _fixed_grid_setup("dynamic")
    seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    kw = dict(grid=grid, solver=solver, parallel=True, iterations=3)
    warm = ivpsolve.solve_fixed_grid(vf_p, init, warmstart="rk", **kw)
    cold = ivpsolve.solve_fixed_grid(vf_p, init, **kw)
    du_warm = float(jnp.max(jnp.abs(warm.u - seq.u)))
    du_cold = float(jnp.max(jnp.abs(cold.u - seq.u)))
    assert du_warm < 5e-3, du_warm
    assert du_warm < du_cold / 10.0, (du_warm, du_cold)


# -- adaptive parallel-in-time (grid discovery + parallel re-solve) -----------


def test_adaptive_parallel_in_time_matches_sequential_resolve():
    """solve_adaptive_parallel_in_time: the discovered grid must equal the
    plain adaptive accepted grid, and the parallel re-solve must match the
    sequential fixed-grid solve on that grid."""
    vf, u0s, tspan, params = problems.rigid_body(time_span=(0.0, 6.0))
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_smoother(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-7, rtol=1e-4)

    sol_par = ivpsolve.solve_adaptive_parallel_in_time(
        vf_p, init, t0=tspan[0], t1=tspan[1], dt0=0.1,
        adaptive_solver=asolver, max_steps=256, iterations=6, window=8,
        form="sqrt", warmstart="rk",
    )
    # oracle grid: the plain (eager) adaptive every-step drive
    sol_seq = ivpsolve.solve_adaptive_save_every_step(
        vf_p, init, t0=tspan[0], t1=tspan[1], dt0=0.1,
        adaptive_solver=asolver,
    )
    np.testing.assert_allclose(
        np.asarray(sol_par.t), np.asarray(sol_seq.t), rtol=1e-9
    )
    # parallel == sequential on the SAME grid
    sol_fix = ivpsolve.solve_fixed_grid(
        vf_p, init, grid=sol_par.t, solver=solver
    )
    np.testing.assert_allclose(
        np.asarray(sol_par.u), np.asarray(sol_fix.u), rtol=5e-5, atol=1e-7
    )


# -- element representations: preconditioning + deviation form ----------------


def _reparam_oracle(combos):
    """precondition/deviation transform the elements, not the math: each
    combination must reproduce the sequential fixed-grid result identically
    to the default configuration's tolerance."""
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    # fine enough that the window iteration converges (coarser grids sit at
    # the iteration-radius edge, where representation choices shift WHICH
    # side of convergence a window lands on)
    grid = jnp.linspace(*tspan, 161)
    sol_seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    for form, pc, dev in combos:
        sol_par = ivpsolve.solve_fixed_grid(
            vf_p, init, grid=grid, solver=solver, parallel=True,
            iterations=8, window=16, form=form,
            precondition=pc, deviation=dev,
        )
        # bound: the iteration-convergence level of the default
        # configuration on this grid (~9e-4), NOT representation
        # error -- all variants must land there together
        np.testing.assert_allclose(
            np.asarray(sol_par.u), np.asarray(sol_seq.u),
            rtol=2e-3, atol=2e-3,
        ), (form, pc, dev)


@pytest.mark.slow  # 118s measured (r5): heaviest single compile in the tier
def test_precondition_and_deviation_are_exact_reparameterizations():
    """Oracle: the shipped default (sqrt, preconditioned, deviation)
    and the plain baseline (cov, neither).  Each (form, pc, dev) combo is a
    separately compiled eager program (~100 s each on this box), so the full
    eight-way cross-product lives in the slow variant below."""
    _reparam_oracle([("sqrt", True, True), ("cov", False, False)])


@pytest.mark.slow
def test_precondition_and_deviation_reparameterizations_full():
    _reparam_oracle(
        [
            (form, pc, dev)
            for form in ("sqrt", "cov")
            for pc in (False, True)
            for dev in (False, True)
            if (form, pc, dev) not in (("sqrt", True, True), ("cov", False, False))
        ]
    )


@pytest.mark.slow
def test_deviation_form_makes_stiff_ts1_f32_viable():
    """ROADMAP #3 (round 3): stiff TS1 element combination in FLOAT32.

    The standard element carries the observation value v = H x - z with
    |H x| ~ mu |x|; in f32 the mean path cancels catastrophically and the
    pass goes non-finite on a stiff fine grid.  The deviation form carries
    dx = x - lin, making the observation value exactly -z (the local
    residual) -- the same pass is then finite and matches the sequential
    f32 solve.  (Smooth-region grid: windows spanning a fast VdP transition
    still diverge in the re-linearization iteration, a separate, documented
    limitation.)
    """
    import jax as _jax

    x64_was = _jax.config.read("jax_enable_x64")
    _jax.config.update("jax_enable_x64", False)
    try:
        mu = 1000.0
        vf, (u0, du0), _ts = problems.van_der_pol(mu=mu)
        nu = 4
        prior = ivpsolvers.prior_ibm(
            num_derivatives=nu, ode_shape=(1,), implementation="dense"
        )
        strat = ivpsolvers.strategy_filter(
            prior, ivpsolvers.correction_ts1(ode_order=2)
        )
        solver = ivpsolvers.solver_dynamic(strat)
        tco = taylor.odejet_padded_scan(
            lambda *y: vf(*y, t=0.0), (u0, du0), num=nu - 1
        )
        init = solver.initial_condition(tco, 1.0)
        grid = jnp.asarray(2e-4 * np.arange(129), jnp.float32)
        sol_seq = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
        assert bool(jnp.all(jnp.isfinite(sol_seq.u)))
        sol_dev = ivpsolve.solve_fixed_grid(
            vf, init, grid=grid, solver=solver, parallel=True,
            iterations=8, window=16, form="sqrt", warmstart="rk",
            deviation=True,
        )
        u = np.asarray(sol_dev.u)
        assert np.all(np.isfinite(u))
        rel = np.max(np.abs(u - np.asarray(sol_seq.u))) / np.max(
            np.abs(np.asarray(sol_seq.u))
        )
        assert rel < 1e-4, rel
    finally:
        _jax.config.update("jax_enable_x64", x64_was)


@pytest.mark.slow
def test_stiffness_gated_sequential_fallback():
    """Windows spanning a fast VdP transition diverge in the
    re-linearization iteration (representation-independent, the round-3
    diagnosis); the fallback gate re-runs exactly those windows with the
    sequential filter.  Previously this configuration went non-finite."""
    mu = 100.0
    vf, (u0, du0), _ts = problems.van_der_pol(mu=mu)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tco = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=0.0), (u0, du0), num=nu - 1
    )
    init = solver.initial_condition(tco, 1.0)
    grid = jnp.linspace(0.0, 1.0, 1025)  # spans the first relaxation jump
    sol_seq = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
    sol_par = ivpsolve.solve_fixed_grid(
        vf, init, grid=grid, solver=solver, parallel=True,
        iterations=8, window=16, form="sqrt", warmstart="rk",
    )
    u = np.asarray(sol_par.u)
    assert np.all(np.isfinite(u))
    du = np.max(np.abs(u - np.asarray(sol_seq.u)))
    assert du < 5e-2, du  # iteration-convergence level on this grid
    # the gate must be bit-silent where the iteration converges
    vfr, u0sr, tspanr, paramsr = problems.rigid_body()
    vf_r = lambda u, *, t: vfr(u, t=t, p=paramsr)  # noqa: E731
    prior_r = ivpsolvers.prior_ibm(num_derivatives=3, ode_shape=(3,))
    strat_r = ivpsolvers.strategy_filter(prior_r, ivpsolvers.correction_ts0())
    solver_r = ivpsolvers.solver_dynamic(strat_r)
    tco_r = taylor.odejet_padded_scan(
        lambda u: vf_r(u, t=tspanr[0]), u0sr, num=3
    )
    init_r = solver_r.initial_condition(tco_r, 1.0)
    grid_r = jnp.linspace(*tspanr, 161)
    kw = dict(grid=grid_r, solver=solver_r, parallel=True, iterations=8,
              window=16, form="sqrt")
    a = ivpsolve.solve_fixed_grid(vf_r, init_r, **kw)
    b = ivpsolve.solve_fixed_grid(vf_r, init_r, fallback_rtol=None, **kw)
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))


def test_iteration_tol_matches_fixed_sweeps_and_reports_diagnostics():
    """``iteration_tol`` makes the per-window sweep count adaptive (a
    ``lax.while_loop`` up to ``iterations``): on a converging problem it
    must land in the fixed-count result's band, and the diagnostics dict
    must report per-window deltas below the tolerance with no window
    diverged."""
    vf_p, init, grid, solver = _fixed_grid_setup("dynamic", num=65)
    seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    kw = dict(grid=grid, solver=solver, parallel=True, iterations=20,
              form="sqrt")
    sol, diag = ivpsolve.solve_fixed_grid(
        vf_p, init, iteration_tol=1e-10, return_diagnostics=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(sol.u), np.asarray(seq.u), rtol=0, atol=1e-9
    )
    delta = np.asarray(diag["window_delta"])
    assert delta.shape == (diag["num_windows"],)
    assert np.all(delta <= 1e-10)
    assert not np.any(np.asarray(diag["window_diverged"]))
    # ... and it is a parallel-sweep knob: rejected on the sequential path
    with pytest.raises(ValueError, match="iteration_tol"):
        ivpsolve.solve_fixed_grid(
            vf_p, init, grid=grid, solver=solver, iteration_tol=1e-8
        )


def test_sie_warmstart_survives_steps_where_rk4_explodes():
    """``warmstart="sie"`` (linearized-implicit Euler) is A-stable;
    classical RK4's stability region ends at dt |lambda| ~ 2.8.  On the
    large slow-manifold steps a stiff ADAPTIVE grid accepts (VdP mu=1e3:
    dt ~ 1e-2 at |lambda| ~ 2 mu, i.e. dt |lambda| ~ 20), the RK4 warm
    start must explode and the SIE one stay finite -- the round-4 stiff
    parallel-in-time diagnosis in a unit."""
    from odecheckpts_tpu import parallel_time

    mu = 1000.0
    vf, (u0, du0), _ts = problems.van_der_pol(mu=mu)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tco = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=0.0), (u0, du0), num=nu - 1
    )
    init = solver.initial_condition(tco, 1.0)
    rv0, _scale = init
    # slow-manifold segment: u ~ 2 is strongly attracted; dt far beyond
    # RK4's stability limit but routine for the adaptive controller
    grid = jnp.asarray(np.linspace(0.5, 0.82, 17))
    lin_rk = parallel_time._warmstart_rk(
        vf, solver.ssm, rv0.mean, grid, 2, nu, method="rk4"
    )
    lin_sie = parallel_time._warmstart_rk(
        vf, solver.ssm, rv0.mean, grid, 2, nu, method="sie"
    )
    assert not bool(jnp.all(jnp.isfinite(lin_rk))) or (
        float(jnp.max(jnp.abs(lin_rk))) > 1e6
    )
    assert bool(jnp.all(jnp.isfinite(lin_sie)))
    # the SIE sweep tracks the solution scale (|u| <= ~2 on the manifold);
    # dense means are flat (n*d,), derivative-major: column 0 is u.  Entry 0
    # is the jet prediction from the (deliberately off-manifold) start point
    # and legitimately overshoots; every LATER left endpoint comes from an
    # SIE step that has relaxed onto the manifold.
    u_sie = lin_sie[1:, 0]
    assert float(jnp.max(jnp.abs(u_sie))) < 3.0


@pytest.mark.slow
def test_stiff_adaptive_pit_converges_without_fallback():
    """VERDICT round-3 #1: stiff parallel-in-time, actually parallel.

    VdP mu=1e3 (the reference's flagship stiff workload,
    /root/reference/experiments/1_van_der_pol/vdp.py:88-103) on its own
    adaptive grid: ``solve_adaptive_parallel_in_time`` with the discovery
    warm start + adaptive sweep counts must converge in EVERY window --
    zero sequential-fallback windows -- and match the sequential fixed-grid
    solve on the same grid."""
    mu = 1000.0
    vf, (u0, du0), _ts = problems.van_der_pol(mu=mu)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tco = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=0.0), (u0, du0), num=nu - 1
    )
    init = solver.initial_condition(tco, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-8, rtol=1e-5)
    sol, diag = ivpsolve.solve_adaptive_parallel_in_time(
        vf, init, t0=0.0, t1=6.3, dt0=0.01, adaptive_solver=asolver,
        max_steps=2**14, iterations=24, window=16,
        return_diagnostics=True,
    )
    div = np.asarray(diag["window_diverged"])
    assert int(div.sum()) == 0, f"{int(div.sum())}/{len(div)} windows fell back"
    u = np.asarray(sol.u)
    assert np.all(np.isfinite(u))
    sol_seq = ivpsolve.solve_fixed_grid(vf, init, grid=sol.t, solver=solver)
    rel = np.max(np.abs(u - np.asarray(sol_seq.u))) / np.max(
        np.abs(np.asarray(sol_seq.u))
    )
    assert rel < 1e-3, rel


@pytest.mark.slow
def test_time_sharded_windows_match_unsharded():
    """time_shard=(mesh, axis): the window combines sharded along the STEP
    axis over an 8-device mesh equal the unsharded pass — sharding is a
    layout constraint, and it is the multi-chip axis a single IVP can scale
    on (the sequential filter's scan cannot shard time).  Slow: the 8-device
    compile costs ~2 min on this box, and __graft_entry__.dryrun_multichip
    compiles+executes the same time-sharded path on every driver round."""
    from jax.sharding import Mesh

    vf_p, init, grid, solver = _fixed_grid_setup("dynamic", num=33)
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))

    kwargs = dict(grid=grid, solver=solver, parallel=True,
                  iterations=6, window=16)
    sol_ref = jax.jit(
        lambda: ivpsolve.solve_fixed_grid(vf_p, init, **kwargs)
    )()
    sol_sh = jax.jit(
        lambda: ivpsolve.solve_fixed_grid(
            vf_p, init, **kwargs, time_shard=(mesh, "t")
        )
    )()
    np.testing.assert_allclose(
        np.asarray(sol_sh.u), np.asarray(sol_ref.u), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sol_sh.u_std), np.asarray(sol_ref.u_std),
        rtol=1e-8, atol=1e-12,
    )


def test_time_shard_rejected_on_sequential_path():
    from jax.sharding import Mesh

    vf_p, init, grid, solver = _fixed_grid_setup("dynamic", num=17)
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    with pytest.raises(ValueError, match="time_shard"):
        ivpsolve.solve_fixed_grid(
            vf_p, init, grid=grid, solver=solver, time_shard=(mesh, "t")
        )


# -- blockdiag backend: per-dimension element chains --------------------------


def _blockdiag_setup(strat_name, num):
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(3,), implementation="blockdiag"
    )
    strat = getattr(ivpsolvers, f"strategy_{strat_name}")(
        prior, ivpsolvers.correction_ts0()
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(*tspan, num=num)
    return vf_p, init, grid, solver


@pytest.mark.slow
@pytest.mark.parametrize("form", ["cov", "sqrt"])
def test_parallel_blockdiag_filter_matches_sequential(form):
    """Blockdiag parallel-in-time: per-dimension (n, n) element chains share
    the linearization, everything else is vmapped over the block axis —
    filtered means/stds equal the sequential blockdiag filter."""
    vf_p, init, grid, solver = _blockdiag_setup("filter", 160)
    sol_seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    sol_par = ivpsolve.solve_fixed_grid(
        vf_p, init, grid=grid, solver=solver, parallel=True, iterations=20,
        form=form,
    )
    np.testing.assert_allclose(
        np.asarray(sol_par.u), np.asarray(sol_seq.u), rtol=1e-9, atol=1e-11
    )
    # atol: the cov form's pre-cholesky jitter (eps * max(trace, 1)) floors
    # tiny early-time stds at sqrt(eps) ~ 1.5e-8
    np.testing.assert_allclose(
        np.asarray(sol_par.u_std), np.asarray(sol_seq.u_std),
        rtol=1e-4, atol=2e-8,
    )
    # per-dimension output scales survive the parallel pass
    assert sol_par.output_scale.shape == sol_seq.output_scale.shape


@pytest.mark.slow
def test_parallel_blockdiag_smoother_matches_sequential():
    """Smoother strategy on blockdiag: the parallel pass's post-reverted
    backward conditionals reproduce the sequential smoothed marginals."""
    vf_p, init, grid, solver = _blockdiag_setup("smoother", 160)
    sol_seq = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    m_seq = stats.markov_marginals(stats.markov_select_terminal(sol_seq.posterior))
    sol_par = ivpsolve.solve_fixed_grid(
        vf_p, init, grid=grid, solver=solver, parallel=True, iterations=20,
        form="sqrt", warmstart="rk",
    )
    m_par = stats.markov_marginals(
        stats.markov_select_terminal(sol_par.posterior), parallel=True
    )
    np.testing.assert_allclose(
        np.asarray(m_par.mean), np.asarray(m_seq.mean), rtol=1e-5, atol=1e-6
    )


def test_fixed_grid_blockdiag_sequential_mle():
    """Sequential fixed-grid on blockdiag: the MLE sum-of-squares carry is
    per-dimension (regression: a scalar carry made lax.scan reject the
    (d,)-shaped sigma update)."""
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(3,), implementation="blockdiag"
    )
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_mle(strat)
    tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(*tspan, num=33)
    sol = ivpsolve.solve_fixed_grid(vf_p, init, grid=grid, solver=solver)
    assert np.all(np.isfinite(np.asarray(sol.u)))
    assert sol.output_scale.shape[-1] == 3


def _per_step_nonuniform_oracle(combine_engines):
    """Round 4: per-step preconditioning (element k in its own T(dt_k)
    coordinates, interfaces chained through T(dt_{k-1})).

    On a geometric grid whose dt spans 64x INSIDE one window, the round-3
    window-mean dt_ref left a dt^(2(nu-o)+1) anisotropy of ~9 decades inside
    the combine Grams; per-step coordinates reduce the exposure to the
    per-step dt RATIO.  Exactness check: the parallel pass must match the
    sequential solve on the same nonuniform grid, one wide window covering
    the whole spread."""
    vf0, (u0,), _ts, p = problems.logistic()

    def vf(u, *, t):
        return vf0(u, t=t, p=p)

    nu = 3
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="isotropic"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts0(ode_order=1)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tco = taylor.odejet_padded_scan(lambda y: vf(y, t=0.0), (u0,), num=nu)
    init = solver.initial_condition(tco, 1.0)
    # 32 steps, dt growing geometrically by 2^(1/5): spread 74x per window
    dts = 1e-4 * 2.0 ** (np.arange(32) / 5.0)
    grid = jnp.asarray(np.concatenate([[0.0], np.cumsum(dts)]))
    sol_seq = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
    for ce in combine_engines:
        sol_par, diag = ivpsolve.solve_fixed_grid(
            vf, init, grid=grid, solver=solver, parallel=True,
            iterations=8, window=32, form="sqrt", combine_engine=ce,
            return_diagnostics=True,
        )
        assert int(np.asarray(diag["window_diverged"]).sum()) == 0
        np.testing.assert_allclose(
            np.asarray(sol_par.u), np.asarray(sol_seq.u),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(sol_par.u_std), np.asarray(sol_seq.u_std),
            rtol=1e-6, atol=1e-12,
        )


@pytest.mark.slow  # 78s measured (r5)
def test_per_step_preconditioning_nonuniform_window():
    # ce=None exercises the per-step transform in the generic build; the
    # fused-build ("ll") variant is a second full compile and runs slow
    _per_step_nonuniform_oracle((None,))


@pytest.mark.slow
def test_per_step_preconditioning_nonuniform_window_fused_build():
    _per_step_nonuniform_oracle(("ll",))
