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


def _three_body_1st():
    """First-order reduction of the restricted three-body problem."""
    vf2, (u0, du0), tspan = problems.three_body_restricted()

    def vf1(y, *, t=None, p=()):
        u, du = y[:2], y[2:]
        return jnp.concatenate([du, vf2(u, du, t=t, p=p)])

    return vf1, (jnp.concatenate([u0, du0]),), tspan, ()


@pytest.mark.parametrize(
    "problem,horizon_tol",
    [
        (problems.rigid_body, 1e-11),
        # pleiades/three-body re-verify the same cross-library pin at
        # 14-19s each (warm, r5); rigid_body keeps the oracle fast
        pytest.param(problems.pleiades_1st, 1e-10, marks=pytest.mark.slow),
        pytest.param(_three_body_1st, 1e-8, marks=pytest.mark.slow),
    ],
    ids=["rigid_body", "pleiades", "three_body"],
)
def test_dopri8_yardstick_vs_scipy_dop853(problem, horizon_tol):
    """Cross-library oracle for the work-precision yardstick (VERDICT r3 #4).

    The reference's precision yardstick is a *separate library* (diffrax
    dopri8 @1e-15, reference src/odecheckpts/ivpsolvers.py:151-193); ours is
    the in-house dopri8 (rk.py), which shares driver/controller code with the
    systems under test. Pin it against scipy's independent DOP853 at tight
    tolerance so a shared-driver bug cannot silently bias every
    work-precision plot. Measured agreement: rigid body 1.6e-13, Pleiades
    3.3e-12, three-body 3.9e-10 (the spread tracks each problem's error
    amplification: Pleiades close encounters, the three-body near-singular
    flybys); the asserted bounds leave ~30x headroom yet sit far below the
    tightest tolerance any work-precision sweep plots (1e-9).
    """
    import scipy.integrate

    vf, (y0,), tspan, params = problem()
    save_at = np.linspace(*tspan, num=5)

    ys, _ = rk.solve_rk_save_at(
        "dopri8", vf, y0, save_at=jnp.asarray(save_at), dt0=0.01,
        atol=1e-13, rtol=1e-13, params=params,
    )

    sol = scipy.integrate.solve_ivp(
        lambda t, y: np.asarray(vf(jnp.asarray(y), t=t, p=params)),
        t_span=tspan, y0=np.asarray(y0), t_eval=save_at,
        method="DOP853", atol=1e-13, rtol=1e-13,
    )
    assert sol.success
    scale = np.maximum(1.0, np.max(np.abs(sol.y)))
    err = np.max(np.abs(np.asarray(ys) - sol.y.T)) / scale
    assert err < horizon_tol, f"native dopri8 vs scipy DOP853 disagree: {err:.3e}"


# -- Nystrom-type 2nd-order baselines (ROADMAP #8) ----------------------------


@pytest.mark.parametrize("method,order", [("verlet2", 2), ("yoshida4", 4)])
def test_nystrom_fixed_grid_convergence_order(method, order):
    """Grid-halving on the harmonic oscillator u'' = -u: the global error
    must drop by ~2^order (validates the derived Yoshida coefficients)."""
    vf2 = lambda u, *, t=None, p=(): -u  # noqa: E731
    u0 = jnp.asarray([1.0])
    du0 = jnp.asarray([0.0])

    def err(n):
        grid = jnp.linspace(0.0, 2.0 * jnp.pi, n)
        us, vs = rk.solve_nystrom_fixed(method, vf2, u0, du0, grid=grid)
        # compare u AND v: at t = 2 pi the position sits at the cosine
        # extremum where phase error enters only quadratically (a spurious
        # +2 on the measured rate); the velocity v = -sin picks the phase
        # error up linearly
        return float(
            jnp.maximum(jnp.abs(us[-1, 0] - 1.0), jnp.abs(vs[-1, 0] - 0.0))
        )

    e1, e2 = err(257), err(513)
    rate = np.log2(e1 / e2)
    assert order - 0.5 < rate < order + 0.7


def test_nystrom_energy_conservation():
    """Symplectic signature: harmonic-oscillator energy drift stays bounded
    over many periods (a non-symplectic RK4 at the same step count drifts
    monotonically)."""
    vf2 = lambda u, *, t=None, p=(): -u  # noqa: E731
    u0, du0 = jnp.asarray([1.0]), jnp.asarray([0.0])
    grid = jnp.linspace(0.0, 100.0 * 2.0 * jnp.pi, 20_001)
    us, vs = rk.solve_nystrom_fixed("yoshida4", vf2, u0, du0, grid=grid)
    energy = 0.5 * (np.asarray(us)[:, 0] ** 2 + np.asarray(vs)[:, 0] ** 2)
    assert np.max(np.abs(energy - 0.5)) < 1e-6


def test_nystrom_adaptive_pleiades_vs_reduction():
    """Adaptive step-doubling Nystrom on Pleiades agrees with the dopri5
    first-order-reduction yardstick at the checkpoints."""
    vf2, (u0, du0), tspan = problems.pleiades_2nd()
    vf1, (y0,), tspan1, params = problems.pleiades_1st()
    save_at = jnp.linspace(*tspan, num=5)
    # Nystrom contract: position-only force vf(u, t=, p=); Pleiades' 2nd-order
    # vf takes (u, du) per the ode_order=2 contract but ignores du
    vf_pos = lambda u, *, t=None, p=(): vf2(u, jnp.zeros_like(u), t=t, p=p)  # noqa: E731
    (us, _vs), nevals = jax.jit(
        lambda: rk.solve_nystrom_save_at(
            "yoshida4", vf_pos, u0, du0, save_at=save_at, dt0=0.01,
            atol=1e-8, rtol=1e-8,
        )
    )()
    ys_ref, _ = rk.solve_rk_save_at(
        "dopri5", vf1, y0, save_at=save_at, dt0=0.01, atol=1e-11, rtol=1e-11,
        params=params,
    )
    # Pleiades' close encounters amplify local error ~10^3 by t=3 (the same
    # reason the reference sweeps it only at tight tolerances); 1e-4 bounds
    # the tol-1e-8 global error with margin (measured 4.2e-5)
    np.testing.assert_allclose(
        np.asarray(us), np.asarray(ys_ref)[:, :14], rtol=0, atol=1e-4
    )
    assert int(nevals) > 0


def test_nystrom_rejects_unknown_method():
    vf2 = lambda u, *, t=None, p=(): -u  # noqa: E731
    u0, du0 = jnp.asarray([1.0]), jnp.asarray([0.0])
    with pytest.raises(ValueError, match="Nystrom"):
        rk.solve_nystrom_save_at(
            "rkn64", vf2, u0, du0, save_at=jnp.asarray([0.0, 1.0]),
            dt0=0.1, atol=1e-6, rtol=1e-6,
        )
    with pytest.raises(ValueError, match="Nystrom"):
        rk.solve_nystrom_fixed(
            "rkn64", vf2, u0, du0, grid=jnp.asarray([0.0, 1.0])
        )


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
