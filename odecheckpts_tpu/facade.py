"""Two-stage solve builders (the reference's reusable layer L2).

Function-for-function parity with /root/reference/src/odecheckpts/ivpsolvers.py:

    solve                 -> fixedpoint + solve_adaptive_save_at + backward
                             marginalization (":14-91")
    solve_via_interpolate -> smoother + save-every-step + offgrid marginals
                             (":94-148")
    solve_diffrax         -> native adaptive RK stand-in (diffrax is not in
                             this environment); same signature (":151-193")
    asolve_scipy          -> scipy.integrate.solve_ivp wrapper (":196-210")

Every builder is configure-once / run-many: it returns a pure
``solve_(u0_tuple, p[, output_scale]) -> (qoi_array, aux_dict)`` that is
jit/vmap/grad-able, and all four share one signature so benchmarks treat
probabilistic and RK solvers identically (exploited by the test matrix,
reference tests/test_ivpsolvers.py:11-24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ivpsolve, ivpsolvers, rk, stats, taylor


def _parse_method(method: str):
    """Reference encoding 'ts0-4' -> (correction, num_derivatives); :35-39."""
    family, num = method.rsplit("-", 1)
    if family not in ("ts0", "ts1"):
        raise ValueError(f"unknown correction family in {method!r}")
    return family, int(num)


def solve(
    method: str,
    vf,
    u0_like,
    /,
    save_at,
    *,
    dt0,
    atol,
    rtol,
    ode_order: int = 1,
    calibrate: str = "dynamic",
    implementation: str = "isotropic",
    error_unit: str = "qoi",
    error_calibration: float = None,
):
    """Checkpointed adaptive solve: O(#save_at) memory ("jit loop" solver).

    ``error_unit``: "qoi" equidistributes solution-component error (fewest
    steps at a given accuracy on smooth/stiff problems); "residual"
    concentrates steps at stiff transients (reference-stack behavior; wins at
    very high accuracy on quasi-singular problems like Pleiades).
    """
    family, num_derivatives = _parse_method(method)
    prior = ivpsolvers.prior_ibm(
        num_derivatives=num_derivatives,
        ode_shape=jnp.shape(u0_like),
        implementation=implementation,
    )
    if family == "ts0":
        correction = ivpsolvers.correction_ts0(
            ode_order=ode_order, error_unit=error_unit,
            error_calibration=error_calibration,
        )
    else:
        correction = ivpsolvers.correction_ts1(
            ode_order=ode_order, error_unit=error_unit,
            error_calibration=error_calibration,
        )
    strategy = ivpsolvers.strategy_fixedpoint(prior, correction)

    if calibrate == "dynamic":
        solver = ivpsolvers.solver_dynamic(strategy)
    elif calibrate == "none":
        solver = ivpsolvers.solver(strategy)
    elif calibrate == "mle":
        solver = ivpsolvers.solver_mle(strategy)
    else:
        raise ValueError(f"unknown calibration {calibrate!r}")

    control = ivpsolve.control_proportional_integral()
    asolver = ivpsolve.adaptive(solver, atol=atol, rtol=rtol, control=control)
    ssm = solver.ssm

    def solve_(u0: tuple, p, output_scale=1.0):
        if not isinstance(u0, tuple):
            raise ValueError("Tuple expected.")

        def vf_wrapped(*y, t):
            return vf(*y, t=t, p=p)

        t0 = save_at[0]
        vf_auto = functools.partial(vf_wrapped, t=t0)
        tcoeffs = taylor.odejet_padded_scan(
            vf_auto, u0, num=num_derivatives + 1 - ode_order
        )
        init = solver.initial_condition(tcoeffs, output_scale=output_scale)

        sol = ivpsolve.solve_adaptive_save_at(
            vf_wrapped, init, save_at=save_at, dt0=dt0, adaptive_solver=asolver
        )

        # Backward marginalization; stack the terminal state onto the result.
        seq = stats.markov_select_terminal(sol.posterior)
        margs = stats.markov_marginals(seq, reverse=True)
        mean = jnp.concatenate([margs.mean, sol.posterior.init.mean[None, -1]])
        aux = {"solution": sol, "u0_solve": sol.u}
        return jax.vmap(ssm.qoi_from_sample)(mean), aux

    return solve_


def solve_via_interpolate(method: str, vf, u0_like, /, save_at, *, dt0, atol, rtol):
    """Smoother + save-every-step + searchsorted interpolation ("jit step").

    O(#steps) memory; the textbook baseline of the paper's comparisons."""
    small_value = 1e-6
    family, num_derivatives = _parse_method(method)
    prior = ivpsolvers.prior_ibm(
        num_derivatives=num_derivatives, ode_shape=jnp.shape(u0_like)
    )
    if family != "ts0":
        raise ValueError("solve_via_interpolate supports ts0 only (reference :105-108)")
    correction = ivpsolvers.correction_ts0()
    strategy = ivpsolvers.strategy_smoother(prior, correction)
    solver = ivpsolvers.solver_dynamic(strategy)
    control = ivpsolve.control_proportional_integral()
    asolver = ivpsolve.adaptive(solver, atol=atol, rtol=rtol, control=control)

    def solve_(u0: tuple, p, output_scale=1.0):
        if not isinstance(u0, tuple):
            raise ValueError("Tuple expected.")

        def vf_wrapped(*y, t):
            return vf(*y, t=t, p=p)

        t0 = save_at[0]
        vf_auto = functools.partial(vf_wrapped, t=t0)
        tcoeffs = taylor.odejet_padded_scan(vf_auto, u0, num=num_derivatives)
        init = solver.initial_condition(tcoeffs, output_scale=output_scale)

        sol = ivpsolve.solve_adaptive_save_every_step(
            vf_wrapped,
            init,
            # Small perturbation so all save_at values are interior
            # (reference :133-139).
            t0=save_at[0] - small_value,
            t1=save_at[-1] + small_value,
            dt0=dt0,
            adaptive_solver=asolver,
        )
        dense, _ = stats.offgrid_marginals_searchsorted(
            ts=save_at, solution=sol, solver=solver
        )
        return dense, {"solution": sol, "u0_solve": sol.u}

    return solve_


def solve_rk(method: str, vf, _u0_like, /, save_at, *, dt0, atol, rtol, ode_order=1):
    """Adaptive Runge-Kutta baseline with the reference's diffrax signature."""

    def solve_(u0: tuple, p):
        if not isinstance(u0, tuple):
            raise ValueError("Tuple expected.")
        (init,) = u0
        ys, num_steps = rk.solve_rk_save_at(
            method, vf, init, save_at=save_at, dt0=dt0, atol=atol, rtol=rtol, params=p
        )
        if ode_order == 1:
            u = ys
        elif ode_order == 2:
            d = ys.shape[-1]
            u = ys[:, : d // 2]
        else:
            raise ValueError
        return u, {"solution": ys, "u0_solve": ys, "num_steps": num_steps}

    return solve_


# The reference names this builder after diffrax; keep an alias so its call
# sites port one-for-one.
solve_diffrax = solve_rk


def solve_nystrom(method: str, vf2, _u0_like, /, save_at, *, dt0, atol, rtol):
    """Nystrom-type baseline for ``u'' = vf2(u, t=, p=)`` (position-only
    force): integrates the 2nd-order form directly instead of the reference's
    first-order reduction (run_harder.py's diffrax rows).  ``u0`` is the
    tuple ``(position, velocity)``; returns positions at ``save_at``."""

    def solve_(u0: tuple, p):
        if not isinstance(u0, tuple):
            raise ValueError("Tuple expected.")
        pos0, vel0 = u0
        (us, vs), num_evals = rk.solve_nystrom_save_at(
            method, vf2, pos0, vel0,
            save_at=save_at, dt0=dt0, atol=atol, rtol=rtol, params=p,
        )
        return us, {"solution": (us, vs), "u0_solve": us, "num_steps": num_evals}

    return solve_


def asolve_scipy(method: str, vf, /, time_span, *, atol, rtol):
    """Ground-truth trajectories via scipy (host CPU), reference :196-210."""
    import numpy as np
    import scipy.integrate

    def solve_(u0: tuple, p):
        if not isinstance(u0, tuple):
            raise ValueError("Tuple expected.")

        def vf_scipy(t, y):
            return np.asarray(vf(jnp.asarray(y), t=t, p=p))

        (y0,) = u0
        solution = scipy.integrate.solve_ivp(
            vf_scipy,
            y0=np.asarray(y0),
            t_span=time_span,
            atol=atol,
            rtol=rtol,
            method=method,
        )
        return solution.t, solution.y.T

    return solve_
