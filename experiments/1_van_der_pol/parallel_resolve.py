"""Parallel-in-time VdP fixed-grid re-solve: sequential vs associative scan.

Benchmarks ``solve_fixed_grid(parallel=True)`` (windowed associative-scan
forward filter, ``parallel_time``) against the sequential scan on the
experiment-1 workload shape: re-solving Van der Pol (TS1(4), dense, dynamic
calibration) on an adaptive grid (reference protocol
/root/reference/experiments/1_van_der_pol/vdp.py:88-103).

Defaults use the round-2c features that make the pass converge here:
``form="sqrt"`` (QR element combination) and ``warmstart="rk"`` (RK4 mean
sweep seeds prediction-consistent linearization points).

Stiffness limitation (measured): at mu=1e3 even the sqrt-element
combination exceeds f64 conditioning (TS1 entries ~mu stacked against
Q(dt)^{-1} ~ dt^{-5}; see ROADMAP #3) and the within-window iteration
diverges for every window size tried -- the known stiff-problem limit of
parallel-in-time methods.  The default benchmark therefore runs the mu=10
configuration on its own adaptive grid, where the parallel pass converges
to the sequential result.
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("ODECKPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ODECKPT_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import harness, ivpsolve, ivpsolvers, problems, taylor  # noqa: E402


def main(window=16, iterations=12, mu=10.0, tol=1e-3, form="sqrt",
         warmstart="rk"):
    here = os.path.dirname(__file__)
    vf, (u0, du0), (t0, t1) = problems.van_der_pol(mu=mu)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strategy = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strategy)
    tcoeffs = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=t0), (u0, du0), num=nu - 1
    )
    init = solver.initial_condition(tcoeffs, 1.0)

    # adaptive pass supplies the grid (exp-1 protocol, vdp.py:88-103)
    asolver = ivpsolve.adaptive(solver, atol=tol, rtol=tol)
    sol_ad = ivpsolve.solve_adaptive_save_every_step(
        vf, init, t0=t0, t1=t1, dt0=0.01, adaptive_solver=asolver
    )
    grid = sol_ad.t

    def timed(fn):
        out = fn()  # compile + warm
        harness.device_sync(out.u)
        t_0 = time.perf_counter()
        out = fn()
        harness.device_sync(out.u)
        return time.perf_counter() - t_0, out

    t_seq, sol_seq = timed(
        jax.jit(lambda: ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver))
    )
    t_par, sol_par = timed(
        jax.jit(
            lambda: ivpsolve.solve_fixed_grid(
                vf, init, grid=grid, solver=solver, parallel=True,
                iterations=iterations, window=window, form=form,
                warmstart=warmstart,
            )
        )
    )
    max_du = float(jnp.max(jnp.abs(sol_par.u - sol_seq.u)))
    result = {
        "mu": mu,
        "grid_points": int(len(grid)),
        "window": window,
        "iterations": iterations,
        "form": form,
        "warmstart": warmstart,
        "sequential_s": round(t_seq, 4),
        "parallel_s": round(t_par, 4),
        "speedup": round(t_seq / t_par, 3),
        "max_abs_deviation": max_du,
        "u_scale": float(jnp.max(jnp.abs(sol_seq.u))),
    }
    print(json.dumps(result), flush=True)
    with open(os.path.join(here, "data_parallel_resolve.json"), "w") as f:
        json.dump(result, f, indent=2)
    if mu <= 100:
        assert np.isfinite(max_du) and max_du < 1e-3, result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--mu", type=float, default=10.0)
    ap.add_argument("--form", default="sqrt")
    ap.add_argument("--warmstart", default="rk")
    a = ap.parse_args()
    main(window=a.window, iterations=a.iterations, mu=a.mu, form=a.form,
         warmstart=a.warmstart)
