"""Capability tour: the estimation-strategy triad (reference playground).

Port of /root/reference/experiments/playground/smoothing.py, which documents
the three strategy/driver pairings on one problem:

* terminal values      <-> filter      (O(1) memory)
* save-every-step      <-> smoother    (+ off-grid dense output)
* save-at              <-> fixedpoint  (O(#save_at) memory)
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, stats, taylor  # noqa: E402


def main():
    vf, u0s, (t0, t1), params = problems.logistic()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3

    def build(kind):
        prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(1,))
        corr = ivpsolvers.correction_ts0()
        strategy = {
            "filter": ivpsolvers.strategy_filter,
            "smoother": ivpsolvers.strategy_smoother,
            "fixedpoint": ivpsolvers.strategy_fixedpoint,
        }[kind](prior, corr)
        solver = ivpsolvers.solver_dynamic(strategy)
        tcoeffs = taylor.odejet_padded_scan(lambda u: vf_p(u, t=t0), u0s, num=nu)
        init = solver.initial_condition(tcoeffs, 1.0)
        asolver = ivpsolve.adaptive(solver, atol=1e-6, rtol=1e-6)
        return solver, init, asolver

    # 1. Terminal values with a filter
    solver, init, asolver = build("filter")
    sol = ivpsolve.solve_adaptive_terminal_values(
        vf_p, init, t0=t0, t1=t1, dt0=0.1, adaptive_solver=asolver
    )
    print(f"terminal value: u(t1)={sol.u} after {int(sol.num_steps)} steps")

    # 2. Save-every-step with a smoother + off-grid marginals
    solver, init, asolver = build("smoother")
    sol = ivpsolve.solve_adaptive_save_every_step(
        vf_p, init, t0=t0 - 1e-4, t1=t1 + 1e-4, dt0=0.1, adaptive_solver=asolver
    )
    ts_dense = jnp.linspace(t0, t1, num=7)
    u_dense, _ = stats.offgrid_marginals_searchsorted(
        ts=ts_dense, solution=sol, solver=solver
    )
    print(f"smoother stored {len(sol.t)} states; off-grid u: {u_dense[:, 0]}")

    # 3. Save-at with a fixedpoint smoother
    solver, init, asolver = build("fixedpoint")
    save_at = jnp.linspace(t0, t1, num=7)
    sol = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )
    seq = stats.markov_select_terminal(sol.posterior)
    margs = stats.markov_marginals(seq)
    mean = jnp.concatenate([margs.mean, sol.posterior.init.mean[None, -1]])
    print(f"fixedpoint stored {len(sol.t)} states; u: {mean[:, 0, 0]}")
    print("(the smoother off-grid and fixedpoint save-at values agree)")


if __name__ == "__main__":
    main()
