"""Experiment 5: posterior sampling -- checkpoints (ATS) vs tstops re-solve (AS).

Port of /root/reference/experiments/5_vs_interpolation/measure.py.  Three-body
restricted problem (2nd order), K in {5, 50, 500} posterior samples at 50
save_at points, tolerances {1e-4, 1e-7, 1e-10}:

* "ATS (ours)": fixedpoint ``solve_adaptive_save_at`` then ``markov_sample``
  on the 50-state posterior (O(#save_at) work per sample);
* "AS" baseline: adaptive save-every-step to discover the grid, union with
  save_at ("tstops" emulation), ``solve_fixed_grid`` re-solve with a smoother,
  sample the full O(#steps) posterior, index out the save_at rows.

Timing = min of 3 (compile excluded).  Results go to a pickled dict with the
reference's schema for the LaTeX table printer.
"""

import argparse
import functools
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import harness, ivpsolve, ivpsolvers, problems, stats, taylor  # noqa: E402


class RunnerCheckpoint:
    name = "ATS (ours)"

    def __init__(self, vf, init, tspan, /, *, ode_order, num_derivs, num_samples):
        self.vf = vf
        self.num_samples = num_samples
        prior = ivpsolvers.prior_ibm(
            num_derivatives=num_derivs, ode_shape=(2,), implementation="isotropic"
        )
        ts0 = ivpsolvers.correction_ts0(ode_order=ode_order)
        strategy = ivpsolvers.strategy_fixedpoint(prior, ts0)
        self.solver = ivpsolvers.solver(strategy)
        self.ctrl = ivpsolve.control_proportional_integral()
        t0, _ = tspan
        num = num_derivs + 1 - ode_order
        tcoeffs = taylor.odejet_padded_scan(lambda *y: vf(*y, t=t0), init, num=num)
        self.init = self.solver.initial_condition(tcoeffs, jnp.ones(()))
        self.solve = None

    def prepare_and_solve(self, *, tol, save_at):
        solve = functools.partial(self._solve, tol=tol, save_at=save_at)
        self.solve = jax.jit(solve)
        return self.solve(), len(save_at)

    def _solve(self, *, tol, save_at):
        asolver = ivpsolve.adaptive(self.solver, atol=tol, rtol=tol, control=self.ctrl)
        solution = ivpsolve.solve_adaptive_save_at(
            self.vf, self.init, save_at=save_at, dt0=0.01, adaptive_solver=asolver
        )
        key = jax.random.PRNGKey(1)
        posterior = stats.markov_select_terminal(solution.posterior)
        (qoi, _samples), (qoi_term, _) = stats.markov_sample(
            key, posterior, shape=(self.num_samples,), reverse=True
        )
        qoi = jnp.concatenate([qoi, qoi_term[..., None, :]], axis=-2)
        return save_at, qoi.mean(axis=0)


class RunnerTextbook:
    name = "AS"

    def __init__(self, vf, init, tspan, /, *, ode_order, num_derivs, num_samples):
        self.vf = vf
        self.num_samples = num_samples
        prior = ivpsolvers.prior_ibm(
            num_derivatives=num_derivs, ode_shape=(2,), implementation="isotropic"
        )
        ts0 = ivpsolvers.correction_ts0(ode_order=ode_order)
        strategy = ivpsolvers.strategy_smoother(prior, ts0)
        self.solver = ivpsolvers.solver(strategy)
        self.ctrl = ivpsolve.control_proportional_integral()
        t0, _ = tspan
        num = num_derivs + 1 - ode_order
        tcoeffs = taylor.odejet_padded_scan(lambda *y: vf(*y, t=t0), init, num=num)
        self.init = self.solver.initial_condition(tcoeffs, jnp.ones(()))
        self.solve = None

    def prepare_and_solve(self, *, tol, save_at):
        t0, t1 = save_at[0], save_at[-1]
        asolver = ivpsolve.adaptive(self.solver, atol=tol, rtol=tol, control=self.ctrl)
        adaptive_sol = ivpsolve.solve_adaptive_save_every_step(
            self.vf, self.init, t0=t0, t1=t1, dt0=0.01, adaptive_solver=asolver
        )
        grid = jnp.union1d(adaptive_sol.t, save_at)
        grid = jnp.sort(grid)
        solve = functools.partial(self._solve, grid=grid, save_at=save_at)
        self.solve = jax.jit(solve)
        return self.solve(), len(adaptive_sol.t) - 1

    def _solve(self, grid, save_at):
        solution = ivpsolve.solve_fixed_grid(
            self.vf, self.init, grid=grid, solver=self.solver
        )
        key = jax.random.PRNGKey(1)
        posterior = stats.markov_select_terminal(solution.posterior)
        (qoi, _samples), (qoi_term, _) = stats.markov_sample(
            key, posterior, shape=(self.num_samples,), reverse=True
        )
        qoi = jnp.concatenate([qoi, qoi_term[..., None, :]], axis=-2)
        _, _, indices = jnp.intersect1d(
            save_at, grid, size=len(save_at), return_indices=True
        )
        return save_at, qoi[:, indices, :].mean(axis=0)


def main(num_samples, tol_exponents, num_save_at=50):
    ivp = problems.three_body_restricted()

    results = {}
    i = 1
    for n in num_samples:
        for expo in tol_exponents:
            tol = 10.0 ** (-float(expo))
            tol_label = f"$10^{{-{int(expo)}}}$"
            checkpoint = RunnerCheckpoint(*ivp, ode_order=2, num_derivs=4, num_samples=n)
            textbook = RunnerTextbook(*ivp, ode_order=2, num_derivs=4, num_samples=n)

            results[i] = {"No. Samples": f"{n}", "Tolerance": tol_label}
            save_at = jnp.linspace(ivp[2][0], ivp[2][-1], num=num_save_at)
            for alg in [textbook, checkpoint]:
                _approx, nsteps = alg.prepare_and_solve(tol=tol, save_at=save_at)
                tm = harness.runtime_min(alg.solve, num_runs=3)
                if alg.name == "AS":
                    results[i]["No. steps"] = f"{int(nsteps):,}"
                results[i][f"Time (s): {alg.name}"] = f"{tm:.3f}"
                print(
                    f"alg={alg.name}, K={n}, tol={tol:.0e}, time={tm:.3f}s, "
                    f"nsteps={int(nsteps):,}",
                    flush=True,
                )
            i += 1
        print()

    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, "data_results.npy"), results, allow_pickle=True)
    print("Saved.")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, nargs="+", default=[5, 50, 500])
    p.add_argument("--tols", type=float, nargs="+", default=[4, 7, 10])
    p.add_argument("--save-at", type=int, default=50)
    args = p.parse_args()
    main(args.samples, args.tols, num_save_at=args.save_at)
