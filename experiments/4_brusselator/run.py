"""Experiment 4: Brusselator memory scaling -- the paper's headline result.

Port of /root/reference/experiments/4_brusselator/run.py.  For N = 2..512
(state dim 2N) at tol 1e-8 with a TS0(4) isotropic fixedpoint solver:

* count adaptive steps via ``solve_adaptive_terminal_values`` (O(1) memory);
* estimate the textbook smoother's memory as steps x 3-copy state size and
  run it only if the estimate fits (reference :100-116);
* run the checkpoint (fixedpoint save_at, 200 points) solver always --
  its memory is O(200) regardless of the step count (reference :119-138).

Runtimes include compilation (caches cleared), like the reference (:19,81).
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_enable_compilation_cache", False)

import jax.flatten_util  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import harness, ivpsolve, ivpsolvers, problems, taylor  # noqa: E402


def main(powers, memory_limit_mb=4000, textbook=True):
    results_checkpoint = {k: [] for k in ["N", "runtime", "memory", "ts", "ys", "num_steps"]}
    results_textbook = {k: [] for k in ["N", "runtime", "memory", "ts", "ys", "num_steps"]}

    for N in [int(2**p) for p in powers]:
        vf, u0, (t0, t1), params = problems.brusselator(N=N)
        num = 4
        tol = 1e-8
        prior = ivpsolvers.prior_ibm(
            num_derivatives=num, ode_shape=(2 * N,), implementation="isotropic"
        )
        ts0 = ivpsolvers.correction_ts0(ode_order=1)
        strategy = ivpsolvers.strategy_fixedpoint(prior, ts0)
        solver = ivpsolvers.solver_dynamic(strategy)
        ctrl = ivpsolve.control_proportional_integral()
        adaptive_solver = ivpsolve.adaptive(solver, atol=tol, rtol=tol, control=ctrl)

        tcoeffs = taylor.odejet_unroll(lambda *y: vf(*y, t=t0, p=params), u0, num=num)
        init = solver.initial_condition(tcoeffs, 1.0)

        print(f"\nFor N={N}:")
        num_copies = 3  # step_from, interpolate_from, current (reference :69-71)
        size_init = num_copies * jax.flatten_util.ravel_pytree(init)[0].nbytes

        # Step count without storing anything
        jax.clear_caches()
        solve_terminal = jax.jit(
            ivpsolve.solve_adaptive_terminal_values,
            static_argnums=0,
            static_argnames=["adaptive_solver"],
        )
        count0 = time.perf_counter()
        solution = solve_terminal(
            vf, init, t0=t0, t1=t1, dt0=0.01, adaptive_solver=adaptive_solver
        )
        jax.block_until_ready(solution.u)
        count1 = time.perf_counter() - count0
        nsteps = int(solution.num_steps)
        total_memory = nsteps * size_init / 1024**2
        print(f"\tBaseline: {nsteps:,} steps ({int(total_memory):,} MB est.) in {count1:.1f}s")
        results_textbook["N"].append(N)
        results_textbook["memory"].append(total_memory)
        results_textbook["num_steps"].append(nsteps)

        if textbook and total_memory < memory_limit_mb:
            strategy_ = ivpsolvers.strategy_smoother(prior, ts0)
            solver_ = ivpsolvers.solver_dynamic(strategy_)
            adaptive_solver_ = ivpsolve.adaptive(solver_, atol=tol, rtol=tol, control=ctrl)
            jax.clear_caches()
            count0 = time.perf_counter()
            solution = ivpsolve.solve_adaptive_save_every_step(
                vf, init, t0=t0, t1=t1, dt0=0.01, adaptive_solver=adaptive_solver_
            )
            jax.block_until_ready(solution.u)
            count1 = time.perf_counter() - count0
            size_sol = harness.nbytes_of_tree(solution) / 1024**2
            print(f"\tTextbook solver: {count1:.1f}s using {int(size_sol):,} MB")
            results_textbook["runtime"].append(count1)

        save_at = jnp.linspace(t0, t1, num=200)
        jax.clear_caches()
        count0 = time.perf_counter()
        solve_save_at = jax.jit(
            ivpsolve.solve_adaptive_save_at,
            static_argnums=0,
            static_argnames=["adaptive_solver"],
        )
        solution = solve_save_at(
            vf, init, save_at=save_at, dt0=0.01, adaptive_solver=adaptive_solver
        )
        jax.block_until_ready(solution.u)
        count1 = time.perf_counter() - count0
        print(f"\tCheckpoint solver: {count1:.1f}s")
        results_checkpoint["N"].append(N)
        results_checkpoint["runtime"].append(count1)
        results_checkpoint["memory"].append(len(save_at) * size_init / 1024**2)
        results_checkpoint["ts"].append(solution.t)
        results_checkpoint["ys"].append(solution.u)
        results_checkpoint["num_steps"].append(int(jnp.amax(solution.num_steps)))

    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, "data_checkpoint.npy"), results_checkpoint, allow_pickle=True)
    jnp.save(os.path.join(here, "data_textbook.npy"), results_textbook, allow_pickle=True)
    print("\nSaved.")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--max-power", type=float, default=9.0, help="largest N = 2^p")
    p.add_argument("--min-power", type=float, default=1.0)
    p.add_argument("--memory-limit-mb", type=float, default=4000.0)
    p.add_argument("--no-textbook", action="store_true")
    args = p.parse_args()
    powers = jnp.arange(args.min_power, args.max_power + 0.5, step=1.0)
    main(powers, memory_limit_mb=args.memory_limit_mb, textbook=not args.no_textbook)
