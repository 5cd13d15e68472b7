"""Experiment 3: work-precision on Pleiades (14-dim, 2nd order).

Port of /root/reference/experiments/3_workprec_harder/run_harder.py.
Probabilistic solvers run the SECOND-ORDER form directly (ode_order=2,
reference :42-60); RK baselines integrate the 1st-order reduction.
Precision yardstick: dopri5 at 1e-15 on the 1st-order form (reference :85).
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import facade, harness, problems  # noqa: E402


def main():
    vf2, u0_2nd, tspan = problems.pleiades_2nd()
    vf1, u0_1st, _tspan, _args = problems.pleiades_1st()

    args = parse_arguments()
    print("\n", args, "\n")
    n0, n1 = args.start, args.stop
    tols = 0.1 ** jnp.arange(n0, n1, step=1.0)
    time_fn = harness.timeit_fun(args.repeats)

    xs = jnp.linspace(*tspan, num=50)
    dt0 = 0.1
    u0_like_2nd = u0_2nd[0]
    u0_like_1st = u0_1st[0]

    def prob_solver(num_derivatives):
        @jax.jit
        def algo(tol):
            tol10 = tol * 10  # reference's x10 shift for prob solvers (:45)
            fun = facade.solve(
                f"ts0-{num_derivatives}",
                vf2,
                u0_like_2nd,
                xs,
                dt0=dt0,
                atol=1e-3 * tol10,
                rtol=tol10,
                ode_order=2,
                # residual-unit error control reproduces the reference's
                # step-density (and its high-accuracy regime) on Pleiades
                error_unit=args.error_unit,
            )
            return fun(u0_2nd, ())

        return algo

    def rk_solver(method):
        @jax.jit
        def algo(tol):
            fun = facade.solve_rk(
                method, vf1, u0_like_1st, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol
            )
            u, aux = fun(u0_1st, ())
            return u[:, :14], aux  # positions only

        return algo

    def nystrom_solver(method):
        # 2nd-order-structure baseline beyond the reference's competitor set:
        # integrates u'' = f(u) directly (1/3 force evals per step of the
        # reduction's dopri5). Nystrom contract is a position-only force.
        def vf_pos(u, *, t=None, p=()):
            return vf2(u, jnp.zeros_like(u), t=t, p=p)

        @jax.jit
        def algo(tol):
            fun = facade.solve_nystrom(
                method, vf_pos, u0_like_2nd, xs, dt0=dt0, atol=1e-3 * tol,
                rtol=tol,
            )
            return fun(u0_2nd, ())

        return algo

    algorithms = {
        "Prob(3) via probabilistic": (tols, prob_solver(3)),
        "Prob(5) via probabilistic": (tols, prob_solver(5)),
        "Prob(8) via probabilistic": (tols, prob_solver(8)),
        "Bosh3() via rk": (tols, rk_solver("bosh3")),
        "Tsit5() via rk": (tols, rk_solver("tsit5")),
        "Dopri8() via rk": (tols, rk_solver("dopri8")),
        "Yoshida4() via nystrom": (tols, nystrom_solver("yoshida4")),
    }
    print("\n", list(algorithms.keys()), "\n")

    if args.only:
        wanted = [s.strip().lower() for s in args.only.split(",")]
        algorithms = {
            k: v for k, v in algorithms.items()
            if any(s in k.lower() for s in wanted)
        }
        print(f"--only: restricted to {list(algorithms)}", flush=True)

    reference = rk_solver("dopri5")(1e-15)[0]
    precision = harness.rmse_absolute(reference)

    here = pathlib.Path(__file__).parent
    partial_path = here / f"data_results.partial{args.partial_suffix}.npy"
    results = {}
    if args.resume and partial_path.exists():
        import numpy as np

        results = np.load(partial_path, allow_pickle=True).item()
        print(f"resumed {len(results)} completed algorithms: {list(results)}")
    for label, (tols_, algo) in algorithms.items():
        if label in results:
            print(label, "(resumed)", flush=True)
            continue
        print(label, flush=True)
        wp = harness.workprec(algo, precision_fun=precision, timeit_fun=time_fn)
        results[label] = wp(list(map(float, tols_)))
        if not args.nosave:
            # incremental flush: a killed run keeps its completed rows
            # (round-4 regen died after hours with nothing saved)
            jnp.save(partial_path, results, allow_pickle=True)

    if args.nosave or args.only:
        # --only runs feed their partial file; the full data_results.npy is
        # assembled only by a complete (unfiltered) run or an explicit merge
        print("\nSkipped saving (partial-only run).\n"
              if args.only else "\nSkipped saving.\n")
    else:
        jnp.save(here / "data_results.npy", results, allow_pickle=True)
        jnp.save(here / "data_checkpoints.npy", xs)
        partial_path.unlink(missing_ok=True)
        print("\nSaving successful.\n")


def parse_arguments() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--start", type=int, default=3)
    parser.add_argument("--stop", type=int, default=10)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--only", type=str, default=None,
                        help="comma-separated substrings: run only matching "
                             "algorithms, write only the partial file (used "
                             "to farm cheap rows in a side process while a "
                             "slow row computes)")
    parser.add_argument("--partial-suffix", type=str, default="",
                        help="suffix for the partial filename so two "
                             "processes never race on one file")
    parser.add_argument("--nosave", action=argparse.BooleanOptionalAction)
    parser.add_argument("--error-unit", choices=["qoi", "residual"], default="residual")
    parser.add_argument("--resume", action="store_true",
                        help="skip algorithms already in data_results.partial.npy")
    return parser.parse_args()


if __name__ == "__main__":
    main()
