"""Experiment 2: work-precision on the rigid-body problem.

Port of /root/reference/experiments/2_workprec_simple/run_simple.py.
Algorithms: TS0(2)/TS0(4) x {checkpoint "jit loop", interpolate "jit step"}
vs native RK Bosh3/Tsit5; precision = RMSE at 5 checkpoints vs dopri8 at
1e-15 (reference :120-121); work = min/mean/std of timeit repeats; memory
proxy = #stored states.  Saves the reference's .npy schema.
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
    vf, u0, tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    solve_scipy = facade.asolve_scipy("LSODA", vf, tspan, atol=1e-13, rtol=1e-13)
    ts, ys = solve_scipy(u0, params)

    args = parse_arguments()
    print("\n", args, "\n")
    tols_short, tols = tolerances_from_args(args)
    time_fn = harness.timeit_fun(args.repeats)

    xs = jnp.linspace(jnp.amin(jnp.asarray(ts)), jnp.amax(jnp.asarray(ts)), num=5)
    dt0 = float(jnp.amax(jnp.asarray(ts)) - jnp.amin(jnp.asarray(ts)))
    u0_like = u0[0]

    @jax.jit
    def ts0_2(tol):
        tol = tol * 100
        fun = facade.solve(
            "ts0-2", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol
        )
        return fun(u0, params)

    @jax.jit
    def ts0_4(tol):
        tol = tol * 100
        fun = facade.solve(
            "ts0-4", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol
        )
        return fun(u0, params)

    def ts0_2_interp(tol):
        tol = (1e-3 if tol < 1e-8 else tol) * 100
        fun = facade.solve_via_interpolate(
            "ts0-2", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol
        )
        return fun(u0, params)

    def ts0_4_interp(tol):
        tol = (1e-3 if tol < 1e-8 else tol) * 100
        fun = facade.solve_via_interpolate(
            "ts0-4", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol
        )
        return fun(u0, params)

    @jax.jit
    def bosh3(tol):
        fun = facade.solve_rk("bosh3", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol)
        return fun(u0, params)

    @jax.jit
    def tsit5(tol):
        fun = facade.solve_rk("tsit5", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol)
        return fun(u0, params)

    @jax.jit
    def dopri8(tol):
        fun = facade.solve_rk("dopri8", vf, u0_like, xs, dt0=dt0, atol=1e-3 * tol, rtol=tol)
        return fun(u0, params)[0]

    algorithms = {
        "TS0(2) (jit step) via probabilistic": (tols_short, ts0_2_interp),
        "TS0(4) (jit step) via probabilistic": (tols_short, ts0_4_interp),
        "TS0(2) (jit loop) via probabilistic": (tols, ts0_2),
        "TS0(4) (jit loop) via probabilistic": (tols, ts0_4),
        "Bosh3() via rk": (tols, bosh3),
        "Tsit5() via rk": (tols, tsit5),
    }
    print("\n", list(algorithms.keys()), "\n")

    reference = dopri8(1e-15)
    precision = harness.rmse_absolute(reference)

    results = {}
    for label, (tols_, algo) in algorithms.items():
        print(label, flush=True)
        param_to_wp = harness.workprec(algo, precision_fun=precision, timeit_fun=time_fn)
        results[label] = param_to_wp(list(map(float, tols_)))

    if args.reverify:
        # Deterministic-output reproducibility check against the committed
        # data (the reference's standard: data the script next to it
        # reproduces, run_simple.py:133-136).  Timing columns are excluded
        # (machine-dependent); precision and the memory proxy are exact
        # functions of the accept/reject sequence, so any numerics change
        # that flips a step shows up here.
        import numpy as np

        here = os.path.dirname(__file__)
        committed = np.load(
            os.path.join(here, "data_results.npy"), allow_pickle=True
        ).item()
        ok = True
        for label, got in results.items():
            want = committed[label]
            for key in ("precision", "length_of_longest_vector", "list_of_args"):
                same = np.allclose(
                    np.asarray(got[key], dtype=float),
                    np.asarray(want[key], dtype=float),
                    rtol=1e-12,
                )
                ok &= same
                print(f"reverify {label!r} {key}: {'MATCH' if same else 'MISMATCH'}")
                if not same:
                    print("  got :", np.asarray(got[key]))
                    print("  want:", np.asarray(want[key]))
        print("REVERIFY", "OK" if ok else "FAILED")
        raise SystemExit(0 if ok else 1)

    if args.nosave:
        print("\nSkipped saving.\n")
    else:
        here = os.path.dirname(__file__)
        jnp.save(os.path.join(here, "data_results.npy"), results, allow_pickle=True)
        jnp.save(os.path.join(here, "data_ts.npy"), ts)
        jnp.save(os.path.join(here, "data_ys.npy"), ys)
        jnp.save(os.path.join(here, "data_checkpoints.npy"), xs)
        print("\nSaving successful.\n")


def parse_arguments() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--start", type=int, default=3)
    parser.add_argument("--stop", type=int, default=10)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--nosave", action=argparse.BooleanOptionalAction)
    parser.add_argument(
        "--reverify",
        action="store_true",
        help="compare deterministic outputs to committed data instead of saving",
    )
    return parser.parse_args()


def tolerances_from_args(arguments, /):
    n0, n1 = arguments.start, arguments.stop
    n1_short = n0 + (1 + n1 - n0) * 2 // 3
    tols_ = 0.1 ** jnp.arange(n0, n1, step=1.0)
    tols_short_ = 0.1 ** jnp.arange(n0, n1_short, step=1.0)
    return tols_short_, tols_


if __name__ == "__main__":
    main()
