"""Parallel-in-time wall-clock crossover on TPU (ROADMAP #4).

The round-2c measurement (rigid body, f64, T=512/win16: seq 0.14 s vs par
2.0 s) ran the sweep in the regime where parallel-in-time CANNOT win: with
window w and k re-linearization iterations the sweep's sequential depth is
(T/w) * k * log2(w) combine levels vs the sequential filter's T steps --
at w=16, k=8 that is ~8 levels per step, each level more expensive than a
step.  The winning regime (round 3, measured on CPU first):

* LARGE windows, bounded by TIME SPAN not step count: the window
  re-linearization iteration contracts only while the window spans ~1
  Lipschitz time of the dynamics (rigid body: ~1 time unit); past that it
  diverges at any grid resolution and the ``fallback_rtol`` gate serializes
  the window.  So the crossover needs FINE grids: T=16385 over [0, 10]
  puts 1024 steps inside 0.6 time units.
* FEW iterations via the RK warm start -- and a STRIDED warm start
  (``warmstart="rk:16"``), because the stride-1 RK4 scan is itself a
  T-deep sequential chain that would cap the achievable speedup.
* The per-window sigma floor (sqrt(eps) * sigma_max) that keeps the f32
  combines non-singular once the warm start is rounding-level accurate.

Net sequential depth: T/16 (strided warm start) + (T/w) * k * log2(w)
levels vs T steps -- ~10x fewer for w=1024, k=2.

This script measures exactly that: rigid body (reference problem family,
/root/reference/experiments/2_workprec_simple/run_simple.py) on fixed grids
T in {4097, 16385}, TPU float32 (the native dtype; the deviation form keeps
f32 viable), sequential `solve_fixed_grid` vs `parallel=True` across
window/iteration settings, median-of-5 wall-clock after a warmup call, plus
the max relative deviation of the parallel solution from the sequential one
on the same grid.

Usage: python pit_crossover.py [--reps 5]
Writes data_pit_crossover.json next to this script.
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
# Persistent compile cache: retries after a relay timeout reuse compiles.
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[2]
                      / ".jax_compcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import harness, ivpsolve, ivpsolvers, problems, taylor  # noqa: E402


def _build(nu=3):
    vf_p, u0s, tspan, params = problems.rigid_body(time_span=(0.0, 10.0))

    def vf(u, *, t):
        return vf_p(u, t=t, p=params)

    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoef = taylor.odejet_padded_scan(lambda u: vf(u, t=tspan[0]), u0s, num=nu)
    init = solver.initial_condition(tcoef, 1.0)
    return vf, init, tspan, solver


def _time(fn, *args, reps):
    # device_sync, not bare block_until_ready: the axon relay pipelines
    # dispatches, and small-output programs "complete" instantly under
    # block_until_ready (first committed run of this script recorded the
    # T=4097 sequential solve at 0.08 ms; a host read shows 106 ms)
    out = fn(*args)
    harness.device_sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        harness.device_sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sizes", type=int, nargs="*", default=[4097, 16385])
    args = ap.parse_args(argv)

    vf, init, tspan, solver = _build()
    results = []
    path = pathlib.Path(__file__).parent / "data_pit_crossover.json"

    def _flush():
        out = {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "results": results,
        }
        path.write_text(json.dumps(out, indent=2))
        return out

    for t_n in args.sizes:
        grid = jnp.linspace(tspan[0], tspan[1], t_n, dtype=jnp.float32)
        init32 = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a,
            init,
        )

        seq = jax.jit(
            lambda g, i: ivpsolve.solve_fixed_grid(vf, i, grid=g, solver=solver)
        )
        t_seq, sol_seq = _time(seq, grid, init32, reps=args.reps)
        u_seq = np.asarray(sol_seq.u)
        print(f"T={t_n}  sequential: {t_seq * 1e3:9.2f} ms")
        results.append(
            {"T": t_n, "mode": "sequential", "time_s": t_seq}
        )
        _flush()

        for window, iters, warm, engine in [
            (512, 2, "rk:16", None),
            (512, 2, "rk:16", "ll"),
            (512, 2, "rk:16", "ll-scan"),
            (512, 2, "rk:16", "pallas"),
            (1024, 2, "rk:16", None),
            (1024, 2, "rk:16", "ll"),
            (1024, 2, "rk:16", "ll-scan"),
            (1024, 2, "rk:16", "pallas"),
            (1024, 2, "rk", None),
            (2048, 2, "rk:16", None),
            (2048, 2, "rk:16", "ll"),
            (2048, 2, "rk:16", "ll-scan"),
            (2048, 2, "rk:16", "pallas"),
        ]:
            if window >= t_n:
                continue

            def par(g, i, _w=window, _k=iters, _ws=warm, _e=engine):
                return ivpsolve.solve_fixed_grid(
                    vf, i, grid=g, solver=solver, parallel=True,
                    window=_w, iterations=_k, warmstart=_ws, form="sqrt",
                    combine_engine=_e,
                )

            try:
                t_par, sol_par = _time(
                    jax.jit(par), grid, init32, reps=args.reps
                )
            except Exception as e:  # e.g. a Mosaic lowering fault on-chip
                print(
                    f"T={t_n}  parallel w={window:5d} combine={engine or 'scan'}"
                    f": FAILED {type(e).__name__}: {str(e)[:120]}",
                    flush=True,
                )
                results.append(
                    {
                        "T": t_n,
                        "mode": "parallel",
                        "window": window,
                        "iterations": iters,
                        "warmstart": warm,
                        "combine_engine": engine,
                        "error": f"{type(e).__name__}: {str(e)[:300]}",
                    }
                )
                _flush()
                continue
            rel = float(
                np.max(np.abs(np.asarray(sol_par.u) - u_seq))
                / max(np.max(np.abs(u_seq)), 1e-30)
            )
            ratio = t_seq / t_par
            print(
                f"T={t_n}  parallel w={window:5d} k={iters} warm={warm} "
                f"combine={engine or 'scan'}: "
                f"{t_par * 1e3:9.2f} ms  seq/par={ratio:5.2f}x  rel={rel:.2e}",
                flush=True,
            )
            results.append(
                {
                    "T": t_n,
                    "mode": "parallel",
                    "window": window,
                    "iterations": iters,
                    "warmstart": warm,
                    "combine_engine": engine,
                    "time_s": t_par,
                    "speedup_vs_seq": ratio,
                    "rel_vs_seq": rel,
                }
            )
            _flush()

    out = _flush()
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
