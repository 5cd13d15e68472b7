"""STIFF parallel-in-time wall-clock on TPU (VERDICT round-3 #1).

Workload: the reference's flagship stiff problem — Van der Pol mu=1e3,
TS1(4, ode_order=2), dense backend, solved on ITS OWN adaptive grid
(/root/reference/experiments/1_van_der_pol/vdp.py:73-103: discover the
accepted grid adaptively, then re-solve on that fixed grid).  Round 3 left
this leg correct-but-serial: windows at the fast relaxation transitions
tripped the per-window sequential fallback.  Round 4 removed the two actual
blockers (the explicit RK4 warm start exploding on slow-manifold steps, and
fixed sweep counts under-iterating transition windows — see
parallel_time.py's module docstring), so the stiff re-solve now converges
in EVERY window and the wall-clock question can be asked.

What is timed (both stages of ``solve_adaptive_parallel_in_time``'s
contract, on one TPU chip, deviation + PER-STEP-preconditioned sqrt
elements).  Default dtype is FLOAT64 (x64 emulation on chip, both arms):
float64 is the legitimate precision class for this workload -- an rtol
1e-6 stiff solve needs sub-1e-6 relative resolution, and the f32
sequential solve on this grid measures 1.25e-2 relative vs f64 (phase
error amplified through the relaxation jumps).  ``--dtype f32`` still
runs: the qr_r magnitude normalization (round 4) keeps it finite, the
per-step preconditioning converges the narrow windows, and the hardened
divergence gate diverts stalled transition windows to the per-window
sequential fallback -- correct but only partially parallel; recorded for
completeness.

* ``sequential``: the plain `solve_fixed_grid` re-solve on the discovered
  grid — the baseline BOTH workflows pay today.
* ``parallel``: the PIT re-solve with the DISCOVERY warm start (the
  grid-discovery filter pass's extrapolated means, free in the adaptive
  workflow — the adaptive driver reuses them the same way) across
  window / iteration_tol settings, plus grid-only warm starts
  (``sie:<s>``) for the fixed-grid-given-no-discovery scenario.

The discovery pass itself runs once in a CPU float64 subprocess (the
controller's step selection at rtol<=1e-5 is below f32 resolution; on real
deployments it runs as the bounded on-device filter exactly like
`solve_adaptive_parallel_in_time` does) and is NOT part of the timed
comparison: it is common to both arms.

Each parallel row records the per-window divergence diagnostics — the
committed claim is wall-clock AND zero sequential-fallback windows.

Usage: python pit_stiff.py [--reps 5] [--rtol 1e-6]
Writes data_pit_stiff.json next to this script.
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

GRID_CACHE = "/tmp/pit_stiff_grid_v2_{rtol:.0e}.npy"
REFINE_CACHE = "/tmp/pit_stiff_grid_v2_{rtol:.0e}_r{r}.npy"


def discover_grid(rtol):
    """CPU x64 subprocess: VdP mu=1e3 adaptive filter pass -> accepted grid
    + the discovery warm start (extrapolated filtered means)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from odecheckpts_tpu import ivpsolve, ivpsolvers, problems, taylor

    vf, (u0, du0), _ts = problems.van_der_pol(mu=1000.0)
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
    asolver = ivpsolve.adaptive(solver, atol=1e-3 * rtol, rtol=rtol)
    sol_f, (valid, _tail) = ivpsolve.solve_adaptive_save_every_step_bounded(
        vf, init, t0=0.0, t1=6.3, dt0=0.01, adaptive_solver=asolver,
        max_steps=2**14,
    )
    valid_np = np.asarray(valid)
    ts = np.asarray(sol_f.t)[valid_np]
    if ts[-1] < 6.3:
        ts = np.concatenate([ts, [6.3]])
    grid = jnp.asarray(ts)
    ssm = solver.ssm
    means_f = np.asarray(sol_f.posterior.init.mean)[valid_np]
    m_prev = jnp.asarray(means_f[: len(ts) - 1])
    warm = jax.vmap(lambda m, dt: ssm.extrapolate_mean(m, dt)[0])(
        m_prev, jnp.diff(grid)
    )
    np.save(
        GRID_CACHE.format(rtol=rtol),
        # m_prev: the filtered means at the interval left endpoints -- the
        # --refine mode re-extrapolates the warm start onto sub-steps
        {"grid": np.asarray(grid), "warm": np.asarray(warm),
         "m_prev": np.asarray(m_prev)},
        allow_pickle=True,
    )
    print(f"discovered grid: {len(ts)} points, dt in "
          f"[{np.min(np.diff(ts)):.2e}, {np.max(np.diff(ts)):.2e}]")


def refine_grid(rtol, r):
    """CPU x64 subprocess: subdivide each adaptive interval into ``r``
    uniform sub-steps and re-extrapolate the discovery warm start onto
    every sub-point (same construction as the unrefined warm start: the
    prediction from the owning interval's left filtered mean)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from odecheckpts_tpu import ivpsolvers

    blob = np.load(GRID_CACHE.format(rtol=rtol), allow_pickle=True).item()
    g = np.asarray(blob["grid"], np.float64)
    m_prev = jnp.asarray(blob["m_prev"])
    dts = np.diff(g)
    sub = (g[:-1, None] + dts[:, None] * (np.arange(r) / r)).reshape(-1)
    grid = np.concatenate([sub, g[-1:]])
    prior = ivpsolvers.prior_ibm(
        num_derivatives=4, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    ssm = ivpsolvers.solver_dynamic(strat).ssm
    offs = jnp.asarray(dts[:, None] * (np.arange(1, r + 1) / r))
    warm = jax.vmap(
        lambda m, off: jax.vmap(lambda o: ssm.extrapolate_mean(m, o)[0])(off)
    )(m_prev, offs)
    warm = np.asarray(warm).reshape((-1,) + np.asarray(m_prev).shape[1:])
    assert len(warm) == len(grid) - 1, (warm.shape, grid.shape)
    np.save(
        REFINE_CACHE.format(rtol=rtol, r=r),
        {"grid": grid, "warm": warm},
        allow_pickle=True,
    )
    print(f"refined grid: {len(g)} -> {len(grid)} points (r={r})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--dtype", choices=["f64", "f32"], default="f64")
    ap.add_argument("--discover", action="store_true")
    ap.add_argument("--refine-prep", action="store_true",
                    help="(internal) CPU subprocess step of --refine")
    ap.add_argument("--windows", type=int, nargs="*", default=None,
                    help="restrict the parallel configs to these windows")
    ap.add_argument("--itol", type=float, default=None,
                    help="override the per-window iteration tolerance")
    ap.add_argument("--iters", type=int, default=None,
                    help="override the sweep cap.  Fallback windows pay "
                         "BOTH the capped sweeps and the in-window "
                         "sequential re-solve, so on fallback-heavy "
                         "configs a lower cap trims the wasted sweeps")
    ap.add_argument("--engines", nargs="*", default=None,
                    choices=["scan", "ll", "ll-scan"],
                    help="restrict the combine engines.  'll-scan' (round "
                         "5) puts the Kogge-Stone levels under lax.scan: "
                         "9.2k jaxpr eqns vs 70-86k for 'scan'/'ll' at "
                         "these shapes, window-independent — the only one "
                         "whose x64 relay compile is not the bottleneck")
    ap.add_argument("--refine", type=int, default=1,
                    help="subdivide each adaptive interval into this many "
                         "uniform sub-steps.  The adaptive grid's POINT "
                         "density is proportional to local stiffness, so "
                         "uniform-index windows concentrate whole "
                         "relaxation transitions into single windows -- "
                         "the regime where the affine iteration diverges "
                         "(measured 8/10 fallbacks at w=256 on the raw "
                         "2337-pt grid).  Refining r-fold shrinks each "
                         "window's TIME span r-fold (convergence "
                         "restored) while the sequential arm pays r-fold "
                         "more steps: the 'grid size where PIT wins' "
                         "experiment, matching the reference's fixed-"
                         "accurate-grid workload "
                         "(/root/reference/experiments/1_van_der_pol/"
                         "vdp.py:83-103, 743k uniform steps)")
    ap.add_argument("--calibrate", choices=["dynamic", "none"],
                    default="dynamic",
                    help="'none' drops the dynamic output-scale sigma.  On "
                         "a FIXED grid the per-step sigma cancels exactly "
                         "in the zero-noise Kalman gain, so the u "
                         "trajectory is unchanged -- but sigma itself "
                         "reaches ~1e15 on stiff VdP, and this chip's "
                         "emulated f64 has F32 RANGE (measured: (1e25)^2 "
                         "= NaN on device, probe_range round 5): sigma-"
                         "weighted factor products overflow it.  'none' "
                         "is the range-safe stiff leg; parity is checked "
                         "against the CPU f64 oracle as always")
    ap.add_argument("--out", default="data_pit_stiff.json",
                    help="output JSON filename (next to this script); "
                         "refined runs should use their own file -- the "
                         "config guard refuses mixed grid_points")
    ap.add_argument("--skip-sequential", action="store_true",
                    help="reuse a committed sequential row instead of "
                         "re-measuring it (saves one x64 relay compile "
                         "on retries after a timeout)")
    args = ap.parse_args(argv)

    if args.discover:
        discover_grid(args.rtol)
        return None
    if args.refine_prep:
        refine_grid(args.rtol, args.refine)
        return None

    cache = pathlib.Path(GRID_CACHE.format(rtol=args.rtol))
    if not cache.exists():
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, __file__, "--discover", "--rtol", str(args.rtol)],
            check=True, env=env,
        )
    if args.refine > 1:
        rcache = pathlib.Path(
            REFINE_CACHE.format(rtol=args.rtol, r=args.refine)
        )
        if not rcache.exists():
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            subprocess.run(
                [sys.executable, __file__, "--refine-prep",
                 "--refine", str(args.refine), "--rtol", str(args.rtol)],
                check=True, env=env,
            )
        cache = rcache

    import jax

    if os.environ.get("ODECKPT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ODECKPT_PLATFORM"])
    # Persistent compile cache: the x64-emulated PIT programs cost tens of
    # minutes of relay compile; a timed-out retry should not pay them twice.
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parents[2] / ".jax_compcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from odecheckpts_tpu import (  # noqa: E402
        harness, ivpsolve, ivpsolvers, problems, taylor,
    )

    blob = np.load(cache, allow_pickle=True).item()
    grid64, warm64 = blob["grid"], blob["warm"]
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
        fdt = jnp.float64
        grid = jnp.asarray(grid64)
        warm = jnp.asarray(warm64)
        print(f"grid: {len(grid64)} pts (f64)")
    else:
        # f32 time grid: drop steps narrower than the f32 quantum at t~6.3
        # (rtol 1e-6 grids bottom out at dt ~ 1e-5, ~20x above it)
        fdt = jnp.float32
        grid32 = np.asarray(grid64, np.float32)
        keep = np.concatenate([[True], np.diff(grid32) > 0])
        grid = jnp.asarray(grid32[keep])
        warm = jnp.asarray(np.asarray(warm64, np.float32)[keep[1:]])
        print(f"grid: {len(grid64)} pts (f64) -> {int(keep.sum())} pts (f32)")

    vf, (u0, du0), _ts = problems.van_der_pol(mu=1000.0)
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = (ivpsolvers.solver_dynamic(strat)
              if args.calibrate == "dynamic"
              else ivpsolvers.solver(strat))
    tco = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=fdt(0.0)), (fdt(u0), fdt(du0)), num=nu - 1
    )
    init = solver.initial_condition(tco, fdt(1.0))

    def _time(fn, *fargs):
        out = fn(*fargs)
        harness.device_sync(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*fargs)
            harness.device_sync(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), out

    results = []
    path = pathlib.Path(__file__).parent / args.out
    problem_str = (
        "van_der_pol mu=1e3, TS1(4, ode_order=2), dense, "
        "adaptive grid rtol=%g" % args.rtol
        + (", refine=%d" % args.refine if args.refine > 1 else "")
        + (", calibrate=none" if args.calibrate == "none" else "")
    )

    def _flush():
        out = {
            "problem": problem_str,
            "dtype": args.dtype,
            "grid_points": int(len(np.asarray(grid))),
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "results": results,
        }
        path.write_text(json.dumps(out, indent=2))
        return out

    def _cpu_oracle():
        """Sequential re-solve on the host CPU (x64): the parity yardstick
        when the device arm's own output cannot serve as one."""
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            seq_cpu = jax.jit(
                lambda g, i: ivpsolve.solve_fixed_grid(vf, i, grid=g,
                                                       solver=solver)
            )
            return np.asarray(
                seq_cpu(jax.device_put(grid, cpu),
                        jax.device_put(init, cpu)).u
            )

    done = set()
    if args.skip_sequential and path.exists():
        prior_blob = json.loads(path.read_text())
        # Refuse to mix rows from a different problem configuration (ADVICE
        # r4): a retry with a different --rtol/--dtype would otherwise compute
        # speedup_vs_seq against a sequential time measured on another
        # problem and write a merged file whose header misdescribes the
        # carried-over rows.
        for key, want in [
            ("problem", problem_str),
            ("dtype", args.dtype),
            ("grid_points", int(len(np.asarray(grid)))),
        ]:
            got = prior_blob.get(key)
            if got != want:
                raise SystemExit(
                    f"--skip-sequential: prior {path.name} has {key}={got!r} "
                    f"but this run wants {want!r}; re-run without "
                    f"--skip-sequential (or move the old file aside)"
                )
        prior_rows = prior_blob["results"]
        seq_rows = [r for r in prior_rows if r["mode"] == "sequential"]
        assert seq_rows, "--skip-sequential needs a committed sequential row"
        results.extend(prior_rows)  # keep earlier partial rows too
        # Configs already measured successfully are not re-run (ADVICE r4:
        # blind append duplicated rows for the same config).
        done = {
            (r.get("window"), r.get("combine_engine"),
             r.get("iteration_tol"), r.get("warmstart"))
            for r in prior_rows
            if r["mode"] == "parallel" and "time_s" in r
        }
        t_seq = seq_rows[0]["time_s"]
        # parity oracle on the host CPU (compile is cheap there; the chip
        # row's accuracy was already checked when it was measured).  NB the
        # deprecated jit(backend=...) arg is avoided: commit the inputs to a
        # CPU device instead.  Oracle provenance is recorded per row.
        u_seq = _cpu_oracle()
        oracle_src = "cpu-recomputed"
        print(f"sequential: {t_seq * 1e3:9.2f} ms (reused committed row; "
              f"oracle recomputed on cpu)", flush=True)
    else:
        seq = jax.jit(
            lambda g, i: ivpsolve.solve_fixed_grid(vf, i, grid=g,
                                                   solver=solver)
        )
        t_seq, sol_seq = _time(seq, grid, init)
        u_seq = np.asarray(sol_seq.u)
        oracle_src = "device"
        # Round 4 only ever TIMED this arm; validate it.  If the on-chip
        # x64 sequential solve is itself non-finite, every parallel row's
        # rel would inherit the NaN -- swap in the CPU oracle and say so.
        n_bad = int((~np.isfinite(u_seq)).sum())
        seq_row = {"mode": "sequential", "time_s": t_seq,
                   "nonfinite_points": n_bad}
        print(f"sequential: {t_seq * 1e3:9.2f} ms"
              + (f"  NONFINITE u at {n_bad}/{u_seq.size} points"
                 if n_bad else ""), flush=True)
        if n_bad:
            u_seq = _cpu_oracle()
            oracle_src = "cpu-recomputed (device sequential non-finite)"
        results.append(seq_row)
        _flush()

    itol = args.itol or (1e-8 if args.dtype == "f64" else 1e-5)
    # Big windows first: sequential depth is O(T/w * sweeps * log w), so on a
    # one-chip run only w >= ~256 has a shot at beating the sequential scan
    # (w=16 means ceil(T/16) sequentially processed windows).  A partial run
    # (relay flakiness) should leave the informative rows behind.
    for window, iters_cfg, warmkind, engine in [
        (1024, 36, "discovery", "ll-scan"),
        (512, 36, "discovery", "ll-scan"),
        (256, 36, "discovery", "ll-scan"),
        (2048, 36, "discovery", "ll-scan"),
        (64, 36, "discovery", "ll-scan"),
        (1024, 36, "discovery", "ll"),
        (1024, 36, "discovery", None),
        (2048, 36, "discovery", "ll"),
        (512, 36, "discovery", "ll"),
        (512, 36, "discovery", None),
        (256, 36, "discovery", "ll"),
        (256, 36, "discovery", None),
        (16, 36, "discovery", None),
    ]:
        if window >= len(np.asarray(grid)):
            continue
        if args.windows is not None and window not in args.windows:
            continue
        if args.engines is not None and (engine or "scan") not in args.engines:
            continue
        iters = args.iters if args.iters is not None else iters_cfg
        if (window, engine, itol, warmkind) in done:
            print(f"skip w={window} combine={engine or 'scan'}: already in "
                  f"prior rows", flush=True)
            continue

        # ONE compiled program for timing AND diagnostics: the per-window
        # divergence flags are scalar byproducts of the sweeps already run
        # (no extra compute worth naming), and the x64-emulated PIT programs
        # cost tens of relay-compile minutes EACH — a separate untimed
        # diagnostics variant doubled that and caused the round-4 timeouts.
        def par(g, i, wm, _w=window, _k=iters, _t=itol, _wk=warmkind,
                _e=engine):
            return ivpsolve.solve_fixed_grid(
                vf, i, grid=g, solver=solver, parallel=True,
                window=_w, iterations=_k, iteration_tol=_t,
                warmstart=(wm if _wk == "discovery" else _wk),
                form="sqrt", combine_engine=_e, return_diagnostics=True,
            )

        label = (f"w={window:5d} k<={iters} itol={itol:g} warm={warmkind} "
                 f"combine={engine or 'scan'}")
        try:
            t_par, (sol_par, diag) = _time(jax.jit(par), grid, init, warm)
        except Exception as e:
            print(f"parallel {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            results.append({
                "mode": "parallel", "window": window, "iterations": iters,
                "iteration_tol": itol, "warmstart": warmkind,
                "combine_engine": engine,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            })
            _flush()
            continue
        rel = float(
            np.max(np.abs(np.asarray(sol_par.u) - u_seq))
            / max(np.max(np.abs(u_seq)), 1e-30)
        )
        n_div = int(np.asarray(diag["window_diverged"]).sum())
        n_win = int(diag["num_windows"])
        fin_w = np.asarray(diag.get("window_finite", np.ones(n_win, bool)))
        bad_w = np.flatnonzero(~fin_w).tolist()
        ratio = t_seq / t_par
        print(
            f"parallel {label}: {t_par * 1e3:9.2f} ms  "
            f"seq/par={ratio:5.2f}x  rel={rel:.2e}  "
            f"fallback={n_div}/{n_win}"
            + (f"  NONFINITE windows {bad_w}" if bad_w else ""), flush=True,
        )
        results.append({
            "mode": "parallel", "window": window, "iterations": iters,
            "iteration_tol": itol, "warmstart": warmkind,
            "combine_engine": engine, "time_s": t_par,
            "speedup_vs_seq": ratio, "rel_vs_seq": rel,
            "rel_oracle": oracle_src,
            "fallback_windows": n_div, "num_windows": n_win,
            "nonfinite_windows": bad_w,
        })
        _flush()

    out = _flush()
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
