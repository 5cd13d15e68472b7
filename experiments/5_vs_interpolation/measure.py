"""Experiment 5: posterior sampling -- checkpoints (ATS) vs tstops re-solve (AS).

Capability parity with /root/reference/experiments/5_vs_interpolation/
measure.py (same protocol, result schema, and algorithm labels for the table
printer; the code is organized as solver-closure builders over this repo's
value-based API).  Three-body restricted problem (2nd order), K in
{5, 50, 500} posterior samples at 50 save_at points, tolerances
{1e-4, 1e-7, 1e-10}:

* "ATS (ours)": fixedpoint ``solve_adaptive_save_at`` then ``markov_sample``
  on the 50-state posterior (O(#save_at) work per sample);
* "AS" baseline: adaptive save-every-step to discover the grid, union with
  save_at ("tstops" emulation), ``solve_fixed_grid`` re-solve with a smoother,
  sample the full O(#steps) posterior, index out the save_at rows.

Timing = min of 3 (compile excluded).
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

from odecheckpts_tpu import harness, ivpsolve, ivpsolvers, problems, stats, taylor  # noqa: E402

ODE_ORDER = 2
NUM_DERIVS = 4


def _configured_solver(vf, u0_tuple, t0, strategy_fn):
    """Uncalibrated solver + exact initial state for the three-body setup."""
    prior = ivpsolvers.prior_ibm(
        num_derivatives=NUM_DERIVS, ode_shape=(2,), implementation="isotropic"
    )
    strategy = strategy_fn(prior, ivpsolvers.correction_ts0(ode_order=ODE_ORDER))
    solver = ivpsolvers.solver(strategy)
    tcoeffs = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=t0), u0_tuple, num=NUM_DERIVS + 1 - ODE_ORDER
    )
    init = solver.initial_condition(tcoeffs, jnp.ones(()))
    return solver, init


def _mean_of_qoi_samples(posterior, num_samples):
    """K joint posterior samples of the qoi, averaged (the measured op)."""
    seq = stats.markov_select_terminal(posterior)
    (qoi, _), (qoi_term, _) = stats.markov_sample(
        jax.random.PRNGKey(1), seq, shape=(num_samples,), reverse=True
    )
    return jnp.concatenate([qoi, qoi_term[..., None, :]], axis=-2).mean(axis=0)


def build_checkpoint_sampler(vf, u0_tuple, tspan, *, tol, save_at, num_samples):
    """ATS: one O(#save_at)-memory adaptive solve, sample the 50-state
    posterior directly.  Returns (jitted thunk, step-count proxy)."""
    solver, init = _configured_solver(
        vf, u0_tuple, tspan[0], ivpsolvers.strategy_fixedpoint
    )
    asolver = ivpsolve.adaptive(
        solver, atol=tol, rtol=tol, control=ivpsolve.control_proportional_integral()
    )

    @jax.jit
    def run():
        sol = ivpsolve.solve_adaptive_save_at(
            vf, init, save_at=save_at, dt0=0.01, adaptive_solver=asolver
        )
        return save_at, _mean_of_qoi_samples(sol.posterior, num_samples)

    return run, len(save_at)


def build_tstops_sampler(vf, u0_tuple, tspan, *, tol, save_at, num_samples):
    """AS: discover the adaptive grid eagerly, union it with save_at, re-solve
    on the union with a smoother, sample the O(#steps) posterior, and slice
    the save_at rows back out.  Returns (jitted thunk, #adaptive steps)."""
    solver, init = _configured_solver(
        vf, u0_tuple, tspan[0], ivpsolvers.strategy_smoother
    )
    asolver = ivpsolve.adaptive(
        solver, atol=tol, rtol=tol, control=ivpsolve.control_proportional_integral()
    )
    discovery = ivpsolve.solve_adaptive_save_every_step(
        vf, init, t0=save_at[0], t1=save_at[-1], dt0=0.01, adaptive_solver=asolver
    )
    grid = jnp.sort(jnp.union1d(discovery.t, save_at))

    @jax.jit
    def run():
        sol = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
        qoi = _mean_of_qoi_samples(sol.posterior, num_samples)
        _, _, idx = jnp.intersect1d(
            save_at, grid, size=len(save_at), return_indices=True
        )
        return save_at, qoi[idx, :]

    return run, len(discovery.t) - 1


ALGORITHMS = [
    ("AS", build_tstops_sampler),
    ("ATS (ours)", build_checkpoint_sampler),
]


def main(num_samples, tol_exponents, num_save_at=50, reverify=False):
    vf, u0_tuple, tspan = problems.three_body_restricted()
    save_at = jnp.linspace(tspan[0], tspan[-1], num=num_save_at)

    if reverify:
        # Reproducibility check of the deterministic column ("No. steps",
        # the AS discovery solve's accept count — a pure function of the
        # accept/reject sequence) against the committed table.  Timing
        # columns are machine-dependent and excluded.
        import numpy as np

        here = os.path.dirname(__file__)
        committed = np.load(
            os.path.join(here, "data_results.npy"), allow_pickle=True
        ).item()
        ok = True
        for expo in tol_exponents:
            tol = 10.0 ** (-float(expo))
            _, nsteps = build_tstops_sampler(
                vf, u0_tuple, tspan, tol=tol, save_at=save_at, num_samples=1
            )
            want_rows = [
                r["No. steps"]
                for r in committed.values()
                if r["Tolerance"] == f"$10^{{-{int(expo)}}}$"
            ]
            got = f"{int(nsteps):,}"
            same = all(w == got for w in want_rows)
            ok &= same
            print(f"reverify tol=1e-{int(expo)}: steps {got} vs committed "
                  f"{set(want_rows)}: {'MATCH' if same else 'MISMATCH'}")
        print("REVERIFY", "OK" if ok else "FAILED")
        raise SystemExit(0 if ok else 1)

    results = {}
    for i, (n, expo) in enumerate(
        ((n, e) for n in num_samples for e in tol_exponents), start=1
    ):
        tol = 10.0 ** (-float(expo))
        row = {"No. Samples": f"{n}", "Tolerance": f"$10^{{-{int(expo)}}}$"}
        for label, build in ALGORITHMS:
            run, nsteps = build(
                vf, u0_tuple, tspan, tol=tol, save_at=save_at, num_samples=n
            )
            seconds = harness.runtime_min(run, num_runs=3)
            if label == "AS":
                row["No. steps"] = f"{int(nsteps):,}"
            row[f"Time (s): {label}"] = f"{seconds:.3f}"
            print(
                f"{label:>10}  K={n:<4} tol={tol:.0e}  {seconds:.3f}s  "
                f"({int(nsteps):,} steps)",
                flush=True,
            )
        results[i] = row

    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, "data_results.npy"), results, allow_pickle=True)
    print("Wrote data_results.npy")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, nargs="+", default=[5, 50, 500])
    p.add_argument("--tols", type=float, nargs="+", default=[4, 7, 10])
    p.add_argument("--save-at", type=int, default=50)
    p.add_argument("--reverify", action="store_true",
                   help="compare the deterministic step counts to the "
                        "committed table and exit")
    args = p.parse_args()
    main(args.samples, args.tols, num_save_at=args.save_at,
         reverify=args.reverify)
