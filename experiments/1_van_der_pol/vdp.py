"""Experiment 1: adaptive vs uniform step sizes on stiff Van der Pol.

Port of /root/reference/experiments/1_van_der_pol/vdp.py against the
TPU-native framework.  Protocol (reference :46-132):

1. solve VdP (mu=1e3, 2nd order) adaptively at tol 1e-3 with a TS1(4) dense
   filter to obtain the adaptive grid;
2. re-solve on that grid with ``solve_fixed_grid`` (timed, warm-started);
3. show a uniform grid with the SAME number of steps diverges (NaN);
4. time a uniform grid at the MINIMUM adaptive step (the memory/work blowup
   the paper motivates with).

Saves the same .npy schema as the reference so the plotting script and
BASELINE.md comparisons carry over.
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

from odecheckpts_tpu import harness, ivpsolve, ivpsolvers, problems, taylor  # noqa: E402


def main(max_fixed_steps=None, reverify=False):
    vf, (u0, du0), (t0, t1) = problems.van_der_pol(mu=10.0**3)

    num = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=num, ode_shape=(1,), implementation="dense"
    )
    ts1 = ivpsolvers.correction_ts1(ode_order=2)
    strategy = ivpsolvers.strategy_filter(prior, ts1)
    solver = ivpsolvers.solver_dynamic(strategy)

    tcoeffs = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=t0), (u0, du0), num=num - 1
    )
    init = solver.initial_condition(tcoeffs, 1.0)

    tol = 1e-3
    ctrl = ivpsolve.control_proportional_integral()
    adaptive_solver = ivpsolve.adaptive(solver, atol=tol, rtol=tol, control=ctrl)
    solution = ivpsolve.solve_adaptive_save_every_step(
        vf, init, t0=t0, t1=t1, dt0=0.01, adaptive_solver=adaptive_solver
    )
    baseline_grid, baseline_solution = solution.t, solution.u
    steps = jnp.diff(baseline_grid)
    min_step = jnp.amin(steps)
    required_steps = int((t1 - t0) / min_step)
    if max_fixed_steps is not None:
        required_steps = min(required_steps, max_fixed_steps)
    print(f"adaptive steps: {len(steps)}, min step {float(min_step):.3g}, "
          f"uniform-equivalent steps: {required_steps:,}")

    if reverify:
        # Reproducibility check of the deterministic outputs against the
        # committed data (reference standard: data the adjacent script
        # reproduces).  The adaptive grid is a pure function of the
        # accept/reject sequence — any numerics drift flips it.
        import numpy as np

        here = os.path.dirname(__file__)
        grid_c = np.load(os.path.join(here, "vdp_baseline_grid.npy"))
        steps_c = np.load(os.path.join(here, "vdp_num_steps.npy"))
        ok = len(baseline_grid) == len(grid_c)
        if ok:
            ok = bool(np.allclose(np.asarray(baseline_grid), grid_c, rtol=1e-12))
        print(f"reverify baseline grid ({len(grid_c)} pts): "
              f"{'MATCH' if ok else 'MISMATCH'}")
        ok2 = [len(steps), required_steps] == list(np.asarray(steps_c))
        print(f"reverify num_steps {list(np.asarray(steps_c))}: "
              f"{'MATCH' if ok2 else 'MISMATCH'} "
              f"(got [{len(steps)}, {required_steps}])")
        print("REVERIFY", "OK" if (ok and ok2) else "FAILED")
        raise SystemExit(0 if (ok and ok2) else 1)

    @harness.jit_and_time
    def solve_adaptive():
        sl = ivpsolve.solve_fixed_grid(vf, init, grid=baseline_grid, solver=solver)
        return sl.t, sl.u

    @harness.jit_and_time
    def solve_fixed_inaccurate():
        grid = jnp.linspace(t0, t1, num=len(baseline_grid), endpoint=True)
        sl = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
        return sl.t, sl.u

    @harness.jit_and_time
    def solve_fixed_accurate():
        grid = jnp.linspace(t0, t1, num=required_steps, endpoint=True)
        sl = ivpsolve.solve_fixed_grid(vf, init, grid=grid, solver=solver)
        return sl.t, sl.u

    _, (grid_inacc, sol_inacc) = solve_fixed_inaccurate()
    assert jnp.any(jnp.isnan(sol_inacc)), "uniform equal-budget grid must diverge"
    print("uniform grid with the same #steps: NaN (diverges), as expected")

    rt_adaptive, (grid_adaptive, _sol_a) = solve_adaptive()
    rt_fixed, (grid_acc, _sol_f) = solve_fixed_accurate()
    print(f"adaptive-grid re-solve: {rt_adaptive:.4f}s; "
          f"uniform-at-min-step: {rt_fixed:.4f}s "
          f"({rt_fixed / rt_adaptive:.0f}x)")

    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, "vdp_baseline_grid.npy"), baseline_grid)
    jnp.save(os.path.join(here, "vdp_baseline_solution.npy"), baseline_solution)
    jnp.save(os.path.join(here, "vdp_grid_adaptive.npy"), grid_adaptive)
    jnp.save(os.path.join(here, "vdp_grid_fixed_inaccurate.npy"), grid_inacc)
    jnp.save(os.path.join(here, "vdp_runtime_adaptive.npy"), rt_adaptive)
    jnp.save(os.path.join(here, "vdp_runtime_fixed_accurate.npy"), rt_fixed)
    jnp.save(
        os.path.join(here, "vdp_num_steps.npy"),
        jnp.asarray([len(steps), required_steps]),
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--max-fixed-steps", type=int, default=None,
                   help="cap the uniform grid size (for quick runs)")
    p.add_argument("--reverify", action="store_true",
                   help="compare the deterministic outputs (baseline grid, "
                        "step counts) to the committed data and exit")
    args = p.parse_args()
    main(max_fixed_steps=args.max_fixed_steps, reverify=args.reverify)
