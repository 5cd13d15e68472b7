"""Batched TPU throughput on the exp-5 workload (three-body, 2nd order).

TPU-native extension of experiment 5 (no reference equivalent): the
reference measures single solves of the restricted three-body problem at
50 checkpoints on CPU (/root/reference/experiments/5_vs_interpolation/
measure.py:159-176, nu=4, ode_order=2); here the same configuration runs as
a large ensemble through the fused lanes-last step kernel with
``ode_order=2`` (batched.make_step_ll observing derivative 2).

Solve-only comparison: the reference's ATS column (BASELINE.md exp 5,
K=5 samples) is fixedpoint-solve + 5 posterior samples, so its per-solve
seconds are a slight over-estimate of pure solve cost; the reported
``vs_reference_cpu`` uses them as-is.
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

import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import harness, problems  # noqa: E402

# tol -> reference ATS (K=5) seconds per solve, BASELINE.md experiment 5
REFERENCE = {1e-4: 0.015, 1e-7: 0.065}


def _truth(save_at):
    """Arenstorf trajectory at the checkpoints, scipy LSODA(1e-12)."""
    import numpy as np
    import scipy.integrate

    mu = 0.012277471
    mp = 1.0 - mu

    def f(_t, y):
        x1, x2, dx1, dx2 = y
        d1 = ((x1 + mu) ** 2 + x2**2) ** 1.5
        d2 = ((x1 - mp) ** 2 + x2**2) ** 1.5
        return [
            dx1,
            dx2,
            x1 + 2 * dx2 - mp * (x1 + mu) / d1 - mu * (x1 - mp) / d2,
            x2 - 2 * dx1 - mp * x2 / d1 - mu * x2 / d2,
        ]

    y0 = [0.994, 0.0, 0.0, -2.00158510637908]
    sol = scipy.integrate.solve_ivp(
        f, (float(save_at[0]), float(save_at[-1])), y0, t_eval=save_at,
        rtol=1e-12, atol=1e-12, method="LSODA",
    )
    return sol.y[:2].T  # (T, 2) positions


def main(batch=8192, engine="pallas"):
    import numpy as np

    from odecheckpts_tpu import batched, batched_hi

    vf, (u0_, du0_), tspan = problems.three_body_restricted()

    results = {}
    for tol, ref_s in REFERENCE.items():
        hi_row = tol < 1e-5  # df32 pair engine replaces the old x64 row
        eng = engine
        b = batch
        save_at = jnp.linspace(*tspan, num=50, dtype=jnp.float32)
        # replicate the EXACT Arenstorf initial condition: the periodic orbit
        # exists only for it -- perturbed lanes fall into the moon singularity,
        # stall at the dt floor, and hang the kernel (measured on-chip).
        # Lanes are independent, so throughput is unaffected by replication.
        u0s = jnp.tile(u0_.astype(jnp.float32)[None], (b, 1))
        du0s = jnp.tile(du0_.astype(jnp.float32)[None], (b, 1))
        tols = jnp.full((b,), tol, jnp.float32)

        if hi_row:
            eng_hi = eng if eng.startswith("pallas") else "xla"
            hi_solve = batched_hi.make_hi_solver(
                vf, (), save_at=jnp.asarray(save_at), dt0=0.01,
                engine=eng_hi, ode_order=2,
                lanes=1024 if eng_hi.startswith("pallas") else None,
            )

            def solve(u, du, t):
                us, _uf, n = hi_solve((u, du), np.asarray(t))
                return us, None, n

            eng = f"{eng_hi}-hi"
            dtype_name = "df32"
        else:
            solve = jax.jit(
                lambda u, du, t, e=eng: batched.solve_save_at_batched(
                    vf, (u, du), (), save_at=save_at, dt0=0.01, tols=t,
                    engine=e, ode_order=2,
                    lanes=1024 if e.startswith("pallas") else None,
                )
            )
            dtype_name = "float32"
        u_s, _u_f, nsteps = solve(u0s, du0s, tols)  # compile + warm
        harness.device_sync(u_s)
        t0 = time.perf_counter()
        u_s, _u_f, nsteps = solve(u0s, du0s, tols)
        harness.device_sync(u_s)
        dt = time.perf_counter() - t0
        if hi_row:
            u_s = jnp.asarray(batched_hi.combine64(u_s))
            nsteps = jnp.asarray(np.asarray(nsteps))
        assert bool(jnp.all(jnp.isfinite(u_s))), f"non-finite at tol={tol}"
        # accuracy check on one lane against LSODA(1e-12) truth (the orbit
        # amplifies local error strongly near its close approaches, so this
        # is a sanity bound, not a tolerance-proportional gate)
        rmse = float(jnp.sqrt(jnp.mean(
            (u_s[0].astype(jnp.float64)
             - jnp.asarray(_truth(np.asarray(save_at, np.float64)))) ** 2
        )))
        assert rmse < 0.1, f"rmse {rmse:.2e} at tol {tol}"
        rate = b / dt
        results[tol] = {
            "batch": b,
            "dtype": dtype_name,
            "engine": eng,
            "wall_s": round(dt, 4),
            "solves_per_s": round(rate, 1),
            "vs_reference_cpu": round(rate * ref_s, 1),
            "rmse_vs_lsoda": rmse,
            "mean_steps": float(jnp.mean(nsteps[:, -1].astype(jnp.float32))),
        }
        print(f"tol {tol:.0e} [{dtype_name}/{eng}]: "
              f"{rate:,.0f} solves/s "
              f"({results[tol]['vs_reference_cpu']:.0f}x reference CPU), "
              f"rmse {rmse:.1e}, "
              f"~{results[tol]['mean_steps']:.0f} steps", flush=True)

    here = os.path.dirname(__file__)
    with open(os.path.join(here, "data_batched_tpu.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("Saved.")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--engine", choices=["pallas-loop", "pallas", "xla"],
                   default="pallas-loop")
    a = p.parse_args()
    main(batch=a.batch, engine=a.engine)
