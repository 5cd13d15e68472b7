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

from odecheckpts_tpu import problems  # noqa: E402

# tol -> reference ATS (K=5) seconds per solve, BASELINE.md experiment 5
REFERENCE = {1e-4: 0.015, 1e-7: 0.065}


def main(batch=8192, engine="pallas"):
    from odecheckpts_tpu import batched

    vf, (u0_, du0_), tspan = problems.three_body_restricted()

    results = {}
    for tol, ref_s in REFERENCE.items():
        # f32 resolves 1e-4; the 1e-7 row needs x64 (slow-but-correct on TPU)
        if tol < 1e-5:
            jax.config.update("jax_enable_x64", True)
            dtype, eng, b = jnp.float64, "xla", min(batch, 4096)
        else:
            dtype, eng, b = jnp.float32, engine, batch
        save_at = jnp.linspace(*tspan, num=50, dtype=dtype)
        # replicate the EXACT Arenstorf initial condition: the periodic orbit
        # exists only for it -- perturbed lanes fall into the moon singularity,
        # stall at the dt floor, and hang the kernel (measured on-chip).
        # Lanes are independent, so throughput is unaffected by replication.
        u0s = jnp.tile(u0_.astype(dtype)[None], (b, 1))
        du0s = jnp.tile(du0_.astype(dtype)[None], (b, 1))
        tols = jnp.full((b,), tol, dtype)

        solve = jax.jit(
            lambda u, du, t, e=eng: batched.solve_save_at_batched(
                vf, (u, du), (), save_at=save_at, dt0=0.01, tols=t,
                engine=e, ode_order=2, lanes=1024 if e == "pallas" else None,
            )
        )
        u_s, _u_f, nsteps = solve(u0s, du0s, tols)  # compile + warm
        jax.block_until_ready(u_s)
        t0 = time.perf_counter()
        u_s, _u_f, nsteps = solve(u0s, du0s, tols)
        jax.block_until_ready(u_s)
        dt = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(u_s))), f"non-finite at tol={tol}"
        rate = b / dt
        results[tol] = {
            "batch": b,
            "dtype": jnp.dtype(dtype).name,
            "engine": eng,
            "wall_s": round(dt, 4),
            "solves_per_s": round(rate, 1),
            "vs_reference_cpu": round(rate * ref_s, 1),
            "mean_steps": float(jnp.mean(nsteps[:, -1].astype(jnp.float32))),
        }
        print(f"tol {tol:.0e} [{jnp.dtype(dtype).name}/{eng}]: "
              f"{rate:,.0f} solves/s "
              f"({results[tol]['vs_reference_cpu']:.0f}x reference CPU), "
              f"~{results[tol]['mean_steps']:.0f} steps", flush=True)

    here = os.path.dirname(__file__)
    with open(os.path.join(here, "data_batched_tpu.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("Saved.")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--engine", choices=["pallas", "xla"], default="pallas")
    a = p.parse_args()
    main(batch=a.batch, engine=a.engine)
