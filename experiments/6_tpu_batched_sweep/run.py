"""Experiment 6 (TPU-native, no reference equivalent): batched IVP throughput.

The BASELINE.json target: >= 10x the reference's CPU throughput on vmapped
1k-IVP tolerance sweeps on one TPU chip.  Solves a 1024-member rigid-body
ensemble per tolerance with the fixedpoint save_at solver in one compiled
program, optionally sharded across a device mesh, and reports solves/second
against the reference's committed single-solve CPU timings (BASELINE.md
experiment 2).
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

from odecheckpts_tpu import harness, parallel, problems  # noqa: E402

# solver-rtol -> reference seconds/solve (TS0(4) "jit loop", BASELINE.md exp 2;
# NB the reference applies a x100 tolerance shift, so its rows labeled
# 1e-3/1e-5 ran at rtol 1e-1/1e-3)
REFERENCE = {1e-1: 0.0145, 1e-3: 0.0185}


def main(batch=1024, use_mesh=False, dtype=jnp.float32, engine="fused",
         fused_engine="pallas-loop"):
    vf, (u0,), tspan, params = problems.rigid_body()
    u0 = u0.astype(dtype)
    save_at = jnp.linspace(*tspan, num=5, dtype=dtype)

    if engine == "fused":
        from odecheckpts_tpu import batched as batched_mod

        def solve_batch(u0s_tuple, p, tols):
            u_s, _u_f, nsteps = batched_mod.solve_save_at_batched(
                vf, u0s_tuple[0], p, save_at=save_at, dt0=0.1, tols=tols,
                engine=fused_engine,
            )
            return u_s, nsteps[:, -1]

    else:
        solve_batch = parallel.build_batched_solve("ts0-4", vf, u0, save_at, dt0=0.1)

    if use_mesh and len(jax.devices()) > 1:
        from jax.sharding import Mesh
        import numpy as np

        mesh = Mesh(np.array(jax.devices()), ("batch",))
        solve = parallel.shard_batched_solve(solve_batch, mesh)
        place = lambda t: parallel.shard_along(t, mesh)  # noqa: E731
    else:
        solve = jax.jit(lambda u, t: solve_batch(u, params, t))
        place = lambda t: t  # noqa: E731

    key = jax.random.PRNGKey(0)
    u0s = place(
        (u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3), dtype)),)
    )

    results = {}
    for tol, ref_s in REFERENCE.items():
        tols = place(jnp.full((batch,), tol, dtype))
        u, steps = solve(u0s, tols)  # compile
        harness.device_sync(u)
        t0 = time.perf_counter()
        u, steps = solve(u0s, tols)
        harness.device_sync(u)
        dt = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(u)))
        rate = batch / dt
        results[tol] = {
            "batch": batch,
            "wall_s": dt,
            "solves_per_s": rate,
            "vs_reference_cpu": rate * ref_s,
            "mean_steps": float(jnp.mean(steps.astype(jnp.float32))),
        }
        print(
            f"tol {tol:.0e}: {rate:,.0f} solves/s "
            f"({results[tol]['vs_reference_cpu']:.0f}x reference CPU)",
            flush=True,
        )

    here = os.path.dirname(__file__)
    with open(os.path.join(here, "data_throughput.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("Saved.")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--engine", choices=["fused", "generic"], default="fused")
    p.add_argument("--fused-engine", default="pallas-loop",
                   choices=["pallas-loop", "pallas", "xla"])
    a = p.parse_args()
    if a.f64:
        jax.config.update("jax_enable_x64", True)
    main(
        batch=a.batch,
        use_mesh=a.mesh,
        dtype=jnp.float64 if a.f64 else jnp.float32,
        engine=a.engine,
        fused_engine=a.fused_engine,
    )
