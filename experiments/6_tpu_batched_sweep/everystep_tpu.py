"""Fused save-every-step throughput on TPU (no reference equivalent).

The dense-output (every accepted step) workload is HBM-emission-bound by
design: each attempt appends ~107 floats/lane (posterior + backward factors
+ flags) at the scalar attempt counter.  This measures that cost against
the save_at fused driver on the same ensemble -- the delta is the price of
full dense output + in-jit masked smoothing vs 5 checkpoints.

Usage: python everystep_tpu.py [--batch 4096] [--tol 1e-4] [--max-steps 256]
Writes data_everystep.json next to this script.
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
import numpy as np  # noqa: E402


def main(batch=4096, tol=1e-4, max_steps=256, tspan=(0.0, 10.0)):
    from odecheckpts_tpu import batched, batched_everystep, harness, problems

    vf, (u0,), _ts, params = problems.rigid_body()
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (batch, 3), jnp.float32)
    u0s = jnp.asarray(u0[None] * (1.0 + 0.05 * noise), jnp.float32)
    tols = jnp.full((batch,), tol, jnp.float32)

    rows = []

    for engine in ("xla", "pallas"):
        solve = jax.jit(
            lambda u, e=engine: batched_everystep.solve_every_step_batched(
                vf, u, params, t0=tspan[0], t1=tspan[1], dt0=0.1, tols=tols,
                max_steps=max_steps, strategy="smoother", engine=e,
            )
        )
        try:
            out = solve(u0s)
            harness.device_sync(out.u)
            t0 = time.perf_counter()
            out = solve(u0s)
            harness.device_sync(out.u)
            elapsed = time.perf_counter() - t0
        except Exception as e:
            print(f"# everystep/{engine} failed: {e!r}", file=sys.stderr)
            continue
        nsteps = np.asarray(out.num_steps)
        assert np.all(np.isfinite(np.asarray(out.marginal_u))), engine
        row = {
            "driver": "everystep-smoother",
            "engine": engine,
            "seconds": round(elapsed, 4),
            "solves_per_sec": round(batch / elapsed, 1),
            "mean_steps": round(float(nsteps.mean()), 1),
            "mean_valid_slots": round(float(np.asarray(out.valid).sum(1).mean()), 1),
        }
        rows.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)

    # save_at foil: same controller, 5 checkpoints, no dense emission
    save_at = jnp.linspace(tspan[0], tspan[1], num=5, dtype=jnp.float32)
    solve_sa = jax.jit(
        lambda u: batched.solve_save_at_batched(
            vf, u, params, save_at=save_at, dt0=0.1, tols=tols,
            engine="pallas-loop",
        )
    )
    u_s, _uf, n = solve_sa(u0s)
    harness.device_sync(u_s)
    t0 = time.perf_counter()
    u_s, _uf, n = solve_sa(u0s)
    harness.device_sync(u_s)
    elapsed = time.perf_counter() - t0
    row = {
        "driver": "save_at-fixedpoint (foil)",
        "engine": "pallas-loop",
        "seconds": round(elapsed, 4),
        "solves_per_sec": round(batch / elapsed, 1),
        "mean_steps": round(float(np.asarray(n)[:, -1].mean()), 1),
    }
    rows.append(row)
    print(f"# {row}", file=sys.stderr, flush=True)

    out_d = {"batch": batch, "tol": tol, "max_steps": max_steps, "rows": rows}
    here = pathlib.Path(__file__).resolve().parent
    with open(here / "data_everystep.json", "w") as f:
        json.dump(out_d, f, indent=1)
    print(json.dumps(out_d))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--max-steps", type=int, default=256)
    a = ap.parse_args()
    main(batch=a.batch, tol=a.tol, max_steps=a.max_steps)
