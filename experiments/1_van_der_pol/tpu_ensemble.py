"""Stiff Van-der-Pol ensembles on TPU: the fused TS1 kernel at scale.

The reference's exp-1 studies step sizes of ONE VdP solve per tolerance on
CPU (/root/reference/experiments/1_van_der_pol/vdp.py).  The TPU-native
extension sweeps ensembles: for each stiffness mu in a log range, a batch of
perturbed initial conditions runs through the fused lanes-last TS1(4) step
kernel (batched.solve_save_at_batched(correction="ts1"), one Pallas call per
accept/reject attempt).  Emits one JSON with per-mu throughput and accepted
step counts; data committed as data_tpu_ensemble.json.

Usage: python tpu_ensemble.py [--batch 4096] [--mus 8] [--tol 1e-3]
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--mus", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--mu-min", type=float, default=10.0)
    ap.add_argument("--mu-max", type=float, default=1000.0)
    ap.add_argument("--platform", default=os.environ.get("ODECKPT_PLATFORM"))
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--error-unit", default="qoi", choices=["qoi", "residual"],
                    help="qoi (default) tracks the solution unit and holds "
                         "phase through the relaxation jumps; residual "
                         "(exp-3 protocol) over-resolves transients but "
                         "under-resolves the slow manifold here")
    ap.add_argument("--out", default="data_tpu_ensemble.json")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from odecheckpts_tpu import batched, batched_hi, harness, problems

    tspan = (0.0, 6.3)
    save_at = jnp.linspace(*tspan, num=4, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    noise = 1e-2 * jax.random.normal(key, (args.batch, 1), jnp.float32)
    rows = []
    for mu in np.geomspace(args.mu_min, args.mu_max, args.mus):
        vf, (u0, du0), _ = problems.van_der_pol(mu=float(mu))
        u0s = (
            u0.astype(jnp.float32)[None] * (1.0 + noise),
            jnp.broadcast_to(du0.astype(jnp.float32)[None], (args.batch, 1)),
        )
        tols = jnp.full((args.batch,), args.tol, jnp.float32)
        if args.engine.startswith("hi"):
            # df32 pair engine: its compensated time axis resolves the
            # dt ~ 1/mu steps that sit below the plain-f32 stall floor at
            # mu ~ 1e3 (pallas unless "hi-xla")
            eng = {"hi-xla": "xla", "hi-loop": "pallas-loop"}.get(
                args.engine, "pallas"
            )
            solve = batched_hi.make_hi_solver(
                vf, (), save_at=np.asarray(save_at), dt0=0.01,
                engine=eng, ode_order=2, correction="ts1",
                strategy="filter", error_unit=args.error_unit,
                lanes=1024 if eng == "pallas" else None,
            )

            def run(u, t, _s=solve):
                us, uf, n = _s(u, np.asarray(t))
                return us[0], uf, n
        else:
            solve = jax.jit(
                lambda u, t, _vf=vf: batched.solve_save_at_batched(
                    _vf, u, (), save_at=save_at, dt0=0.01, tols=t,
                    engine=args.engine, ode_order=2, correction="ts1",
                    strategy="filter", error_unit=args.error_unit,
                    lanes=1024 if args.engine == "pallas" else None,
                )
            )
            run = solve
        u_s, _uf, n = run(u0s, tols)  # compile + warm
        harness.device_sync(u_s)
        t0 = time.perf_counter()
        u_s, _uf, n = run(u0s, tols)
        harness.device_sync(u_s)
        el = time.perf_counter() - t0
        finite = bool(jnp.all(jnp.isfinite(u_s)))
        row = {
            "mu": float(mu),
            "tol": args.tol,
            "engine": args.engine,
            "error_unit": args.error_unit,
            "batch": args.batch,
            "seconds": round(el, 4),
            "solves_per_sec": round(args.batch / el, 1),
            "mean_steps": round(float(jnp.mean(n[:, -1].astype(jnp.float32))), 1),
            "max_steps": int(jnp.max(n[:, -1])),
            "finite": finite,
            "u_terminal_mean": round(float(jnp.mean(u_s[:, -1, 0])), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out)
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
