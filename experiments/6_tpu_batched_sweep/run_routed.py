"""Precision-routed mixed-tolerance ensemble on TPU.

Production sweeps mix tolerances across decades; this measures the routed
driver (batched_hi.make_routed_solver: loose lanes -> bucketed f32 Pallas
kernel, tight lanes -> df32-pair Pallas kernel) on one chip against the
single-engine alternative (everything through the df32 kernel, which is the
only single engine that meets every lane's accuracy), with per-lane RMSE
gates against scipy LSODA truth on sampled lanes.

Usage: python run_routed.py [--batch 32768] [--sample 8]
Writes data_routed.json next to this script.
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
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--sample", type=int, default=8)
    ap.add_argument("--platform", default=os.environ.get("ODECKPT_PLATFORM"))
    ap.add_argument("--engine", default="pallas")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import scipy.integrate

    from odecheckpts_tpu import batched_hi, harness, problems

    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    save_at = np.linspace(0.0, 50.0, 5)
    key = jax.random.PRNGKey(0)
    noise = 0.05 * np.asarray(
        jax.random.normal(key, (args.batch, 3), jnp.float32), np.float64
    )
    u0s = jnp.asarray(np.asarray(u0, np.float64)[None] * (1.0 + noise), jnp.float32)
    # log-uniform tolerance mix across the full protocol range
    rtols = np.asarray(
        10.0 ** jax.random.uniform(
            jax.random.PRNGKey(1), (args.batch,), minval=-9.0, maxval=-1.0
        ),
        np.float32,
    )

    def truth(rows):
        p1, p2, p3 = -2.0, 1.25, -0.5
        f = lambda t, y: [p1*y[1]*y[2], p2*y[0]*y[2], p3*y[0]*y[1]]  # noqa: E731
        return np.stack([
            scipy.integrate.solve_ivp(
                f, y0=r, t_span=(0.0, 50.0), t_eval=save_at,
                rtol=1e-12, atol=1e-12, method="LSODA").y.T
            for r in rows
        ])

    tr = truth(np.asarray(u0s[: args.sample], np.float64))

    def gate(u64):
        err = np.sqrt(np.mean(
            (u64[: args.sample] - tr) ** 2, axis=(1, 2)
        ))
        ratio = err / np.maximum(rtols[: args.sample].astype(np.float64), 3e-7)
        assert np.all(ratio < 10.0), list(zip(rtols[: args.sample], err))
        return float(np.max(ratio))

    results = {}

    # routed: f32 bucketed for loose lanes, df32 pairs for tight lanes
    routed = batched_hi.make_routed_solver(
        vf, params, save_at=save_at, dt0=0.1,
        vf_df=problems.rigid_body_df(params), engine=args.engine, lanes=1024,
        num_buckets_f32=4,
    )
    u64, _n = routed(u0s, rtols)  # compile + warm
    t0 = time.perf_counter()
    u64, _n = routed(u0s, rtols)
    el_routed = time.perf_counter() - t0
    results["routed"] = {
        "seconds": round(el_routed, 4),
        "solves_per_sec": round(args.batch / el_routed, 1),
        "rmse_over_gate_max": round(gate(u64), 3),
    }
    print(json.dumps({"routed": results["routed"]}), flush=True)

    # single-engine alternative: every lane through the df32 kernel
    hi = batched_hi.make_hi_solver(
        vf, params, save_at=save_at, dt0=0.1,
        vf_df=problems.rigid_body_df(params), engine=args.engine, lanes=1024,
    )
    us, _uf, _n = hi(u0s, rtols)
    harness.device_sync(us[0])
    t0 = time.perf_counter()
    us, _uf, _n = hi(u0s, rtols)
    harness.device_sync(us[0])
    el_hi = time.perf_counter() - t0
    results["all_df32_unbucketed"] = {
        "seconds": round(el_hi, 4),
        "solves_per_sec": round(args.batch / el_hi, 1),
        "rmse_over_gate_max": round(gate(batched_hi.combine64(us)), 3),
    }
    results["routed_speedup"] = round(el_hi / el_routed, 2)
    print(json.dumps({"all_df32_unbucketed": results["all_df32_unbucketed"],
                      "routed_speedup": results["routed_speedup"]}), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data_routed.json")
    # keep one row per batch size (the routed-vs-single crossover sits at
    # the lane-saturation batch, so both sides of it are worth retaining)
    try:
        with open(out) as f:
            data = json.load(f)
        rows = [r for r in data.get("rows", []) if r.get("batch") != args.batch]
        note = data.get("note", "")
    except (OSError, ValueError):
        rows, note = [], ""
    rows.append({"batch": args.batch, **results})
    rows.sort(key=lambda r: r["batch"])
    with open(out, "w") as f:
        json.dump({"rows": rows, "note": note}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
