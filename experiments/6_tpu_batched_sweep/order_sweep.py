"""Prior-order sweep across the tolerance range (perf experiment).

Steps scale as rtol^(-1/(nu+1)) while the fused step kernel's cost grows
only ~O(n^2) vector ops (n = nu+1 column-list QR on 512-wide lanes), so
the optimal order depends on the tolerance.  CPU pre-measurement (batch 8,
xla engine, rigid body (0, 50), the bench workload), steps per solve:

    rtol   nu=2   nu=3   nu=4   nu=5   nu=6
    1e-1    350    308    503      -      -     (f32)
    1e-2    736    450    580      -      -     (f32)
    1e-3  1,474    759    677      -      -     (f32)
    1e-4  3,015  1,302    845  1,472  3,889     (f32)
    1e-8      -      -  4,995  2,849  4,020     (df32 pairs)

With an ~n^2 per-step vector-op cost model the winners are nu=2..3 for
rtol >= 1e-2, nu=4 around 1e-3..1e-4, and nu=5 on the tight df32 band
(1.75x fewer steps at 1e-8, RMSE 3.2e-9 < gate).  At loose tolerances the
high orders lose outright (f32 roundoff in the high-order extrapolation
dominates the error estimate); at tight tolerances the low orders' step
counts blow up.  This script measures the real thing on one TPU chip:
both fused pallas-loop engines, nu x rtol over each band, solves/s +
mean steps + RMSE vs per-lane scipy LSODA(1e-12) truth, same gates as
bench.py.  Writes data_order_sweep.json next to this script.

Usage: python order_sweep.py [--batch 32768] [--orders 4 5 6]
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

from odecheckpts_tpu import batched_hi, harness, problems  # noqa: E402

RMSE_BOUND_FACTOR = 3.0
LANE_BOUND_FACTOR = 6.0


def _truth_rows(u0_rows, save_at):
    import scipy.integrate

    p1, p2, p3 = -2.0, 1.25, -0.5

    def vf_np(_t, y):
        return [p1 * y[1] * y[2], p2 * y[0] * y[2], p3 * y[0] * y[1]]

    outs = []
    for row in u0_rows:
        sol = scipy.integrate.solve_ivp(
            vf_np, y0=row, t_span=(float(save_at[0]), float(save_at[-1])),
            t_eval=save_at, rtol=1e-12, atol=1e-12, method="LSODA",
        )
        outs.append(sol.y.T)
    return np.stack(outs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--sample", type=int, default=256)
    ap.add_argument("--orders", type=int, nargs="*", default=[4, 5, 6],
                    help="df32-band orders")
    ap.add_argument("--rtols", type=float, nargs="*",
                    default=[1e-6, 1e-7, 1e-8, 1e-9])
    ap.add_argument("--orders-f32", type=int, nargs="*", default=[2, 3, 4],
                    help="f32-band orders")
    ap.add_argument("--rtols-f32", type=float, nargs="*",
                    default=[1e-1, 1e-2, 1e-3, 1e-4])
    ap.add_argument("--engine", default="pallas-loop")
    args = ap.parse_args(argv)

    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    save_at_np = np.linspace(tspan[0], tspan[1], num=5)
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (args.batch, 3), jnp.float32)
    u0_rows = np.asarray(u0, np.float64)[None] * (
        1.0 + 0.05 * np.asarray(noise, np.float64)
    )
    u0s = jnp.asarray(u0_rows, jnp.float32)
    truth = _truth_rows(np.asarray(u0s[: args.sample], np.float64), save_at_np)

    rows = []

    # f32 band: plain fused engine, loose tolerances
    from odecheckpts_tpu import batched

    save_at_f32 = jnp.asarray(save_at_np, jnp.float32)
    for nu in args.orders_f32:
        solve32 = jax.jit(
            lambda u, t, _nu=nu: batched.solve_save_at_batched(
                vf, u, params, save_at=save_at_f32, dt0=0.1, tols=t,
                engine=args.engine, num_derivatives=_nu,
                lanes=512 if args.engine.startswith("pallas") else None,
            )
        )
        for rtol in args.rtols_f32:
            tols = jnp.full((args.batch,), rtol, jnp.float32)
            u_s, _uf, n = solve32(u0s, tols)  # compile + warm
            harness.device_sync(u_s)
            t0 = time.perf_counter()
            u_s, _uf, n = solve32(u0s, tols)
            harness.device_sync(u_s)
            elapsed = time.perf_counter() - t0
            err = np.asarray(u_s[: args.sample], np.float64) - truth
            rmse = float(np.sqrt(np.mean(err * err)))
            rmse_lane = np.sqrt(np.mean(err * err, axis=(1, 2)))
            row = {
                "nu": nu,
                "rtol": rtol,
                "dtype": "float32",
                "engine": args.engine,
                "batch": args.batch,
                "seconds": round(elapsed, 4),
                "solves_per_sec": round(args.batch / elapsed, 2),
                "rmse": rmse,
                "rmse_max_lane": float(np.max(rmse_lane)),
                "mean_steps": round(
                    float(np.mean(np.asarray(n)[:, -1].astype(np.float64))), 1
                ),
                "gate_ok": bool(
                    np.isfinite(rmse)
                    and rmse < RMSE_BOUND_FACTOR * rtol
                    and np.max(rmse_lane) < LANE_BOUND_FACTOR * rtol
                ),
            }
            rows.append(row)
            print(f"# {row}", flush=True)

    # df32 band: compensated-pair engine, tight tolerances
    for nu in args.orders:
        solve = batched_hi.make_hi_solver(
            vf, params, save_at=save_at_np, dt0=0.1,
            vf_df=problems.rigid_body_df(params), engine=args.engine,
            num_derivatives=nu,
            lanes=512 if args.engine.startswith("pallas") else None,
        )
        for rtol in args.rtols:
            tols = np.full((args.batch,), rtol, np.float32)
            us, _uf, n = solve(u0s, tols)  # compile (first rtol) + warm
            harness.device_sync(us[0])
            t0 = time.perf_counter()
            us, _uf, n = solve(u0s, tols)
            harness.device_sync(us[0])
            elapsed = time.perf_counter() - t0
            u64 = batched_hi.combine64(
                (us[0][: args.sample], us[1][: args.sample])
            )
            err = u64 - truth
            rmse = float(np.sqrt(np.mean(err * err)))
            rmse_lane = np.sqrt(np.mean(err * err, axis=(1, 2)))
            row = {
                "nu": nu,
                "rtol": rtol,
                "dtype": "df32",
                "engine": args.engine,
                "batch": args.batch,
                "seconds": round(elapsed, 4),
                "solves_per_sec": round(args.batch / elapsed, 2),
                "rmse": rmse,
                "rmse_max_lane": float(np.max(rmse_lane)),
                "mean_steps": round(float(np.mean(np.asarray(n)[:, -1])), 1),
                "gate_ok": bool(
                    np.isfinite(rmse)
                    and rmse < RMSE_BOUND_FACTOR * rtol
                    and np.max(rmse_lane) < LANE_BOUND_FACTOR * rtol
                ),
            }
            rows.append(row)
            print(f"# {row}", flush=True)

    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "results": rows,
    }
    path = pathlib.Path(__file__).parent / "data_order_sweep.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
