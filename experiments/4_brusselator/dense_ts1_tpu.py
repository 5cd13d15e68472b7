"""Stiff Brusselator ensembles on the fused DENSE-TS1 TPU engine.

TPU-native extension of experiment 4 (no reference equivalent): the
reference's stiff dense-TS1 workload class is single-instance d=1
(/root/reference/experiments/1_van_der_pol/vdp.py:61-66); this measures the
round-3 dense lanes-last engine (batched_dense: full (nd, nd) covariance,
per-lane (d, d) Jacobians in-kernel) on ensembles of small Brusselator
systems -- the multi-dimensional EK1 case that previously ran only on the
generic vmapped path.

Compile cost is O((nd)^3) unrolled vector ops (N=2 -> d=4, nd=20: QR(40,40)
per attempt), so small N is the intended regime.

Usage: python dense_ts1_tpu.py [--N 2] [--batch 1024] [--tol 1e-5]
Writes data_dense_ts1_tpu.json next to this script.
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


def _truth_rows(rows, N, save_at):
    import scipy.integrate

    alpha = 1.0 / 50.0
    c = alpha * (N + 1) ** 2

    def vf_np(_t, y):
        u, v = y[:N], y[N:]
        u_ = np.concatenate([[1.0], u, [1.0]])
        v_ = np.concatenate([[3.0], v, [3.0]])
        cu = u_[:-2] - 2.0 * u_[1:-1] + u_[2:]
        cv = v_[:-2] - 2.0 * v_[1:-1] + v_[2:]
        return np.concatenate(
            [1.0 + u**2 * v - 4.0 * u + c * cu, 3.0 * u - u**2 * v + c * cv]
        )

    outs = []
    for row in rows:
        sol = scipy.integrate.solve_ivp(
            vf_np, (float(save_at[0]), float(save_at[-1])), row,
            t_eval=save_at, rtol=1e-10, atol=1e-10, method="LSODA",
        )
        outs.append(sol.y.T)
    return np.stack(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--lanes", type=int, default=0,
                    help="0 = VMEM-aware auto width")
    ap.add_argument("--sample", type=int, default=4)
    ap.add_argument("--engines", nargs="+",
                    default=["pallas-loop", "pallas", "xla"])
    args = ap.parse_args()

    from odecheckpts_tpu import batched, harness, problems

    vf, (y0,), tspan, _params = problems.brusselator(args.N, laplacian="slices")
    d = 2 * args.N
    save_at = np.linspace(tspan[0], tspan[1], num=5)
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (args.batch, d), jnp.float32)
    u0s_np = np.asarray(y0, np.float64)[None] * (
        1.0 + 0.02 * np.asarray(noise, np.float64)
    )
    u0s = jnp.asarray(u0s_np, jnp.float32)
    tols = jnp.full((args.batch,), args.tol, jnp.float32)
    truth = _truth_rows(np.asarray(u0s[: args.sample], np.float64), args.N, save_at)

    results = {"N": args.N, "d": d, "batch": args.batch, "tol": args.tol,
               "rows": []}
    for engine in args.engines:
        try:
            run = jax.jit(
                lambda u, t, e=engine: batched.solve_save_at_batched(
                    vf, u, (), save_at=jnp.asarray(save_at, jnp.float32),
                    dt0=0.01, tols=t, correction="ts1",
                    implementation="dense", engine=e,
                    lanes=args.lanes or None,
                )
            )
            u_s, _u_f, n = run(u0s, tols)  # compile + warm
            harness.device_sync(u_s)
            t0 = time.perf_counter()
            u_s, _u_f, n = run(u0s, tols)
            harness.device_sync(u_s)
            secs = time.perf_counter() - t0
        except Exception as e:
            print(f"engine={engine}: FAILED ({e!r})", flush=True)
            results["rows"].append({"engine": engine, "error": repr(e)[:300]})
            continue
        err = np.asarray(u_s[: args.sample], np.float64) - truth
        rmse = float(np.sqrt(np.mean(err * err)))
        row = {
            "engine": engine,
            "seconds": round(secs, 4),
            "solves_per_sec": round(args.batch / secs, 1),
            "rmse": rmse,
            "mean_steps": round(float(jnp.mean(n[:, -1].astype(jnp.float32))), 1),
        }
        results["rows"].append(row)
        print(f"# {row}", flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "data_dense_ts1_tpu.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("Wrote data_dense_ts1_tpu.json")


if __name__ == "__main__":
    main()
