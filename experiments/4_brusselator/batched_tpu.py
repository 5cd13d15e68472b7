"""Stiff Brusselator PDE ensembles on the fused df32 TPU engine.

TPU-native extension of experiment 4 (no reference equivalent): the
reference solves ONE Brusselator instance per size on CPU
(/root/reference/experiments/4_brusselator/run.py); here a batch of
perturbed initial profiles runs through the fused lanes-last df32 pair
kernel (batched_hi, isotropic TS0(4), fixedpoint save_at) with the
slice-form Laplacian (problems.brusselator(laplacian="slices") -- the
convolve form does not lower inside Pallas kernels).

Prior state of the art in this repo for the same workload (N=32, tol 1e-8,
batch 256) was the generic vmapped path under XLA's x64 emulation at
~9.3 solves/s on one v5e; the fused df32 kernel replaces it.

Usage: python batched_tpu.py [--N 32] [--batch 256] [--tol 1e-7]
Writes data_batched_tpu.json next to this script.
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
    """Per-lane scipy LSODA reference at the checkpoints (numpy vf)."""
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
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--engine", default="pallas-loop",
                    choices=["pallas-loop", "pallas", "xla"])
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--sample", type=int, default=2)
    args = ap.parse_args()

    from odecheckpts_tpu import batched_hi, harness, problems

    vf, (y0,), tspan, _ = problems.brusselator(args.N, laplacian="slices")
    d = 2 * args.N
    save_at = np.linspace(tspan[0], tspan[1], num=5)
    key = jax.random.PRNGKey(0)
    noise = 0.01 * np.asarray(
        jax.random.normal(key, (args.batch, d), jnp.float32), np.float64
    )
    y0s_np = np.asarray(y0, np.float64)[None] * (1.0 + noise)
    y0s = jnp.asarray(y0s_np, jnp.float32)
    tols = np.full((args.batch,), args.tol, np.float32)

    solve = batched_hi.make_hi_solver(
        vf, (), save_at=save_at, dt0=1e-5, engine=args.engine,
        lanes=args.lanes if args.engine.startswith("pallas") else None,
    )
    us, _uf, n = solve(y0s, tols)  # compile + warm
    harness.device_sync(us[0])
    t0 = time.perf_counter()
    us, _uf, n = solve(y0s, tols)
    harness.device_sync(us[0])
    el = time.perf_counter() - t0
    u64 = batched_hi.combine64(us)
    n = np.asarray(n)

    truth = _truth_rows(y0s_np[: args.sample].astype(np.float64), args.N, save_at)
    rmse = float(np.sqrt(np.mean((u64[: args.sample] - truth) ** 2)))
    assert np.all(np.isfinite(u64)), "non-finite lanes"
    assert rmse < 1e3 * args.tol, f"accuracy gate failed: rmse={rmse:.2e}"

    row = {
        "N": args.N,
        "state_dim": d,
        "tol": args.tol,
        "engine": args.engine,
        "batch": args.batch,
        "seconds": round(el, 4),
        "solves_per_sec": round(args.batch / el, 1),
        "rmse_vs_lsoda": rmse,
        "mean_steps": round(float(np.mean(n[:, -1])), 1),
        "max_steps": int(np.max(n)),
    }
    print(json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data_batched_tpu.json")
    # one row per (N, tol, engine, batch) configuration
    try:
        with open(out) as f:
            rows = json.load(f).get("rows", [])
    except (OSError, ValueError):
        rows = []
    keyf = lambda r: (r["N"], r["tol"], r["engine"], r["batch"])  # noqa: E731
    rows = [r for r in rows if keyf(r) != keyf(row)] + [row]
    rows.sort(key=keyf)
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
