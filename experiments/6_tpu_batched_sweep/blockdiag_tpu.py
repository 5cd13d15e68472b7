"""Blockdiag fused-engine throughput on TPU (no reference equivalent).

Measures the round-3 blockdiag lanes-last engine (batched_blockdiag:
per-dimension (n, n) covariance factors + per-dimension output scales as an
extra sublane axis) on an ANISOTROPIC rigid body -- the third state
component rescaled by 1e4, so one shared isotropic output scale misfits the
per-dimension magnitudes by 4 decades.  This is the workload class the
blockdiag factorization exists for (probdiffeq's blockdiag impl family,
SURVEY.md section 2); the reference exercises isotropic/dense only.

Compares, at equal tolerance on one chip:
* blockdiag engines (pallas-loop / pallas / xla) -- per-dimension sigmas,
* the isotropic fused engine -- one shared sigma (accuracy foil).

Usage: python blockdiag_tpu.py [--batch 4096] [--tol 1e-5]
Writes data_blockdiag.json next to this script.
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

SCALE = np.array([1.0, 1.0, 1e4])  # third component 4 decades larger


def _vf_scaled(u, *, t, p):
    """Rigid body in rescaled coordinates z = SCALE * y (reference problem:
    /root/reference/experiments/2_workprec_simple/run_simple.py via
    diffeqzoo rigid_body; anisotropy is ours).  ``u`` is the (d, ...) state
    stack (same row-indexed contract as problems.rigid_body)."""
    del t
    p1, p2, p3 = p
    s3 = float(SCALE[2])
    return jnp.stack(
        [
            p1 * u[1] * (u[2] / s3),
            p2 * u[0] * (u[2] / s3),
            s3 * p3 * u[0] * u[1],
        ]
    )


def _truth_rows(rows, save_at):
    import scipy.integrate

    p1, p2, p3 = -2.0, 1.25, -0.5

    def vf_np(_t, z):
        y = z / SCALE
        return SCALE * np.array(
            [p1 * y[1] * y[2], p2 * y[0] * y[2], p3 * y[0] * y[1]]
        )

    outs = []
    for row in rows:
        sol = scipy.integrate.solve_ivp(
            vf_np, (float(save_at[0]), float(save_at[-1])), row,
            t_eval=save_at, rtol=1e-12, atol=1e-10, method="LSODA",
        )
        outs.append(sol.y.T)
    return np.stack(outs)


def main(batch=4096, tol=1e-5, sample=64):
    from odecheckpts_tpu import batched, harness

    params = (-2.0, 1.25, -0.5)
    u0 = np.array([1.0, 0.0, 0.9]) * SCALE
    save_at_np = np.linspace(0.0, 50.0, num=5)
    save_at = jnp.asarray(save_at_np, jnp.float32)

    key = jax.random.PRNGKey(0)
    noise = np.asarray(jax.random.normal(key, (batch, 3), jnp.float32), np.float64)
    u0_rows = u0[None] * (1.0 + 0.05 * noise)
    u0s = jnp.asarray(u0_rows, jnp.float32)
    tols = jnp.full((batch,), tol, jnp.float32)
    truth = _truth_rows(np.asarray(u0s[:sample], np.float64), save_at_np)

    # relative-to-scale RMSE so the 1e4 component doesn't dominate the metric
    def rel_rmse(u):
        err = (np.asarray(u[:sample], np.float64) - truth) / SCALE[None, None]
        return float(np.sqrt(np.mean(err * err)))

    rows = []
    for impl, engine in [
        ("blockdiag", "pallas-loop"),
        ("blockdiag", "pallas"),
        ("blockdiag", "xla"),
        ("isotropic", "pallas-loop"),
    ]:
        solve = jax.jit(
            lambda u, impl_=impl, eng_=engine: batched.solve_save_at_batched(
                _vf_scaled, u, params, save_at=save_at, dt0=0.01, tols=tols,
                engine=eng_, implementation=impl_,
            )
        )
        try:
            u_s, _u_f, n = solve(u0s)
            harness.device_sync(u_s)
            t0 = time.perf_counter()
            u_s, _u_f, n = solve(u0s)
            harness.device_sync(u_s)
            elapsed = time.perf_counter() - t0
        except Exception as e:  # engine unsupported on this platform
            print(f"# {impl}/{engine} failed: {e!r}", file=sys.stderr)
            continue
        row = {
            "implementation": impl,
            "engine": engine,
            "seconds": round(elapsed, 4),
            "solves_per_sec": round(batch / elapsed, 1),
            "rel_rmse": rel_rmse(u_s),
            "mean_steps": round(float(jnp.mean(n[:, -1].astype(jnp.float32))), 1),
        }
        rows.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)

    out = {"batch": batch, "tol": tol, "scale": SCALE.tolist(), "rows": rows}
    here = pathlib.Path(__file__).resolve().parent
    with open(here / "data_blockdiag.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--sample", type=int, default=64)
    a = ap.parse_args()
    main(batch=a.batch, tol=a.tol, sample=a.sample)
