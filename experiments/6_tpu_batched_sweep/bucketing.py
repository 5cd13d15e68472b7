"""Mixed-tolerance bucketing throughput on TPU (round-1 ROADMAP item 2).

A mixed-tolerance ensemble pads every lane of the batched while loop to the
slowest (tightest-tolerance) lane; ``batched.make_bucketed_solver`` sorts
lanes by tolerance and solves equal-size buckets (one shared compile), so
total padded LANE-iterations drop to sum_b |bucket| x steps(bucket).

Regime analysis (measured): per-while-iteration cost is launch-overhead
bound below ~32k lanes, so splitting a small batch into narrower buckets
REDUCES width without reducing wall time per iteration -- bucketing loses
there (measured 0.24x at f64 batch 4096/8 buckets).  The win appears when
each bucket alone saturates the chip: this script runs the f32/Pallas
engine at batch 8x32768 with per-bucket width 32768 (the bench.py
saturation point), tolerances log-uniform over the f32 range 1e-5..1e-1.
(The other honest deployment is one bucket per device via
``parallel.shard_fused_solve``.)
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
# NB stays f32: enabling x64 promotes weak literals inside the Pallas kernel
# to f64 and Mosaic's layout inference aborts on 64-bit vectors

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import batched, harness, problems  # noqa: E402


def main(batch=8 * 32768, num_buckets=8, engine="pallas"):
    dtype = jnp.float32
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    save_at = jnp.linspace(*tspan, num=5, dtype=dtype)
    key = jax.random.PRNGKey(0)
    u0s = jnp.asarray(
        u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3))), dtype
    )
    # log-uniform tolerances over the f32 work-precision range, shuffled
    # (the realistic worst case for unbucketed padding)
    exps = np.random.default_rng(0).uniform(-5, -1, size=batch)
    tols = jnp.asarray(10.0**exps, dtype)

    kw = dict(save_at=save_at, dt0=0.1, engine=engine,
              lanes=1024 if engine == "pallas" else None)

    def timed(fn):
        out = fn()  # compile + warm
        harness.device_sync(out)
        t0 = time.perf_counter()
        out = fn()
        harness.device_sync(out)
        return time.perf_counter() - t0

    solve_unbucketed = jax.jit(
        lambda u, t: batched.solve_save_at_batched(vf, u, params, tols=t, **kw)
    )
    t_unbucketed = timed(lambda: solve_unbucketed(u0s, tols)[0])
    solve_bucketed = batched.make_bucketed_solver(
        vf, params, num_buckets=num_buckets, **kw
    )
    (u_b, _uf, _n), bucket_max = solve_bucketed(u0s, tols)
    assert bool(jnp.all(jnp.isfinite(u_b)))
    t_bucketed = timed(lambda: solve_bucketed(u0s, tols)[0][0])
    result = {
        "batch": batch,
        "num_buckets": num_buckets,
        "engine": engine,
        "tol_range": "1e-5..1e-1 log-uniform (f32)",
        "unbucketed_s": round(t_unbucketed, 4),
        "bucketed_s": round(t_bucketed, 4),
        "speedup": round(t_unbucketed / t_bucketed, 3),
        "bucket_max_steps": bucket_max,
    }
    print(json.dumps(result), flush=True)
    here = os.path.dirname(__file__)
    with open(os.path.join(here, "data_bucketing.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8 * 32768)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--engine", choices=["pallas", "xla"], default="pallas")
    a = ap.parse_args()
    main(batch=a.batch, num_buckets=a.buckets, engine=a.engine)
