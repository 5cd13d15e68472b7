"""Mixed-tolerance bucketing throughput on TPU (round-1 ROADMAP item 2).

A mixed rtol 1e-1..1e-9 ensemble pads every lane of the batched while loop
to the slowest (tightest-tolerance) lane; ``batched.solve_save_at_bucketed``
sorts lanes by tolerance and solves equal-size buckets (one shared compile),
so total padded iterations drop to sum_b |bucket| x steps(bucket).  This
script measures the realized wall-clock gain on one chip (f64/XLA engine:
the full tolerance range needs x64).
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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import batched, problems  # noqa: E402


def main(batch=4096, num_buckets=8):
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    save_at = jnp.linspace(*tspan, num=5)
    key = jax.random.PRNGKey(0)
    u0s = u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3)))
    # log-uniform tolerances over the full work-precision range, shuffled
    # (the realistic worst case for unbucketed padding)
    exps = np.random.default_rng(0).uniform(-9, -1, size=batch)
    tols = jnp.asarray(10.0 ** exps)

    kw = dict(save_at=save_at, dt0=0.1, engine="xla")

    def timed(fn):
        out = fn()  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    solve_unbucketed = jax.jit(
        lambda u, t: batched.solve_save_at_batched(vf, u, params, tols=t, **kw)
    )
    t_unbucketed = timed(lambda: solve_unbucketed(u0s, tols)[0])
    (u_b, _uf, _n), bucket_max = batched.solve_save_at_bucketed(
        vf, u0s, params, tols=tols, num_buckets=num_buckets, **kw
    )
    assert bool(jnp.all(jnp.isfinite(u_b)))
    t_bucketed = timed(
        lambda: batched.solve_save_at_bucketed(
            vf, u0s, params, tols=tols, num_buckets=num_buckets, **kw
        )[0][0]
    )
    result = {
        "batch": batch,
        "num_buckets": num_buckets,
        "tol_range": "1e-9..1e-1 log-uniform",
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--buckets", type=int, default=8)
    a = ap.parse_args()
    main(batch=a.batch, num_buckets=a.buckets)
