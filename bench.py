"""Headline benchmark: batched adaptive probabilistic solves per second.

Workload: the reference's work-precision configuration (rigid body, TS0(4),
fixedpoint strategy, 5 checkpoints, adaptive PI control -- see
/root/reference/experiments/2_workprec_simple/run_simple.py:49-56) executed as
a vmapped IVP ensemble on one TPU chip, swept over tolerances.

Baseline: the reference's committed CPU timings for the same solver/problem
(BASELINE.md experiment 2: TS0(4) "jit loop" work_min per tolerance).  The
metric divides batched TPU throughput by the reference's single-solve CPU
rate at matched tolerances; BASELINE.json's target for this number is >= 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


# Reference work_min (seconds per solve) decoded from the committed
# experiments/2_workprec_simple/data_results.npy, key "TS0(4) (jit loop)"
# (BASELINE.md experiment 2).  NB the reference multiplies the labeled
# tolerance by 100 before building the solver (run_simple.py:40-42), so the
# rows labeled 1e-3 / 1e-5 ran the probabilistic solver at rtol 1e-1 / 1e-3
# with atol = 1e-3 * rtol -- the exact configs reproduced here (f32-safe).
_REFERENCE_SECONDS_PER_SOLVE = {
    1e-1: 0.0145,
    1e-3: 0.0185,
}


def main():
    from odecheckpts_tpu import parallel, problems

    dtype = jnp.float32
    vf, (u0,), tspan, params = problems.rigid_body()
    u0 = u0.astype(dtype)
    save_at = jnp.linspace(*tspan, num=5, dtype=dtype)
    batch = 1024

    solve_batch = parallel.build_batched_solve("ts0-4", vf, u0, save_at, dt0=0.1)
    solve_jit = jax.jit(lambda u, t: solve_batch(u, params, t))

    key = jax.random.PRNGKey(0)
    u0s = (
        u0[None]
        * (1.0 + 0.05 * jax.random.normal(key, (batch, u0.shape[0]), dtype)),
    )

    total_solves = 0
    total_time = 0.0
    ref_time_per_solve = []
    for tol, ref_s in _REFERENCE_SECONDS_PER_SOLVE.items():
        tols = jnp.full((batch,), tol, dtype)
        u, steps = solve_jit(u0s, tols)  # compile + warm up
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        u, steps = solve_jit(u0s, tols)
        jax.block_until_ready(u)
        elapsed = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(u))), f"non-finite solution at tol={tol}"
        total_solves += batch
        total_time += elapsed
        ref_time_per_solve.append(ref_s)

    solves_per_s = total_solves / total_time
    ref_solves_per_s = len(ref_time_per_solve) / sum(ref_time_per_solve)
    print(
        json.dumps(
            {
                "metric": "batched_adaptive_solves_per_sec",
                "value": round(solves_per_s, 2),
                "unit": "solves/s (rigid body TS0(4) save_at, batch 1024, tol 1e-3..1e-5)",
                "vs_baseline": round(solves_per_s / ref_solves_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
