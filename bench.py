"""Headline benchmark: batched adaptive probabilistic solves per second.

Workload: the reference's work-precision configuration (rigid body, TS0(4),
fixedpoint strategy, 5 checkpoints, adaptive PI control -- see
/root/reference/experiments/2_workprec_simple/run_simple.py:49-56) executed as
a 1024-member IVP ensemble on one TPU chip, swept over tolerances, using the
fused lanes-last Pallas step kernel (batched.solve_save_at_batched) with the
generic vmapped path as fallback.

Baseline: the reference's committed CPU timings for the same solver/problem
(BASELINE.md experiment 2: TS0(4) "jit loop" work_min per tolerance).  NB the
reference multiplies its labeled tolerance by 100 before building the solver
(run_simple.py:40-42), so rows labeled 1e-3/1e-5 ran at rtol 1e-1/1e-3 with
atol = 1e-3 * rtol -- the exact configs reproduced here.  The metric divides
batched TPU throughput by the reference's single-solve CPU rate;
BASELINE.json's target for this number is >= 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

# reference work_min seconds/solve at (solver-)rtol 1e-1 and 1e-3
_REFERENCE_SECONDS_PER_SOLVE = {1e-1: 0.0145, 1e-3: 0.0185}


def _run(engine: str):
    from odecheckpts_tpu import batched, problems

    dtype = jnp.float32
    vf, (u0,), tspan, params = problems.rigid_body()
    u0 = u0.astype(dtype)
    save_at = jnp.linspace(*tspan, num=5, dtype=dtype)
    # throughput saturates around 32k lanes on one v5e chip (see ROADMAP)
    batch = 32768
    key = jax.random.PRNGKey(0)
    u0s = u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3), dtype))

    solve = jax.jit(
        lambda u, t: batched.solve_save_at_batched(
            vf, u, params, save_at=save_at, dt0=0.1, tols=t, engine=engine,
            lanes=1024 if engine == "pallas" else None,
        )
    )

    total_solves, total_time = 0, 0.0
    ref_seconds = []
    for rtol, ref_s in _REFERENCE_SECONDS_PER_SOLVE.items():
        tols = jnp.full((batch,), rtol, dtype)
        u_s, _u_f, _n = solve(u0s, tols)  # compile + warm up
        jax.block_until_ready(u_s)
        t0 = time.perf_counter()
        u_s, _u_f, _n = solve(u0s, tols)
        jax.block_until_ready(u_s)
        elapsed = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(u_s))), f"non-finite at rtol={rtol}"
        total_solves += batch
        total_time += elapsed
        ref_seconds.append(ref_s)
    return total_solves / total_time, len(ref_seconds) / sum(ref_seconds)


def main():
    try:
        solves_per_s, ref_rate = _run("pallas")
        engine = "pallas"
    except Exception:
        solves_per_s, ref_rate = _run("xla")
        engine = "xla"
    print(
        json.dumps(
            {
                "metric": "batched_adaptive_solves_per_sec",
                "value": round(solves_per_s, 2),
                "unit": (
                    "solves/s (rigid body TS0(4) fixedpoint save_at, batch 32768, "
                    f"rtol 1e-1/1e-3, fused {engine} step, one TPU chip)"
                ),
                "vs_baseline": round(solves_per_s / ref_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
