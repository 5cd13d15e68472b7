"""Exp-4's memory claim, measured on-device (VERDICT round-3 #7).

The committed exp-4 result (run.py, port of
/root/reference/experiments/4_brusselator/run.py:69-77) MODELS the textbook
smoother's memory as steps x 3-copy state size — the reference's own
protocol.  SURVEY §7 hard-part #6 asks the rebuild to graduate that model to
a live device measurement.  The axon relay exposes no allocator stats
(``device.memory_stats()`` is None), so the live quantity used here is the
next-best — and arguably the sharper — one: XLA's compiled BUFFER ASSIGNMENT
(``compiled.memory_analysis()``), the exact HBM reservation (arguments,
outputs, temporaries) the program needs on chip.  Unlike an allocator
high-water mark it cannot under-report transient peaks: it is what the
runtime reserves before the program may run.

Two programs over the same Brusselator solve (same problem, prior,
correction, controller, tolerance):

* ``save_at``    — `solve_adaptive_save_at` on K checkpoints: the paper's
  O(#checkpoints) flagship driver.
* ``every_step`` — `solve_adaptive_save_every_step_bounded` with
  max_steps >= the measured adaptive step count: the textbook O(#steps)
  baseline (every accepted state + backward conditional retained).

Both are also executed once (wall clock recorded) so the numbers describe
programs that actually ran, and the modeled steps x 3 x state estimate is
recorded next to the measured bytes.

Usage: python memory_live.py [--N 64] [--tol 1e-4] [--checkpoints 200]
Writes data_memory_live.json next to this script.  Default platform is the
chip (axon); ODECKPT_PLATFORM=cpu for a smoke run.
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

import jax.flatten_util  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import (  # noqa: E402
    harness, ivpsolve, ivpsolvers, problems, taylor,
)


def _setup(N, tol):
    """f32 variant of run.py's _setup (the chip's native band)."""
    vf, u0, (t0, t1), params = problems.brusselator(N=N)
    u0 = jnp.asarray(u0, jnp.float32)
    params = jax.tree.map(jnp.float32, params)
    prior = ivpsolvers.prior_ibm(
        num_derivatives=4, ode_shape=(2 * N,), implementation="isotropic"
    )
    ts0 = ivpsolvers.correction_ts0(ode_order=1, error_calibration=1.0)
    ctrl = ivpsolve.control_proportional_integral()
    solver = ivpsolvers.solver_dynamic(
        ivpsolvers.strategy_fixedpoint(prior, ts0)
    )
    asolver = ivpsolve.adaptive(solver, atol=tol, rtol=tol, control=ctrl)
    tcoeffs = taylor.odejet_unroll(
        lambda *y: vf(*y, t=jnp.float32(t0), p=params), u0, num=4
    )
    init = solver.initial_condition(tcoeffs, jnp.float32(1.0))

    def vf_p(*ys, t):
        return vf(*ys, t=t, p=params)

    state_bytes = jax.flatten_util.ravel_pytree(init)[0].nbytes
    return vf_p, init, (jnp.float32(t0), jnp.float32(t1)), asolver, state_bytes


def _mem(compiled):
    ma = compiled.memory_analysis()
    return {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "generated_code_bytes": int(ma.generated_code_size_in_bytes),
        "total_bytes": int(
            ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            + ma.temp_size_in_bytes
        ),
    }


def _compile_run(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    harness.device_sync(out)
    t0 = time.perf_counter()
    out = compiled(*args)
    harness.device_sync(out)
    wall = time.perf_counter() - t0
    return _mem(compiled), wall, out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--checkpoints", type=int, default=200)
    args = ap.parse_args(argv)

    vf, init, (t0, t1), asolver, state_bytes = _setup(args.N, args.tol)

    # step count first (O(1)-memory driver) so max_steps covers the run
    sol_tv = jax.jit(
        lambda i: ivpsolve.solve_adaptive_terminal_values(
            vf, i, t0=t0, t1=t1, dt0=0.01, adaptive_solver=asolver
        )
    )(init)
    harness.device_sync(sol_tv.u)
    nsteps = int(sol_tv.num_steps)
    max_steps = 1 << int(np.ceil(np.log2(nsteps + 2)))
    print(f"N={args.N} tol={args.tol:g}: {nsteps} adaptive steps "
          f"-> max_steps={max_steps}", flush=True)

    save_at = jnp.linspace(t0, t1, num=args.checkpoints)
    mem_ckpt, wall_ckpt, _sol = _compile_run(
        lambda i: ivpsolve.solve_adaptive_save_at(
            vf, i, save_at=save_at, dt0=0.01, adaptive_solver=asolver
        ),
        init,
    )
    print(f"save_at[K={args.checkpoints}]: out+temp "
          f"{(mem_ckpt['output_bytes'] + mem_ckpt['temp_bytes']) / 2**20:.2f}"
          f" MiB, wall {wall_ckpt * 1e3:.1f} ms", flush=True)

    mem_every, wall_every, _sol2 = _compile_run(
        lambda i: ivpsolve.solve_adaptive_save_every_step_bounded(
            vf, i, t0=t0, t1=t1, dt0=0.01, adaptive_solver=asolver,
            max_steps=max_steps,
        ),
        init,
    )
    print(f"every_step[max={max_steps}]: out+temp "
          f"{(mem_every['output_bytes'] + mem_every['temp_bytes']) / 2**20:.2f}"
          f" MiB, wall {wall_every * 1e3:.1f} ms", flush=True)

    modeled = nsteps * 3 * state_bytes
    live_ckpt = mem_ckpt["output_bytes"] + mem_ckpt["temp_bytes"]
    live_every = mem_every["output_bytes"] + mem_every["temp_bytes"]
    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "N": args.N,
        "tol": args.tol,
        "dtype": "float32",
        "num_steps": nsteps,
        "max_steps": max_steps,
        "checkpoints": args.checkpoints,
        "state_bytes": state_bytes,
        "modeled_textbook_bytes": modeled,
        "save_at": {"memory": mem_ckpt, "wall_s": wall_ckpt},
        "every_step": {"memory": mem_every, "wall_s": wall_every},
        "measured_ratio_every_over_ckpt": live_every / max(live_ckpt, 1),
        "note": "memory = XLA buffer assignment (memory_analysis) of the "
                "executed program; allocator stats unavailable through the "
                "axon relay",
    }
    path = pathlib.Path(__file__).parent / "data_memory_live.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")
    print(f"measured every_step/save_at live-bytes ratio: "
          f"{out['measured_ratio_every_over_ckpt']:.1f}x "
          f"(modeled textbook {modeled / 2**20:.1f} MiB)")
    return out


if __name__ == "__main__":
    main()
