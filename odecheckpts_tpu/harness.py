"""Benchmark harness: work-precision sweeps, timing protocols, memory stats.

Parity with the measurement machinery embedded in the reference's experiment
scripts:

* ``workprec``        -- parameter->(work, precision, memory-proxy) sweeps
  (/root/reference/experiments/2_workprec_simple/run_simple.py:181-217)
* ``rmse_absolute``   -- RMSE vs a reference trajectory (same file :169-178)
* ``timeit_fun``      -- warm-up + ``timeit.repeat`` protocol (:159-166)
* ``jit_and_time``    -- warm-started perf_counter protocol
  (/root/reference/experiments/1_van_der_pol/vdp.py:28-43)
* ``runtime_min``     -- min-of-R protocol
  (/root/reference/experiments/5_vs_interpolation/measure.py:230-239)
* ``nbytes_of_tree``  -- ravel_pytree-based memory accounting
  (/root/reference/experiments/4_brusselator/run.py:74)
* ``device_memory_stats`` -- live on-device allocation statistics, the
  TPU-faithful replacement for host-side estimates (SURVEY.md hard part #6)
"""

from __future__ import annotations

import statistics
import time
import timeit
from typing import Callable

import jax
import jax.flatten_util
import jax.numpy as jnp


def rmse_absolute(expected) -> Callable:
    expected = jnp.asarray(expected)

    def rmse(received):
        received = jnp.asarray(received)
        err = jnp.abs(expected - received)
        return jnp.linalg.norm(err) / jnp.sqrt(err.size)

    return rmse


def device_sync(tree):
    """Synchronize with the device execution queue; use this (never bare
    ``jax.block_until_ready``) to end a timed region.

    ``block_until_ready`` alone is NOT sufficient through the axon TPU
    relay: dispatches pipeline, and the ready marker can resolve before the
    program has actually executed (measured: a 4096-step sequential scan
    "timed" at 0.09 ms via block_until_ready vs 106 ms with a host read;
    large-output programs hit the relay's backpressure and time correctly,
    which is why the wide batched-bench rows were unaffected).  Reading one
    element of one output buffer back to the host adds a data dependency the
    queue must drain.  Costs one tiny host RTT.  Assumes the timed region is
    one executable (all leaves come from the same program) -- true for every
    jitted solve here."""
    tree = jax.block_until_ready(tree)
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        x = leaves[0]
        jax.device_get(x.ravel()[:1] if x.ndim else x)
    return tree


def timeit_fun(repeats: int = 3) -> Callable:
    def timer(fun, /):
        _ = fun()  # warm-up (compile excluded)
        return list(timeit.repeat(fun, number=1, repeat=repeats))

    return timer


def runtime_min(function: Callable, num_runs: int = 3) -> float:
    cts = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        out = function()
        device_sync(out)
        t1 = time.perf_counter()
        cts.append(t1 - t0)
    return min(cts)


def jit_and_time(fun: Callable) -> Callable:
    """Warm-started wall-clock timing of a jitted thunk; returns
    (runtime_seconds, output)."""
    fun = jax.jit(fun)

    def fun_wrapped():
        out = fun()
        device_sync(out)
        t0 = time.perf_counter()
        out = fun()
        device_sync(out)
        t1 = time.perf_counter()
        return t1 - t0, out

    return fun_wrapped


def timed_cold(fun: Callable, *args, **kwargs):
    """One-shot wall clock INCLUDING compilation: caches are cleared first,
    the call traces/compiles/runs fresh, and every output leaf is blocked on.
    Returns (seconds, output).

    This is the peak-memory-realistic protocol of the memory-scaling
    experiment (/root/reference/experiments/4_brusselator/run.py:19,81):
    cache reuse would hide the allocation profile of a cold solve.
    """
    jax.clear_caches()
    t0 = time.perf_counter()
    out = fun(*args, **kwargs)
    device_sync(out)
    return time.perf_counter() - t0, out


def nbytes_of_tree(tree) -> int:
    flat, _ = jax.flatten_util.ravel_pytree(tree)
    return flat.nbytes


def device_memory_stats():
    """Per-device allocator statistics where the backend exposes them."""
    stats = {}
    for dev in jax.devices():
        try:
            stats[str(dev)] = dev.memory_stats()
        except Exception:
            stats[str(dev)] = None
    return stats


def workprec(fun, *, precision_fun: Callable, timeit_fun: Callable) -> Callable:
    """Turn param->(solution, aux) into params->work-precision records.

    Record schema matches the reference exactly (run_simple.py:208-215):
    list_of_args / length_of_longest_vector / work_min / work_mean /
    work_std / precision.
    """

    def parameter_list_to_workprecision(list_of_args, /):
        works_min, works_mean, works_std = [], [], []
        precisions, lengths = [], []
        for arg in list_of_args:
            sol, aux = fun(arg)
            precisions.append(precision_fun(sol))
            lengths.append(len(aux["u0_solve"]))
            times = timeit_fun(lambda: device_sync(fun(arg)[0]))  # noqa: B023
            works_min.append(min(times))
            works_mean.append(statistics.mean(times))
            works_std.append(statistics.stdev(times) if len(times) > 1 else 0.0)
        return {
            "list_of_args": list_of_args,
            "length_of_longest_vector": jnp.asarray(lengths),
            "work_min": jnp.asarray(works_min),
            "work_mean": jnp.asarray(works_mean),
            "work_std": jnp.asarray(works_std),
            "precision": jnp.asarray(precisions),
        }

    return parameter_list_to_workprecision

class debug_nans:
    """Context: enable jax's NaN debugging (``jax_debug_nans``) in a scope.

    The SURVEY §5 sanitizer analogue (the reference only asserts NaNs post
    hoc, vdp.py:107-108).  Best used around a WHOLE program region from
    process start: jax's check rides on the jit dispatch path and prior
    dispatch activity in the process can leave fastpaths that skip it (also
    the reason this context clears the compilation caches on entry).  For a
    deterministic per-call guard use :func:`nan_guard`.
    """

    def __init__(self, enable: bool = True):
        self.enable = enable

    def __enter__(self):
        self.prev = jax.config.jax_debug_nans
        jax.config.update("jax_debug_nans", self.enable)
        # dispatch fastpaths compiled while the flag was off skip the check
        jax.clear_caches()
        return self

    def __exit__(self, *exc):
        jax.config.update("jax_debug_nans", self.prev)
        return False


def nan_guard(fn, name: str = "function"):
    """Wrap ``fn``: raise FloatingPointError if any output leaf contains a
    non-finite value.  Deterministic (checks materialized outputs; works with
    any dispatch path, unlike the global ``jax_debug_nans`` flag)."""

    def guarded(*args, **kwargs):
        out = fn(*args, **kwargs)
        leaves = jax.tree.leaves(out)
        for i, leaf in enumerate(leaves):
            arr = jnp.asarray(leaf)
            if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
                jnp.all(jnp.isfinite(arr))
            ):
                raise FloatingPointError(
                    f"non-finite values in output leaf {i} of {name}"
                )
        return out

    return guarded


def profiler_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace around a benchmark region.

    TPU-faithful replacement for the reference's wall-clock-only protocol
    (SURVEY.md section 5: "add jax.profiler trace option for TPU").  View with
    TensorBoard or xprof.
    """
    return jax.profiler.trace(log_dir)


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
