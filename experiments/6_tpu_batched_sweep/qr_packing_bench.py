"""Op-packing microbenchmark for the in-kernel Householder QR (ROADMAP #2).

Hypothesis under test: repacking the column-list QR (n standalone (m, B)
arrays, reflections touch only not-yet-eliminated columns) into ONE masked
(m, n, B) matrix (each reflection = a few WIDE ops over all n columns,
including already-eliminated ones) trades instruction count for wasted
vector width.  The analysis says the step kernel is vreg-THROUGHPUT-bound,
not issue-bound, so packing should LOSE by ~the wasted-width ratio
(sum_j n / sum_j (n - j) ~ 2x at n = m/2); this measures it.

Both variants run K iterations inside one Pallas kernel (amortizing launch)
on the revert-QR shape of the production step: m = 2n rows, n columns,
B-lane tiles.

Usage: python qr_packing_bench.py [--lanes 512] [--iters 200]
Writes data_qr_packing.json next to this script.
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from odecheckpts_tpu.batched import _qr_r_cols  # noqa: E402
from odecheckpts_tpu import harness  # noqa: E402


def _qr_r_masked(x, m, n):
    """Masked full-matrix Householder QR on ONE (m, n, B) stack.

    The 'packed' alternative: each reflection is four wide ops over the
    whole (m, n, B) block -- including the j already-eliminated columns
    whose updates are multiplied by zero mask anyway.
    """
    eps = jnp.finfo(x.dtype).tiny
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    for j in range(min(n, m - 1)):
        colj = jax.lax.slice_in_dim(x, j, j + 1, axis=1)  # (m, 1, B)
        below = (rows >= j).astype(x.dtype)
        is_j = (rows == j).astype(x.dtype)
        colm = colj * below
        norm2 = jnp.sum(colm * colm, axis=0, keepdims=True)
        norm = jnp.sqrt(norm2 + eps)
        head = jnp.sum(colm * is_j, axis=0, keepdims=True)
        sign = jnp.where(head >= 0, 1.0, -1.0).astype(x.dtype)
        alpha = -sign * norm
        v = colm - is_j * alpha  # (m, 1, B)
        vnorm2 = norm2 + alpha * alpha - 2.0 * head * alpha
        safe = vnorm2 > eps
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        # wide update over ALL columns; mask keeps eliminated ones intact
        coeff = jnp.sum(v * x, axis=0, keepdims=True)  # (1, n, B)
        active = (cols >= j).astype(x.dtype)
        x = x - (inv * v) * (coeff * active)
    return x


def _bench_kernel(variant, m, n, lanes, iters, interpret=False):
    """K QR iterations inside one kernel; returns a compiled callable.

    The column-list variant takes the n columns as SEPARATE (m, B) refs,
    exactly like the production step kernel builds them (zero-offset
    standalone arrays; a middle-axis offset slice of one packed block is
    itself a Mosaic layout hazard -- the packed variant carries that
    representation, which is part of what is being measured)."""

    if variant == "cols":
        def kernel(*refs):
            in_refs, out_refs = refs[:n], refs[n:]

            def body(k, cols):
                p = 1e-6 * k.astype(cols[0].dtype)
                return tuple(_qr_r_cols([c + p for c in cols], m, n))

            cols = jax.lax.fori_loop(
                0, iters, body, tuple(r[...] for r in in_refs)
            )
            for r, c in zip(out_refs, cols):
                r[...] = c

        spec = pl.BlockSpec((m, lanes), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

        @jax.jit
        def run(x):
            b = x.shape[-1]
            cols_in = [x[:, c, :] for c in range(n)]
            outs = pl.pallas_call(
                kernel,
                grid=(b // lanes,),
                in_specs=[spec] * n,
                out_specs=[spec] * n,
                out_shape=[
                    jax.ShapeDtypeStruct((m, b), x.dtype) for _ in range(n)
                ],
                interpret=interpret,
            )(*cols_in)
            return jnp.stack(outs, axis=1)

        return run

    def kernel(x_ref, o_ref):
        def body(k, x):
            # perturb so the loop cannot be hoisted/folded
            x = x + 1e-6 * k.astype(x.dtype)
            return _qr_r_masked(x, m, n)

        o_ref[...] = jax.lax.fori_loop(0, iters, body, x_ref[...])

    spec = pl.BlockSpec((m, n, lanes), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(x):
        b = x.shape[-1]
        return pl.pallas_call(
            kernel,
            grid=(b // lanes,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x)

    return run


def main(lanes=512, iters=200, batch=8192, nu=4):
    n = nu + 1
    m = 2 * n
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, 2 * n, batch), jnp.float32)

    # correctness first: both variants agree in interpret mode
    r_cols = _bench_kernel("cols", m, 2 * n, 8, 1, interpret=True)(x[..., :8])
    r_mask = _bench_kernel("masked", m, 2 * n, 8, 1, interpret=True)(x[..., :8])
    tri_c = np.triu(np.moveaxis(np.asarray(r_cols), -1, 0))
    tri_m = np.triu(np.moveaxis(np.asarray(r_mask), -1, 0))
    np.testing.assert_allclose(tri_m, tri_c, rtol=2e-4, atol=2e-5)

    rows = []
    for variant in ("cols", "masked"):
        run = _bench_kernel(variant, m, 2 * n, lanes, iters)
        try:
            out = run(x)
            harness.device_sync(out)
            t0 = time.perf_counter()
            out = run(x)
            harness.device_sync(out)
            elapsed = time.perf_counter() - t0
        except Exception as e:
            print(f"# {variant} failed: {e!r}", file=sys.stderr)
            continue
        qr_per_sec = batch * iters / elapsed
        row = {
            "variant": variant,
            "seconds": round(elapsed, 4),
            "qr_per_sec_millions": round(qr_per_sec / 1e6, 2),
        }
        rows.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)

    out_d = {
        "m": m, "n": 2 * n, "lanes": lanes, "iters": iters, "batch": batch,
        "rows": rows,
    }
    if len(rows) == 2:
        out_d["packed_over_cols"] = round(
            rows[1]["seconds"] / rows[0]["seconds"], 3
        )
    here = pathlib.Path(__file__).resolve().parent
    with open(here / "data_qr_packing.json", "w") as f:
        json.dump(out_d, f, indent=1)
    print(json.dumps(out_d))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8192)
    a = ap.parse_args()
    main(lanes=a.lanes, iters=a.iters, batch=a.batch)
