"""MXU microbenchmark for the dense engine's big-matrix ops (VERDICT #3 #6).

The fused dense engine (batched_dense.py) reaches (nd, nd) = 20x20 (d=4)
and 40x40 (d=8) covariance factors but runs everything lanes-LAST as
unrolled VPU elementwise ops — by design for the isotropic engine (the
qr-packing bench settled that n=5-sized QRs are vreg-throughput-bound),
but unmeasured at dense sizes where the MXU's 128x128 systolic array could
plausibly win.  This measures the two ops that dominate the dense step, each
in both layouts, on-chip:

* ``transition``: kron(A, I_d) @ L (the IBM extrapolation applied to the
  (nd, nd) covariance factor).
  - ``ll``: lanes-last (nd, nd, B), python-unrolled block-row FMAs — the
    shipped `_apply_a_blocks` pattern (batched_dense.py:91).
  - ``mxu``: lanes-first (B, nd, nd), one batched einsum against the dense
    kron(A, I_d) matrix — XLA maps it to MXU matmuls.
* ``revert_qr``: the (2nd, 2nd) stacked Householder QR of the step's
  covariance revert.
  - ``ll``: the shipped column-list Householder (`batched._qr_r_cols`),
    lanes-last, XLA.
  - ``mxu``: batched `jnp.linalg.qr` on (B, 2nd, 2nd), lanes-first (XLA's
    blocked-reflector QR, matmul-rich).

Each variant runs ``--iters`` dependent iterations under one jit (data
dependence defeats hoisting), timed with `harness.device_sync`.  The
verdict feeds batched_dense's layout choice; whichever way it lands, the
dataset is committed (data_dense_mxu.json).

Usage: python dense_mxu_bench.py [--iters 50] [--batch 1024]
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

from odecheckpts_tpu import harness, linalg  # noqa: E402
from odecheckpts_tpu.batched import _qr_r_cols  # noqa: E402
from odecheckpts_tpu.prior import system_matrices  # noqa: E402


def _a_matrix(nu):
    a, _lq = system_matrices(nu, jnp.float32)
    return np.asarray(a)


def _transition_ll(a_np, d, n):
    """kron(A, I_d) @ x for x (nd, nd, B): unrolled block-row FMAs, the
    shipped `_apply_a_blocks` pattern."""
    a_rows = [[float(a_np[i, j]) for j in range(n)] for i in range(n)]

    def apply(x):
        blocks = [x[j * d:(j + 1) * d] for j in range(n)]
        out = []
        for i in range(n):
            acc = a_rows[i][0] * blocks[0]
            for j in range(1, n):
                acc = acc + a_rows[i][j] * blocks[j]
            out.append(acc)
        return jnp.concatenate(out, axis=0)

    return apply


def _bench(run, x):
    out = run(x)
    harness.device_sync(out)
    t0 = time.perf_counter()
    out = run(x)
    harness.device_sync(out)
    return time.perf_counter() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--nu", type=int, default=4)
    args = ap.parse_args(argv)

    nu, batch, iters = args.nu, args.batch, args.iters
    n = nu + 1
    a_np = _a_matrix(nu)
    rows = []

    for d in (4, 8):
        nd = n * d
        key = jax.random.PRNGKey(d)
        x_ll = jax.random.normal(key, (nd, nd, batch), jnp.float32)
        x_bf = jnp.moveaxis(x_ll, -1, 0)  # (B, nd, nd)
        a_full = jnp.asarray(np.kron(a_np, np.eye(d)), jnp.float32)

        apply_ll = _transition_ll(a_np, d, n)

        @jax.jit
        def run_t_ll(x, _f=apply_ll):
            def body(k, x):
                return _f(x) + 1e-6 * k.astype(x.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        @jax.jit
        def run_t_mxu(x, _a=a_full):
            def body(k, x):
                y = jnp.einsum(
                    "ij,bjk->bik", _a, x,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return y + 1e-6 * k.astype(x.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        # correctness cross-check (one application)
        y_ll = np.moveaxis(np.asarray(apply_ll(x_ll[..., :8])), -1, 0)
        y_bf = np.asarray(
            jnp.einsum("ij,bjk->bik", a_full, x_bf[:8],
                       precision=jax.lax.Precision.HIGHEST)
        )
        np.testing.assert_allclose(y_bf, y_ll, rtol=2e-5, atol=2e-5)

        for label, run, x in [
            ("transition-ll", run_t_ll, x_ll),
            ("transition-mxu", run_t_mxu, x_bf),
        ]:
            try:
                t = _bench(run, x)
            except Exception as e:
                print(f"# d={d} {label} FAILED {e!r}", file=sys.stderr)
                continue
            row = {
                "op": "transition", "variant": label.split("-")[1], "d": d,
                "nd": nd, "batch": batch, "iters": iters,
                "seconds": round(t, 5),
                "applies_per_sec_millions": round(batch * iters / t / 1e6, 3),
            }
            rows.append(row)
            print(f"# {row}", file=sys.stderr, flush=True)

        # revert QR shape: (2nd, 2nd) stacked factor
        m = 2 * nd
        xq_ll = jax.random.normal(key, (m, m, batch), jnp.float32)
        xq_bf = jnp.moveaxis(xq_ll, -1, 0)

        @jax.jit
        def run_q_ll(x):
            def body(k, cols):
                cols = [c + 1e-6 * k.astype(c.dtype) for c in cols]
                return tuple(_qr_r_cols(list(cols), m, m))
            cols0 = tuple(x[:, c, :] for c in range(m))
            outs = jax.lax.fori_loop(0, iters, body, cols0)
            return jnp.stack(outs, axis=1)

        @jax.jit
        def run_q_mxu(x):
            def body(k, x):
                _q, r = jnp.linalg.qr(x + 1e-6 * k.astype(x.dtype))
                return r
            return jax.lax.fori_loop(0, iters, body, x)

        @jax.jit
        def run_q_generic(x):
            # the shipped generic-path routing (linalg.qr_r): since round 5
            # this lands in the fori_loop Householder for 24 < cols <= 128
            # instead of XLA's blocked QR (the "mxu" row above, measured
            # 9.4x slower at (80, 80) in round 4)
            def body(k, x):
                return jax.vmap(linalg.qr_r)(x + 1e-6 * k.astype(x.dtype))
            return jax.lax.fori_loop(0, iters, body, x)

        for label, run, x in [
            ("revert_qr-ll", run_q_ll, xq_ll),
            ("revert_qr-mxu", run_q_mxu, xq_bf),
            ("revert_qr-generic", run_q_generic, xq_bf),
        ]:
            try:
                t = _bench(run, x)
            except Exception as e:
                print(f"# d={d} {label} FAILED {e!r}", file=sys.stderr)
                continue
            row = {
                "op": "revert_qr", "variant": label.split("-")[1], "d": d,
                "m": m, "batch": batch, "iters": iters,
                "seconds": round(t, 5),
                "qr_per_sec_millions": round(batch * iters / t / 1e6, 3),
            }
            rows.append(row)
            print(f"# {row}", file=sys.stderr, flush=True)

    out = {
        "device": str(jax.devices()[0]),
        "nu": nu,
        "rows": rows,
    }
    path = pathlib.Path(__file__).parent / "data_dense_mxu.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
