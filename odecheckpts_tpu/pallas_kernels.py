"""Pallas (Mosaic/TPU) kernels for the solver's hot batched small-matrix ops.

The adaptive step's linear algebra is thousands of independent tiny
factorizations -- (2n, n) QR stacks with n = nu+1 <= 9 -- living under a
``vmap`` over the IVP ensemble.  The TPU-native layout for that workload is
*batch-in-lanes*: matrices are stored (rows, cols, B) so every Householder
reflection is an elementwise/VPU op across 128 ensemble lanes at once and a
reduction over the (tiny) row axis; no per-matrix control flow, no MXU
involvement, one kernel launch for the whole batch.

``batched_qr_r`` is the foundational kernel (SURVEY.md section 7, hard part
#5); it is numerics-equivalence-gated against ``linalg.qr_r`` in
tests/test_pallas.py and falls back to the pure-jnp path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import linalg

LANES = 128


def _qr_r_kernel(x_ref, out_ref, *, m, n):
    """In-kernel unrolled Householder on a (m, n, LANES) tile.

    Full-matrix masked reflections (see batched._qr_r_ll for the Mosaic
    layout rationale): reflectors are zero-masked full columns, applied to
    every column; already-eliminated columns are untouched by construction.
    """
    x = x_ref[...]  # (m, n, LANES)
    eps = jnp.finfo(x.dtype).tiny
    k = min(m, n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    for j in range(min(n, m - 1)):
        col = jnp.squeeze(jax.lax.slice_in_dim(x, j, j + 1, axis=1), 1)
        below = (rows >= j).astype(x.dtype)
        colm = col * below
        norm = jnp.sqrt(jnp.sum(colm * colm, axis=0, keepdims=True) + eps)
        head = jax.lax.slice_in_dim(col, j, j + 1, axis=0)
        sign = jnp.where(head >= 0, 1.0, -1.0).astype(x.dtype)
        alpha = -sign * norm
        is_j = (rows == j).astype(x.dtype)
        v = colm - is_j * alpha
        vnorm2 = jnp.sum(v * v, axis=0, keepdims=True)
        safe = vnorm2 > eps
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        coeff = jnp.sum(v[:, None, :] * x, axis=0)  # (n, LANES)
        x = x - inv[:, None, :] * v[:, None, :] * coeff[None, :, :]
    r = x[:k, :, :]
    # sign-normalize the diagonal (uniqueness across backends)
    d = jnp.concatenate(
        [jax.lax.slice_in_dim(r[i], i, i + 1, axis=0) for i in range(k)], axis=0
    )  # (k, LANES)
    d = jnp.where(d >= 0, 1.0, -1.0).astype(x.dtype)
    out_ref[...] = r * d[:, None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_qr_r(x, interpret: bool = False):
    """R factors of a batch of small matrices, batch-in-lanes Pallas kernel.

    ``x``: (B, m, n) with B a multiple of 128 (pad otherwise); returns
    (B, min(m, n), n) matching ``vmap(linalg.qr_r)`` up to roundoff.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m, n = x.shape
    k = min(m, n)
    pad = (-b) % LANES
    if pad:
        x = jnp.concatenate([x, jnp.ones((pad, m, n), x.dtype)], axis=0)
    bb = x.shape[0]
    x_t = jnp.moveaxis(x, 0, -1)  # (m, n, BB)

    out = pl.pallas_call(
        functools.partial(_qr_r_kernel, m=m, n=n),
        out_shape=jax.ShapeDtypeStruct((k, n, bb), x.dtype),
        grid=(bb // LANES,),
        in_specs=[
            pl.BlockSpec((m, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (k, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_t)
    out = jnp.moveaxis(out, -1, 0)
    return out[:b]


def batched_qr_r_reference(x):
    """Pure-jnp equivalent (the vmapped unrolled Householder)."""
    return jax.vmap(linalg.qr_r)(x)
