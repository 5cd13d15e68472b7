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
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)  # (m, 1)
    iota_n3 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)  # (1, n, 1)
    for j in range(min(n, m - 1)):
        # column j extracted via a one-hot contraction over the (full,
        # zero-offset) array: Mosaic forbids float reductions over operands
        # whose layout carries a sublane offset, which sliced columns do.
        colmask = (iota_n3 == j).astype(x.dtype)
        col = jnp.sum(x * colmask, axis=1)  # (m, B)
        below = (iota_m >= j).astype(x.dtype)
        is_j = (iota_m == j).astype(x.dtype)
        colm = col * below
        norm2 = jnp.sum(colm * colm, axis=0, keepdims=True)
        norm = jnp.sqrt(norm2 + eps)
        head = jnp.sum(colm * is_j, axis=0, keepdims=True)  # (1, B)
        sign = jnp.where(head >= 0, 1.0, -1.0).astype(x.dtype)
        alpha = -sign * norm
        v = colm - is_j * alpha
        # ||v||^2 = ||colm||^2 + alpha^2 - 2 head alpha  (no extra reduction)
        vnorm2 = norm2 + alpha * alpha - 2.0 * head * alpha
        safe = vnorm2 > eps
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        coeff = jnp.sum(v[:, None, :] * x, axis=0)  # (n, B)
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
