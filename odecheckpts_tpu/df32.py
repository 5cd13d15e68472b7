"""Compensated double-float ("df32") arithmetic for TPU kernels.

Mosaic lowers no 64-bit types, and XLA's x64-on-TPU emulation costs ~20-50x
(measured: the fused rigid-body step drops from 82k-96k solves/s in f32 to
1.7k-4.4k under x64).  This module provides the classic error-free
transformations (Dekker/Knuth/Moller) over PAIRS of native f32 arrays
(``hi``, ``lo`` with ``|lo| <= ulp(hi)/2``), giving ~2^-48 relative precision
from pure f32 adds/multiplies -- every op is elementwise VPU work that Mosaic
lowers directly.

Used by :mod:`odecheckpts_tpu.batched_hi` to run the rtol 1e-6..1e-9 band of
the reference's work-precision protocol
(/root/reference/experiments/2_workprec_simple/run_simple.py:150-156) inside
one Pallas kernel: solution means, the time axis, and the linearization
residual carry (hi, lo); covariance Cholesky factors and step control stay
plain f32 (they need only a few digits of relative accuracy).

All functions are dtype-polymorphic: on f64 pairs they yield ~2^-104
"double-double" precision, which the tests use as an oracle.

No reference counterpart: the reference runs float64 natively on CPU
(/root/reference/experiments/2_workprec_simple/run_simple.py:147).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "two_sum", "fast_two_sum", "split", "two_prod",
    "wrap", "collapse", "renorm",
    "add", "add1", "sub", "sub1", "neg",
    "mul", "mul1", "div1",
]


def two_sum(a, b):
    """Error-free sum (Knuth/Moller, 6 flops): a + b = s + err exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Error-free sum (Dekker, 3 flops) -- REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _split_const(dtype):
    # 2^ceil(p/2) + 1: Dekker split constant (f32: p=24 -> 4097; f64: p=53)
    return {1: None, 4: 4097.0, 8: 134217729.0}[jnp.dtype(dtype).itemsize]


def split(a):
    """Dekker split: a = hi + lo with hi, lo each holding half the mantissa."""
    c = _split_const(a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product (Dekker, 17 flops without fma): a*b = p + err."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# pair algebra: x = (hi, lo)


def wrap(a):
    """Lift a plain float array to an exact pair."""
    return a, jnp.zeros_like(a)


def collapse(x):
    """Round a pair to the nearest plain float."""
    return x[0] + x[1]


def renorm(hi, lo):
    """Re-establish the non-overlap invariant |lo| <= ulp(hi)/2."""
    return fast_two_sum(hi, lo)


def add(x, y):
    """Pair + pair ("sloppy" double add, ~2 ulp^2 error; 11 flops)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def add1(x, b):
    """Pair + plain float (10 flops)."""
    s, e = two_sum(x[0], b)
    e = e + x[1]
    return fast_two_sum(s, e)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def sub1(x, b):
    return add1(x, -b)


def mul(x, y):
    """Pair * pair (~2 ulp^2 error)."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def mul1(x, b):
    """Pair * plain float (Python scalars are cast to the pair's dtype)."""
    b = jnp.asarray(b, x[0].dtype)
    p, e = two_prod(x[0], b)
    e = e + x[1] * b
    return fast_two_sum(p, e)


def div1(x, b):
    """Pair / plain float (long division, one Newton correction)."""
    b = jnp.asarray(b, x[0].dtype)
    q0 = x[0] / b
    p, e = two_prod(q0, b)
    r = ((x[0] - p) - e) + x[1]
    return fast_two_sum(q0, r / b)
