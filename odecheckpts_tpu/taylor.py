"""Taylor-mode initialization of the solver state.

Capability parity with ``probdiffeq.taylor.odejet_padded_scan`` /
``odejet_unroll`` (call sites: /root/reference/src/odecheckpts/ivpsolvers.py:65,
/root/reference/experiments/4_brusselator/run.py:64).

Given a vector field of ODE order ``o`` -- ``u^(o)(t) = vf(u, u', ...,
u^(o-1))`` -- and the first ``o`` derivatives at t0, compute the derivatives
``u^(o)(t0), ..., u^(o+num-1)(t0)`` by Taylor-mode automatic differentiation
(``jax.experimental.jet``).  ``jet``'s convention: with primal ``x0`` and
series ``(x1, ..., xK)`` holding the *derivatives* of the input path, it
returns the derivatives of the output path up to order K.  The ODE recursion
is then simply ``u^(k+o) = (d/dt)^k vf(u, ..., u^(o-1))``.

Both reference entry points are provided:

* ``odejet_unroll``       -- series length grows per iteration; smallest
  possible jaxpr per call but the trace is quadratic in ``num``.
* ``odejet_padded_scan``  -- series padded to fixed length so every jet call
  has identical structure; compile size is O(1) in ``num`` (the variant the
  reference uses in the hot paths).  Valid coefficients of a jet output depend
  only on the valid prefix of the input series, so padding with zeros is
  exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.jet import jet


def _check(inits, num):
    inits = tuple(jnp.asarray(u) for u in inits)
    if num < 0:
        raise ValueError("num must be >= 0")
    return inits


def odejet_unroll(vf, inits, /, num: int):
    """Taylor coefficients ``[u, u', ..., u^(num+o-1)]`` (derivative scaling)."""
    inits = _check(inits, num)
    order = len(inits)
    coeffs = list(inits)
    if num == 0:
        return coeffs
    coeffs.append(jnp.asarray(vf(*inits)))  # u^(o) = vf(...)
    for k in range(1, num):
        # Need the k-th time derivative of t -> vf(u(t), ..., u^(o-1)(t)).
        series = tuple(tuple(coeffs[j + 1 : j + 1 + k]) for j in range(order))
        _, out_series = jet(vf, inits, series)
        coeffs.append(jnp.asarray(out_series[k - 1]))
    return coeffs


def odejet_padded_scan(vf, inits, /, num: int):
    """Same output as :func:`odejet_unroll`, with fixed-size jet calls.

    All jet invocations use series padded to length ``num - 1`` so the traced
    computation per iteration is identical; the Python loop then produces a
    compact, repetitive jaxpr that XLA deduplicates (the lax.scan formulation
    is not applicable because jet's output length is structural).
    """
    inits = _check(inits, num)
    order = len(inits)
    coeffs = list(inits)
    if num == 0:
        return coeffs
    coeffs.append(jnp.asarray(vf(*inits)))
    if num == 1:
        return coeffs
    pad = num - 1
    for k in range(1, num):
        series = []
        for j in range(order):
            have = coeffs[j + 1 : j + 1 + k]
            zeros = [jnp.zeros_like(inits[j]) for _ in range(pad - len(have))]
            series.append(tuple(have + zeros))
        _, out_series = jet(vf, inits, tuple(series))
        coeffs.append(jnp.asarray(out_series[k - 1]))
    return coeffs
