"""State-space model ("impl") backends as explicit values.

Capability parity with probdiffeq's ``impl.select("isotropic"|"dense", ...)``
global registry (call site /root/reference/src/odecheckpts/ivpsolvers.py:32-33;
the reference wraps re-selection warnings at :29-31 because the registry is a
process-global mutable singleton).  The TPU rebuild threads the backend
through *values* instead: an SSM is a small frozen (hashable) config object
whose methods are pure functions over ``Normal``/``Conditional`` pytrees, so
solvers compose freely with ``jit``/``vmap``/``shard_map`` and two backends
can coexist in one program.  Containers that must remember their backend
(``MarkovSeq``, ``Solution``) carry it as *static* pytree metadata.

Backend layouts (n = num_derivatives + 1, d = ODE dimension):

==========  =================  ====================  =========================
backend     mean               cholesky              cost per step
==========  =================  ====================  =========================
isotropic   (n, d)             (n, n) shared         O(n^3 + n^2 d)
dense       (n*d,)             (n*d, n*d)            O((nd)^3)
blockdiag   (d, n)             (d, n, n)             O(d n^3)
==========  =================  ====================  =========================

All covariance math is square-root-only (see ``linalg.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax


class Normal(NamedTuple):
    """Gaussian in square-root form: ``cov = cholesky @ cholesky.T``.

    ``cholesky`` is lower-triangular after fresh QR re-triangularizations but
    is allowed to be a general square root in between (cheap corrections
    produce non-triangular exact factors; only ``L L^T`` semantics are relied
    upon).
    """

    mean: jax.Array
    cholesky: jax.Array


class Conditional(NamedTuple):
    """Affine Gaussian conditional ``x | y ~ N(matrix @ y + noise.mean, noise.cov)``."""

    matrix: jax.Array
    noise: Normal


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MarkovSeq:
    """Backward Markov representation of the posterior.

    ``init`` is the Gaussian at the *last* time point (or a stack of
    per-checkpoint Gaussians before ``stats.markov_select_terminal``);
    ``conditional`` holds the backward transitions ``x_{k-1} | x_k`` stacked
    over time.  Mirrors the object consumed by ``stats.markov_*`` in the
    reference (/root/reference/src/odecheckpts/ivpsolvers.py:80-81).  The SSM
    backend rides along as static metadata.
    """

    init: Normal
    conditional: Optional[Conditional]
    ssm: Any = dataclasses.field(metadata=dict(static=True), default=None)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Solution:
    """Result of an IVP solve.

    Field parity with the probdiffeq ``Solution`` the reference consumes:
    ``.t`` (/root/reference/experiments/1_van_der_pol/vdp.py:80), ``.u``
    (same), ``.posterior`` (/root/reference/src/odecheckpts/ivpsolvers.py:80),
    ``.num_steps`` (/root/reference/experiments/4_brusselator/run.py:92,138),
    ``.output_scale``.  ``u_std`` is the marginal standard deviation of the
    quantity of interest.
    """

    t: jax.Array
    u: jax.Array
    u_std: jax.Array
    output_scale: jax.Array
    marginals: Optional[Normal]
    posterior: MarkovSeq
    num_steps: jax.Array
    ssm: Any = dataclasses.field(metadata=dict(static=True), default=None)
