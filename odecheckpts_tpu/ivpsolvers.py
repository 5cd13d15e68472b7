"""Solver construction: priors, corrections, strategies, calibration.

API parity with ``probdiffeq.ivpsolvers`` as exercised by the reference
(/root/reference/src/odecheckpts/ivpsolvers.py:36-50,
/root/reference/experiments/1_van_der_pol/vdp.py:63-66):

    prior_ibm, correction_ts0, correction_ts1,
    strategy_filter, strategy_smoother, strategy_fixedpoint,
    solver, solver_dynamic, solver_mle.

Differences by design (TPU-first, see SURVEY.md section 7): the state-space
backend is a *value* bundled into the prior instead of a process-global
registry, so ``prior_ibm`` takes ``ode_shape`` and ``implementation``
explicitly and everything downstream is freely jit/vmap/shard_map-able.
All config objects are frozen, hashable dataclasses: they can be closed over
inside a jit trace or passed as static arguments, matching both usage styles
in the reference (closure style: src/odecheckpts/ivpsolvers.py:14-53; static
style: experiments/4_brusselator/run.py:82-86).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from . import ssm as ssm_lib


def prior_ibm(*, num_derivatives: int, ode_shape: tuple, implementation: str = "isotropic"):
    """nu-times integrated Wiener process prior on the chosen SSM backend.

    Returns the backend value itself: it fully determines the (preconditioned)
    IBM discretization; see ``prior.py`` for the numerics.
    """
    return ssm_lib.choose(
        implementation, ode_shape=ode_shape, num_derivatives=num_derivatives
    )


#: Default local-error calibration per error unit.  The qoi estimate is the
#: calibrated process-noise std of the solution component — an unbiased
#: *diffusion* scale that under-counts how local errors compound into global
#: error (measured: RMSE/rtol up to ~4 across rtol 1e-1..1e-9 on the
#: reference's exp-2 problem, and phase-error amplification through stiff
#: VdP transitions; see tests/test_calibration.py).  Scaling the estimate by
#: 10 costs only 10^(1/(nu+1)) ≈ 1.6x steps (nu=4) and brings the tracking
#: constant to ≤~1 everywhere (the reference stack tracks ~0.2 by being
#: residual-conservative at a much higher step cost).  "residual" is already
#: conservative — no extra factor.
ERROR_CALIBRATION = {"qoi": 10.0, "residual": 1.0}
#: TS1/EK1 is selected for stiff problems, whose fast transitions amplify
#: phase error superlinearly (measured on VdP mu=1e3: terminal error ~
#: kappa^-1.8 up to a conditioning plateau); the extra 2x costs only
#: 2^(1/(nu+1)) ~ 15% more steps and brings VdP rtol 1e-8 terminal error
#: under 1e-7 in qoi mode (the BASELINE "match at rtol 1e-8" target).
ERROR_CALIBRATION_TS1_QOI = 20.0


def default_error_calibration(method: str, error_unit: str) -> float:
    if method == "ts1" and error_unit == "qoi":
        return ERROR_CALIBRATION_TS1_QOI
    return ERROR_CALIBRATION[error_unit]


@dataclasses.dataclass(frozen=True)
class Correction:
    method: str  # "ts0" | "ts1"
    ode_order: int
    error_unit: str = "qoi"  # "qoi" | "residual"
    error_calibration: float = None  # None = default_error_calibration(...)

    @property
    def calibration_factor(self) -> float:
        if self.error_calibration is not None:
            return float(self.error_calibration)
        return default_error_calibration(self.method, self.error_unit)


def correction_ts0(*, ode_order: int = 1, error_unit: str = "qoi",
                   error_calibration: float = None) -> Correction:
    """Zeroth-order Taylor linearization (EK0): no vector-field Jacobian.

    ``error_unit`` selects the step-control error estimate:
    * "qoi" (default): calibrated process-noise std of the solution component
      (order dt^(nu+1); equidistributes u-error against atol+rtol|u| --
      fewest steps at a given accuracy on smooth problems);
    * "residual": calibrated residual std in u^(o) units (order
      dt^(nu+1-o); strongly concentrates steps at stiff transients /
      near-singular encounters, like the reference stack's behavior on
      Pleiades-type problems).

    ``error_calibration`` scales the local-error estimate before it meets
    ``atol + rtol|u|`` (None = the per-unit default in ERROR_CALIBRATION);
    it changes step control only, never posterior widths.
    """
    return Correction("ts0", ode_order, error_unit, error_calibration)


def correction_ts1(*, ode_order: int = 1, error_unit: str = "qoi",
                   error_calibration: float = None) -> Correction:
    """First-order Taylor linearization (EK1): Jacobian via forward-mode AD.

    Requires the dense backend (cross-derivative covariance), like the
    reference's stiff Van der Pol setup (experiments/1_van_der_pol/vdp.py:61-64).
    See :func:`correction_ts0` for ``error_unit`` / ``error_calibration``.
    """
    return Correction("ts1", ode_order, error_unit, error_calibration)


FILTER, SMOOTHER, FIXEDPOINT = "filter", "smoother", "fixedpoint"


@dataclasses.dataclass(frozen=True)
class Strategy:
    ssm: Any
    correction: Correction
    kind: str

    def __post_init__(self):
        if self.correction.method == "ts1" and self.ssm.name != "dense":
            raise ValueError("correction_ts1 requires the dense backend")

    @property
    def needs_reversal(self) -> bool:
        return self.kind != FILTER


def strategy_filter(prior, correction: Correction) -> Strategy:
    """Forward-only estimation: marginals at steps, O(1) state."""
    return Strategy(prior, correction, FILTER)


def strategy_smoother(prior, correction: Correction) -> Strategy:
    """Store a backward transition per step: O(#steps) memory dense output."""
    return Strategy(prior, correction, SMOOTHER)


def strategy_fixedpoint(prior, correction: Correction) -> Strategy:
    """The paper's fixed-point smoother: backward transitions are *composed*
    between checkpoints inside the forward pass, so ``solve_adaptive_save_at``
    needs O(#checkpoints) memory independent of the number of steps."""
    return Strategy(prior, correction, FIXEDPOINT)


NONE, DYNAMIC, MLE = "none", "dynamic", "mle"


@dataclasses.dataclass(frozen=True)
class Solver:
    strategy: Strategy
    calibration: str

    @property
    def ssm(self):
        return self.strategy.ssm

    def initial_condition(self, tcoeffs, output_scale):
        """Exact (zero-covariance) initial state from Taylor coefficients.

        Parity: ``solver.initial_condition(tcoeffs, output_scale)``
        (/root/reference/src/odecheckpts/ivpsolvers.py:68)."""
        rv = self.ssm.stack_tcoeffs(tcoeffs)
        scale = jnp.asarray(output_scale, dtype=rv.mean.dtype)
        return (rv, scale)


def solver(strategy: Strategy) -> Solver:
    """Uncalibrated solver: the prior output scale is used as given."""
    return Solver(strategy, NONE)


def solver_dynamic(strategy: Strategy) -> Solver:
    """Per-step (quasi-MLE) output-scale calibration; robust for stiff and
    transient dynamics (reference default: src/odecheckpts/ivpsolvers.py:45-46)."""
    return Solver(strategy, DYNAMIC)


def solver_mle(strategy: Strategy) -> Solver:
    """Global MLE output-scale calibration, applied post hoc to the posterior
    (capability parity with the old-API ``calibrated.mle``,
    /root/reference/experiments/playground/smoothing.py:74)."""
    return Solver(strategy, MLE)


# -- linearization ------------------------------------------------------------


def linearize(strategy: Strategy, vf, m_pred, t):
    """Residual z (and Jacobians for TS1) of the ODE constraint at the
    predicted mean: z = u^(o) - vf(u, ..., u^(o-1), t)."""
    ssm = strategy.ssm
    o = strategy.correction.ode_order
    args = tuple(ssm.select_deriv(m_pred, i) for i in range(o))
    fx = vf(*args, t=t)
    z = ssm.select_deriv(m_pred, o) - fx
    if strategy.correction.method == "ts0":
        return z, ()
    jacobians = tuple(
        jax.jacfwd(lambda *a: vf(*a, t=t), argnums=k)(*args) for k in range(o)
    )
    return z, jacobians


def error_and_scale(strategy: Strategy, z, jacobians, cache):
    """Local error estimate and per-step MLE output scale (sigma-hat).

    Residual model z ~ N(0, sigma^2 H Q_unit H^T): sigma_hat is the
    one-observation MLE and err = sigma_hat * sqrt(diag(H Q_unit H^T)) is the
    Schober-style local error estimate used for step control by *all*
    calibration modes (calibration changes posterior widths, not stepping).
    """
    ssm = strategy.ssm
    o = strategy.correction.ode_order
    unit = strategy.correction.error_unit
    if ssm.name in ("isotropic", "blockdiag"):
        return ssm.error_and_scale_deriv(z, cache, o, unit=unit)
    h_q = ssm.h_q_unit(cache, o, jacobians)
    return ssm.error_and_scale(z, h_q, cache, unit=unit)


def correct(strategy: Strategy, rv_pred, z, jacobians):
    """Square-root correction of the predicted state on the ODE constraint."""
    ssm = strategy.ssm
    o = strategy.correction.ode_order
    if ssm.name in ("isotropic", "blockdiag"):
        return ssm.correct_deriv(rv_pred, z, o)
    h_l = ssm.h_l_rows(rv_pred.cholesky, o, jacobians)
    return ssm.correct_affine(rv_pred, z, h_l)
