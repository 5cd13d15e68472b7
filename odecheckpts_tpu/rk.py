"""Native adaptive Runge-Kutta baselines (diffrax stand-ins).

The reference benchmarks its probabilistic solvers against diffrax's
Bosh3/Tsit5/Dopri5/Dopri8 with a PID controller and ``SaveAt(ts=...)``
(/root/reference/src/odecheckpts/ivpsolvers.py:151-193).  diffrax is not part
of this environment, so the work-precision competitors are implemented
natively as embedded RK pairs inside one ``lax.scan``-over-checkpoints /
``while_loop``-inside driver, mirroring the probabilistic drivers' structure.

Design choice: instead of dense-output interpolation, steps are CLIPPED to
land exactly on each save point ("tstops" semantics).  This keeps the saved
values at full solver accuracy -- required because ``dopri8`` at tol 1e-15
serves as the precision yardstick of the work-precision experiments
(/root/reference/experiments/2_workprec_simple/run_simple.py:120-121) -- at
the cost of a mild step-count overhead near checkpoints.

Butcher tableaus: Bogacki-Shampine 3(2), Dormand-Prince 5(4), Tsitouras 5(4)
from the published papers; Dormand-Prince 8(7) ("DOP853") coefficients are
taken from scipy when available.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import control_flow


@dataclasses.dataclass(frozen=True)
class Tableau:
    name: str
    order: int
    a: tuple  # tuple of tuples, row k has k entries
    b: tuple  # solution weights
    b_err: tuple  # (b - b_hat): error weights
    c: tuple
    fsal: bool
    # second error-weight set for DOP853's blended 5th/3rd-order estimate
    # (errn = A^2 / sqrt(A^2 + 0.01 B^2), scipy _ivp/rk.py DOP853)
    b_err2: tuple | None = None


def _bosh3():
    a = ((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9))
    b = (2 / 9, 1 / 3, 4 / 9, 0.0)
    b_hat = (7 / 24, 1 / 4, 1 / 3, 1 / 8)
    b_err = tuple(x - y for x, y in zip(b, b_hat))
    c = (0.0, 1 / 2, 3 / 4, 1.0)
    return Tableau("bosh3", 3, a, b, b_err, c, True)


def _dopri5():
    a = (
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    )
    b = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
    b_hat = (
        5179 / 57600,
        0.0,
        7571 / 16695,
        393 / 640,
        -92097 / 339200,
        187 / 2100,
        1 / 40,
    )
    b_err = tuple(x - y for x, y in zip(b, b_hat))
    c = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
    return Tableau("dopri5", 5, a, b, b_err, c, True)


def _tsit5():
    # Tsitouras (2011), "Runge-Kutta pairs of order 5(4) satisfying only the
    # first column simplifying assumption".
    c = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
    a = (
        (),
        (0.161,),
        (-0.008480655492356989, 0.335480655492357),
        (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
        (
            5.325864828439257,
            -11.748883564062828,
            7.4955393428898365,
            -0.09249506636175525,
        ),
        (
            5.86145544294642,
            -12.92096931784711,
            8.159367898576159,
            -0.071584973281401,
            -0.028269050394068383,
        ),
        (
            0.09646076681806523,
            0.01,
            0.4798896504144996,
            1.379008574103742,
            -3.290069515436081,
            2.324710524099774,
        ),
    )
    b = (
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
        0.0,
    )
    b_err = (
        0.00178001105222577714,
        0.0008164344596567469,
        -0.007880878010261995,
        0.1447110071732629,
        -0.5823571654525552,
        0.45808210592918697,
        -1 / 66,
    )
    return Tableau("tsit5", 5, a, b, b_err, c, True)


def _dopri8():
    try:
        from scipy.integrate._ivp import dop853_coefficients as dc
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("dopri8 requires scipy's DOP853 tableau") from exc
    n = dc.N_STAGES  # 12
    a_np = np.asarray(dc.A)[: n + 1, :n]
    c_np = np.asarray(dc.C)[: n + 1]
    b_np = np.asarray(dc.B)
    e5 = np.asarray(dc.E5)[: n + 1]
    e3 = np.asarray(dc.E3)[: n + 1]
    a = tuple(tuple(float(x) for x in a_np[k][:k]) for k in range(n)) + (
        tuple(float(x) for x in b_np),
    )
    b = tuple(float(x) for x in b_np) + (0.0,)
    # DOP853's blended 5th/3rd-order error estimate (both weight sets); the
    # blend lets the controller take the full 8th-order step sizes instead
    # of the conservative 5th-order-difference-only ones.
    b_err = tuple(float(x) for x in e5)
    b_err2 = tuple(float(x) for x in e3)
    c = tuple(float(x) for x in c_np)
    return Tableau("dopri8", 8, a, b, b_err, c, True, b_err2=b_err2)


_TABLEAUS = {
    "bosh3": _bosh3,
    "tsit5": _tsit5,
    "dopri5": _dopri5,
    "dopri8": _dopri8,
}


class _RKState(NamedTuple):
    t: jax.Array
    y: jax.Array
    f: jax.Array  # FSAL: vector field at (t, y)
    dt: jax.Array
    errn_prev: jax.Array
    num_steps: jax.Array


def _solve_rk_save_at_impl(
    method: str, vf, y0, *, save_at, dt0, atol, rtol, params=None
):
    """Adaptive embedded-RK solve emitting states exactly at ``save_at``.

    ``vf(y, t=, p=)`` with first-order state ``y``; returns (ys, num_steps).
    One jittable computation: scan over checkpoints, while-loop inside.
    """
    tab = _TABLEAUS[method]()
    num_stages = len(tab.b)
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    save_at = jnp.asarray(save_at, dtype)
    a_rows = [jnp.asarray(row, dtype) for row in tab.a]
    b = jnp.asarray(tab.b, dtype)
    b_err = jnp.asarray(tab.b_err, dtype)
    b_err2 = None if tab.b_err2 is None else jnp.asarray(tab.b_err2, dtype)
    c = jnp.asarray(tab.c, dtype)
    order = tab.order

    def f(y, t):
        return jnp.asarray(vf(y, t=t, p=params))

    safety, fmin, fmax = 0.9, 0.2, 10.0
    p_i, p_p = 0.7, 0.4  # PI powers (scaled by 1/(order+1) below)

    def attempt(s: _RKState, t_stop):
        dt = jnp.minimum(s.dt, t_stop - s.t)
        ks = [s.f]
        for k in range(1, num_stages):
            incr = sum(a_rows[k][j] * ks[j] for j in range(k))
            ks.append(f(s.y + dt * incr, s.t + c[k] * dt))
        ks_arr = jnp.stack(ks)
        y_new = s.y + dt * jnp.tensordot(b, ks_arr, axes=1)
        err = dt * jnp.tensordot(b_err, ks_arr, axes=1)
        tol = atol + rtol * jnp.maximum(jnp.abs(s.y), jnp.abs(y_new))
        # stop_gradient: step-size control is a discrete decision; reverse-
        # mode through sqrt/pow of a ~zero error norm is +-inf (observed:
        # every MSE training update non-finite at small init weights)
        err = jax.lax.stop_gradient(err)
        errn = jnp.sqrt(jnp.mean((err / tol) ** 2) + jnp.finfo(dtype).tiny)
        if b_err2 is not None:
            # DOP853 blend: A^2 / hypot(A, 0.1 B) with A/B the dt-scaled
            # rms norms of the 5th/3rd-order differences (scipy semantics)
            err3 = jax.lax.stop_gradient(dt * jnp.tensordot(b_err2, ks_arr, axes=1))
            errn3 = jnp.sqrt(jnp.mean((err3 / tol) ** 2))
            denom = jnp.sqrt(errn**2 + 0.01 * errn3**2)
            errn = jnp.where(denom > 0.0, errn * (errn / denom), errn)
        errn = jnp.where(jnp.isfinite(errn), errn, jnp.inf)

        n1 = p_i / (order + 1.0)
        n2 = p_p / (order + 1.0)
        factor = safety * jnp.maximum(errn, 1e-10) ** -n1 * (
            s.errn_prev / jnp.maximum(errn, 1e-10)
        ) ** n2
        factor = jnp.where(jnp.isfinite(factor), factor, fmin)
        dt_next = jax.lax.stop_gradient(s.dt * jnp.clip(factor, fmin, fmax))

        eps = jnp.finfo(dtype).eps
        stall = dt <= 4.0 * eps * jnp.maximum(jnp.abs(s.t), 1.0)
        accept = (errn <= 1.0) | stall
        f_new = ks[-1] if tab.fsal else f(y_new, s.t + dt)
        accepted = _RKState(
            t=s.t + dt,
            y=y_new,
            f=f_new,
            dt=dt_next,
            errn_prev=jnp.maximum(errn, jnp.finfo(dtype).tiny),
            num_steps=s.num_steps + 1,
        )
        rejected = s._replace(dt=dt_next, num_steps=s.num_steps + 1)
        return jax.tree.map(lambda x, z: jnp.where(accept, x, z), accepted, rejected)

    def per_checkpoint(s: _RKState, t_next):
        s = control_flow.while_loop(
            lambda st: st.t < t_next, lambda st: attempt(st, t_next), s
        )
        return s, s.y

    s0 = _RKState(
        t=save_at[0],
        y=y0,
        f=f(y0, save_at[0]),
        dt=jnp.asarray(dt0, dtype),
        errn_prev=jnp.ones((), dtype),
        num_steps=jnp.zeros((), jnp.int32),
    )
    final, ys = jax.lax.scan(per_checkpoint, s0, save_at[1:])
    ys = jnp.concatenate([y0[None], ys])
    return ys, final.num_steps


def solve_rk_save_at(*args, **kwargs):
    """See _solve_rk_save_at_impl; traced at full f32 matmul precision."""
    with jax.default_matmul_precision("float32"):
        return _solve_rk_save_at_impl(*args, **kwargs)
