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


# -- Nystrom-type baselines for 2nd-order problems (ROADMAP #8) ---------------
#
# The reference benchmarks its ode_order=2 solvers only against diffrax RK
# pairs on the FIRST-ORDER reduction (doubling the state and wasting the
# u' = v rows; /root/reference/experiments/3_workprec_harder/run_harder.py).
# These baselines integrate u'' = f(u, t) directly: velocity-Verlet substeps
# chained into Yoshida's 4th-order triple-jump composition.  Coefficients
# are derived, not tabulated: w1 = 1/(2 - 2^(1/3)) and w0 = 1 - 2 w1 kill
# the leading error term of the symmetric 2nd-order kernel.  One force
# evaluation per Verlet substep (acceleration is FSAL across substeps and
# steps), so the per-step cost is 1 (verlet2) / 3 (yoshida4) force
# evaluations vs 6 stage evaluations of the reduction's dopri5.
#
# Velocity-DEPENDENT accelerations (e.g. the restricted three-body problem's
# Coriolis terms) are out of scope: the explicit velocity half-kick would be
# inconsistent; use the first-order reduction baselines for those.

_NYSTROM_ORDERS = {"verlet2": 2, "yoshida4": 4}


class _NystromState(NamedTuple):
    t: jax.Array
    u: jax.Array
    v: jax.Array
    a: jax.Array  # FSAL: acceleration f(u, t)
    dt: jax.Array
    errn_prev: jax.Array
    num_steps: jax.Array


def _solve_nystrom_save_at_impl(
    method: str, vf2, u0, du0, *, save_at, dt0, atol, rtol, params=()
):
    """Adaptive Nystrom-type solve of ``u'' = vf2(u, t=, p=)`` emitting
    states exactly at ``save_at`` (clipped-step "tstops" semantics, like
    ``solve_rk_save_at``).

    Error control by step doubling: one composition step of dt vs two of
    dt/2; the difference, deflated by 2^p - 1 (Richardson), estimates the
    half-step solution's local error.  The half-step solution is kept
    un-extrapolated, so accepted trajectories stay symplectic.  Returns
    ``((us, vs), num_force_evals)``.
    """
    if method not in _NYSTROM_ORDERS:
        raise ValueError(
            f"unknown Nystrom method {method!r}; pick from "
            f"{sorted(_NYSTROM_ORDERS)}"
        )
    order = _NYSTROM_ORDERS[method]
    u0 = jnp.asarray(u0)
    du0 = jnp.asarray(du0)
    dtype = u0.dtype
    save_at = jnp.asarray(save_at, dtype)

    def f(u, t):
        return jnp.asarray(vf2(u, t=t, p=params))

    def verlet(u, v, a, t, dt):
        """One velocity-Verlet step; returns state + end acceleration.
        Exactly ONE force evaluation (the end force, FSAL)."""
        v_half = v + 0.5 * dt * a
        u_new = u + dt * v_half
        a_new = f(u_new, t + dt)
        v_new = v_half + 0.5 * dt * a_new
        return u_new, v_new, a_new

    if method == "verlet2":

        def step(u, v, a, t, dt):
            return verlet(u, v, a, t, dt)

        evals_per_step = 1
    else:
        # Yoshida (1990) triple jump: S(w1 dt) S(w0 dt) S(w1 dt) with the
        # symmetric kernel S = velocity Verlet; w1 + w0 + w1 = 1 and
        # w1^3 + w0^3 + w1^3 = 0 give w1 = 1/(2 - 2^(1/3)), w0 = 1 - 2 w1.
        w1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
        w0 = 1.0 - 2.0 * w1

        def step(u, v, a, t, dt):
            u, v, a = verlet(u, v, a, t, w1 * dt)
            u, v, a = verlet(u, v, a, t + w1 * dt, w0 * dt)
            u, v, a = verlet(u, v, a, t + (w1 + w0) * dt, w1 * dt)
            return u, v, a

        evals_per_step = 3

    safety, fmin, fmax = 0.9, 0.2, 10.0
    p_i, p_p = 0.7, 0.4
    deflate = 2.0**order - 1.0

    def attempt(s: _NystromState, t_stop):
        dt = jnp.minimum(s.dt, t_stop - s.t)
        u1, v1, _a1 = step(s.u, s.v, s.a, s.t, dt)
        uh, vh, ah = step(s.u, s.v, s.a, s.t, 0.5 * dt)
        u2, v2, a2 = step(uh, vh, ah, s.t + 0.5 * dt, 0.5 * dt)
        err_u = jax.lax.stop_gradient((u2 - u1) / deflate)
        err_v = jax.lax.stop_gradient((v2 - v1) / deflate)
        tol_u = atol + rtol * jnp.maximum(jnp.abs(s.u), jnp.abs(u2))
        tol_v = atol + rtol * jnp.maximum(jnp.abs(s.v), jnp.abs(v2))
        sq = jnp.concatenate(
            [(err_u / tol_u).ravel(), (err_v / tol_v).ravel()]
        )
        errn = jnp.sqrt(jnp.mean(sq**2) + jnp.finfo(dtype).tiny)
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
        accepted = _NystromState(
            t=s.t + dt,
            u=u2,
            v=v2,
            a=a2,
            dt=dt_next,
            errn_prev=jnp.maximum(errn, jnp.finfo(dtype).tiny),
            num_steps=s.num_steps + 3 * evals_per_step,
        )
        rejected = s._replace(
            dt=dt_next, num_steps=s.num_steps + 3 * evals_per_step
        )
        return jax.tree.map(
            lambda x, z: jnp.where(accept, x, z), accepted, rejected
        )

    def per_checkpoint(s: _NystromState, t_next):
        s = control_flow.while_loop(
            lambda st: st.t < t_next, lambda st: attempt(st, t_next), s
        )
        return s, (s.u, s.v)

    s0 = _NystromState(
        t=save_at[0],
        u=u0,
        v=du0,
        a=f(u0, save_at[0]),
        dt=jnp.asarray(dt0, dtype),
        errn_prev=jnp.ones((), dtype),
        num_steps=jnp.ones((), jnp.int32),  # the FSAL seed evaluation
    )
    final, (us, vs) = jax.lax.scan(per_checkpoint, s0, save_at[1:])
    us = jnp.concatenate([u0[None], us])
    vs = jnp.concatenate([du0[None], vs])
    return (us, vs), final.num_steps


def solve_nystrom_save_at(*args, **kwargs):
    """See _solve_nystrom_save_at_impl; full f32 matmul precision."""
    with jax.default_matmul_precision("float32"):
        return _solve_nystrom_save_at_impl(*args, **kwargs)


def solve_nystrom_fixed(method: str, vf2, u0, du0, *, grid, params=()):
    """Fixed-grid symplectic Nystrom solve (no step control): scan the
    composition step over ``grid``.  The natural work-precision axis for
    symplectic methods -- sweep ``len(grid)`` instead of a tolerance."""
    if method not in _NYSTROM_ORDERS:
        raise ValueError(
            f"unknown Nystrom method {method!r}; pick from "
            f"{sorted(_NYSTROM_ORDERS)}"
        )
    # reuse the adaptive machinery's step via a tolerance-free single pass
    u0 = jnp.asarray(u0)
    du0 = jnp.asarray(du0)
    grid = jnp.asarray(grid, u0.dtype)

    def f(u, t):
        return jnp.asarray(vf2(u, t=t, p=params))

    def verlet(u, v, a, t, dt):
        v_half = v + 0.5 * dt * a
        u_new = u + dt * v_half
        a_new = f(u_new, t + dt)
        v_new = v_half + 0.5 * dt * a_new
        return u_new, v_new, a_new

    if method == "verlet2":

        def step(u, v, a, t, dt):
            return verlet(u, v, a, t, dt)

    else:
        w1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
        w0 = 1.0 - 2.0 * w1

        def step(u, v, a, t, dt):
            u, v, a = verlet(u, v, a, t, w1 * dt)
            u, v, a = verlet(u, v, a, t + w1 * dt, w0 * dt)
            u, v, a = verlet(u, v, a, t + (w1 + w0) * dt, w1 * dt)
            return u, v, a

    def scan_step(carry, t_pair):
        u, v, a = carry
        t_new, dt = t_pair
        u, v, a = step(u, v, a, t_new - dt, dt)
        return (u, v, a), (u, v)

    ts, dts = grid[1:], jnp.diff(grid)
    with jax.default_matmul_precision("float32"):
        _, (us, vs) = jax.lax.scan(
            scan_step, (u0, du0, f(u0, grid[0])), (ts, dts)
        )
    us = jnp.concatenate([u0[None], us])
    vs = jnp.concatenate([du0[None], vs])
    return us, vs
