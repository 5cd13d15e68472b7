"""Initial value problem zoo.

Capability parity with /root/reference/src/odecheckpts/ivps.py (which wraps
``diffeqzoo``; not available here, so the classic problem definitions are
implemented natively).  Uniform contract, identical to the reference:

    problem() -> (vf, u0_tuple, time_span, args)      # 1st-order problems
    problem() -> (vf, (u0, du0), time_span)           # 2nd-order problems

Vector fields take ``ode_order`` positional state arguments plus keyword-only
``t`` (and ``p`` where the reference version has parameters), exactly like
ivps.py:13,26,84,133,160.  Initial conditions and spans match the reference /
diffeqzoo defaults so the performance baselines in BASELINE.md are
comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic():
    """du/dt = a*u*(1 - u/K); diffeqzoo defaults u0=0.1, (0, 2.5), a=1, K=1."""

    def vf(u, *, t, p):
        a, k = p
        return a * u * (1.0 - u / k)

    u0 = jnp.atleast_1d(jnp.asarray(0.1))
    return vf, (u0,), (0.0, 2.5), (1.0, 1.0)


def rigid_body(*, time_span=(0.0, 10.0)):
    """Euler's equations of a free rigid body (diffeqzoo defaults:
    u0=(1, 0, 0.9), p=(-2, 1.25, -0.5)).  Reference: ivps.py:20-29."""

    def vf(u, *, t, p):
        p1, p2, p3 = p
        return jnp.stack([p1 * u[1] * u[2], p2 * u[0] * u[2], p3 * u[0] * u[1]])

    u0 = jnp.asarray([1.0, 0.0, 0.9])
    return vf, (u0,), tuple(time_span), (-2.0, 1.25, -0.5)


def rigid_body_df(params=(-2.0, 1.25, -0.5)):
    """Rigid body in compensated (hi, lo) pair arithmetic, lanes-last.

    The df32 vector field the tight-tolerance fused engine needs
    (batched_hi.make_hi_solver ``vf_df``): an f32-only evaluation would put
    ~2^-24 |f| noise on the TS0 residual, which the correction gain walks
    into the solution mean (~sqrt(N_steps) * gain * noise > the rtol 1e-9
    budget).  The parameters (-2, 1.25, -0.5) are dyadic, hence exact in f32.
    """
    from . import df32 as df

    p1, p2, p3 = (float(p) for p in params)

    def vf_df(args, t):
        (uh, ul), = args  # (d, B) pair, d = 3

        def row(i):
            return (
                jax.lax.slice_in_dim(uh, i, i + 1, axis=0),
                jax.lax.slice_in_dim(ul, i, i + 1, axis=0),
            )

        y0, y1, y2 = row(0), row(1), row(2)
        f0 = df.mul1(df.mul(y1, y2), p1)
        f1 = df.mul1(df.mul(y0, y2), p2)
        f2 = df.mul1(df.mul(y0, y1), p3)
        return (
            jnp.concatenate([f0[0], f1[0], f2[0]], axis=0),
            jnp.concatenate([f0[1], f1[1], f2[1]], axis=0),
        )

    return vf_df


def three_body_restricted():
    """Planar restricted three-body problem (Arenstorf orbit), 2nd-order form.

    diffeqzoo defaults: standardized moon/earth mass ratio and the classic
    periodic initial condition.  Reference: ivps.py:32-41 (vf(*u, t, p=()),
    returns acceleration; u0s = (position, velocity))."""
    mu = 0.012277471
    mp = 1.0 - mu
    t0, t1 = 0.0, 17.0652165601579625588917206249

    def vf(u, du, *, t=None, p=()):
        x1, x2 = u[0], u[1]
        dx1, dx2 = du[0], du[1]
        # r^3 = r2*sqrt(r2), not r2**1.5: sqrt+mul lowers everywhere
        # (Mosaic faults on the pow lowering inside the fused TPU kernel)
        r1 = (x1 + mu) ** 2 + x2**2
        r2 = (x1 - mp) ** 2 + x2**2
        d1 = r1 * jnp.sqrt(r1)
        d2 = r2 * jnp.sqrt(r2)
        ddx1 = x1 + 2.0 * dx2 - mp * (x1 + mu) / d1 - mu * (x1 - mp) / d2
        ddx2 = x2 - 2.0 * dx1 - mp * x2 / d1 - mu * x2 / d2
        return jnp.stack([ddx1, ddx2])

    u0 = jnp.asarray([0.994, 0.0])
    du0 = jnp.asarray([0.0, -2.00158510637908252240537862224])
    return vf, (u0, du0), (t0, t1)


def pleiades_2nd():
    """Seven-star Pleiades problem in 2nd-order form (14-dim positions).

    Reference: ivps.py:59-99 (including the nan_to_num guard for the i=j
    self-interaction singularity)."""
    # fmt: off
    u0 = jnp.asarray([
        3.0,  3.0, -1.0, -3.00, 2.0, -2.00,  2.0,
        3.0, -3.0,  2.0,  0.00, 0.0, -4.00,  4.0,
    ])
    du0 = jnp.asarray([
        0.0,  0.0,  0.0,  0.00, 0.0,  1.75, -1.5,
        0.0,  0.0,  0.0, -1.25, 1.0,  0.00,  0.0,
    ])
    # fmt: on

    def vf(u, du, *, t=None, p=()):
        x = u[0:7]
        y = u[7:14]
        xi, xj = x[:, None], x[None, :]
        yi, yj = y[:, None], y[None, :]
        rij = ((xi - xj) ** 2 + (yi - yj) ** 2) ** 1.5
        mj = jnp.arange(1.0, 8.0)[None, :]
        ddx = jnp.sum(jnp.nan_to_num(mj * (xj - xi) / rij), axis=1)
        ddy = jnp.sum(jnp.nan_to_num(mj * (yj - yi) / rij), axis=1)
        return jnp.concatenate((ddx, ddy))

    return vf, (u0, du0), (0.0, 3.0)


def pleiades_1st():
    """First-order (28-dim) reduction of the Pleiades problem; ivps.py:44-56."""
    vf2, (u0, du0), tspan = pleiades_2nd()

    def vf(u, *, t, p=()):
        x, dx = jnp.split(u, 2)
        ddx = vf2(x, dx, t=t, p=p)
        return jnp.concatenate([dx, ddx])

    return vf, (jnp.concatenate([u0, du0]),), tspan, ()


def brusselator(N, t0=0.0, tmax=10.0, laplacian="convolve"):
    """Brusselator method-of-lines PDE; state dim 2N (scalable benchmark).

    Same discretization/boundary scheme as the MATLAB stiff-ODE example the
    reference cites; banded Laplacian applied via ``jnp.convolve``
    (reference: ivps.py:124-156).  ``laplacian="slices"`` computes the same
    band by axis-0 slicing instead: mathematically identical (the [1,-2,1]
    kernel is symmetric), broadcasts over trailing lane axes, and contains
    only ops Mosaic lowers -- the form the fused lanes-last TPU engines
    need (jnp.convolve does not lower inside Pallas kernels)."""
    alpha = 1.0 / 50.0
    const = alpha * (N + 1) ** 2
    weights = jnp.asarray([1.0, -2.0, 1.0])

    if laplacian == "slices":

        def vf(y, *, t=None, p=(), n=N, c=const):
            u, v = y[:n], y[n:]
            ones = jnp.ones_like(u[:1])
            u_ = jnp.concatenate([ones, u, ones], axis=0)
            v_ = jnp.concatenate([3.0 * ones, v, 3.0 * ones], axis=0)
            conv_u = u_[:-2] - 2.0 * u_[1:-1] + u_[2:]
            conv_v = v_[:-2] - 2.0 * v_[1:-1] + v_[2:]
            u_new = 1.0 + u**2 * v - 4.0 * u + c * conv_u
            v_new = 3.0 * u - u**2 * v + c * conv_v
            return jnp.concatenate([u_new, v_new])

    else:

        def vf(y, *, t=None, p=(), n=N, w=weights, c=const):
            u, v = y[:n], y[n:]
            u_ = jnp.concatenate([jnp.ones((1,), y.dtype), u, jnp.ones((1,), y.dtype)])
            v_pad = jnp.full((1,), 3.0, y.dtype)
            v_ = jnp.concatenate([v_pad, v, v_pad])
            conv_u = jnp.convolve(u_, w, mode="valid")
            conv_v = jnp.convolve(v_, w, mode="valid")
            u_new = 1.0 + u**2 * v - 4.0 * u + c * conv_u
            v_new = 3.0 * u - u**2 * v + c * conv_v
            return jnp.concatenate([u_new, v_new])

    x0 = jnp.linspace(0, 1, num=N)
    u0 = jnp.sin(2.0 * jnp.pi * x0) + 1.0
    v0 = 3.0 * jnp.ones(N)
    y0 = jnp.concatenate([u0, v0])
    return vf, (y0,), (t0, tmax), ()


def van_der_pol(mu=10.0**3):
    """Stiff Van der Pol oscillator in 2nd-order form; ivps.py:159-167."""

    def vf(y, ydot, *, t=None, p=()):
        return mu * (ydot * (1.0 - y**2) - y)

    u0 = jnp.asarray([2.0])
    du0 = jnp.asarray([0.0])
    return vf, (u0, du0), (0.0, 6.3)


def neural_ode_mlp(*, layer_sizes: tuple):
    """MLP vector field for neural-ODE demos (reference: ivps.py:102-121,
    init taken from the implicit-layers tutorial convention)."""

    def mlp(params, inputs):
        for w, b in params:
            outputs = jnp.dot(inputs, w) + b
            inputs = jax.nn.tanh(outputs)
        return outputs

    def vf(u, *, t, p):
        return mlp(*p, jnp.concatenate([u, jnp.atleast_1d(t)]))

    u0 = jnp.atleast_1d(jnp.asarray(0.1))

    def init_params(key):
        params = []
        sizes = list(layer_sizes)
        for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
            key, k1, k2 = jax.random.split(key, 3)
            scale = 1.0 / jnp.sqrt(1.0 * fan_in)
            w = scale * jax.random.normal(k1, (fan_in, fan_out))
            b = scale * jax.random.normal(k2, (fan_out,))
            params.append((w, b))
        return (params,)

    return vf, (u0,), (0.0, 1.0), init_params(jax.random.PRNGKey(0))
