"""Posterior statistics over backward Markov sequences.

API parity with ``probdiffeq.stats`` as exercised by the reference
(/root/reference/src/odecheckpts/ivpsolvers.py:80-89,
/root/reference/experiments/5_vs_interpolation/measure.py:71-75,
/root/reference/src/odecheckpts/train_util.py:22-24):

    markov_select_terminal, markov_marginals, markov_sample,
    log_marginal_likelihood, offgrid_marginals_searchsorted.

All operations are ``lax.scan``s over the (stacked) Markov sequence; the SSM
backend rides along as static metadata on the sequence, so no global registry
is consulted (contrast: probdiffeq's ``impl``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ssm.base import Conditional, MarkovSeq, Normal


def _full_precision(fn):
    """Posterior algebra at full f32 matmul precision (see ivpsolve)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def markov_select_terminal(posterior: MarkovSeq) -> MarkovSeq:
    """From a per-checkpoint stacked sequence, keep the terminal Gaussian and
    the N-1 backward conditionals (entry 0 of the stack is the unused
    identity at t0).  Parity: /root/reference/src/odecheckpts/ivpsolvers.py:80."""
    init = jax.tree.map(lambda x: x[-1], posterior.init)
    conds = jax.tree.map(lambda x: x[1:], posterior.conditional)
    return MarkovSeq(init=init, conditional=conds, ssm=posterior.ssm)


@_full_precision
def markov_marginals(seq: MarkovSeq, *, reverse: bool = True, parallel: bool = False) -> Normal:
    """Marginals of all non-terminal states by backward marginalization.

    Returns a stacked Normal in forward-time order over checkpoints
    0..N-2 (the terminal state is ``seq.init``); the reference concatenates
    the two itself (/root/reference/src/odecheckpts/ivpsolvers.py:81-86).

    ``parallel=True`` runs the backward pass as a ``lax.associative_scan``
    over conditional composition -- O(log N) depth instead of O(N), the
    parallel-in-time smoothing pass of arXiv:2502.11686 (SURVEY.md section 5
    stretch goal).  Results agree with the sequential scan to square-root
    arithmetic accuracy.
    """
    if not reverse:
        raise NotImplementedError("forward-time marginals are not defined here")
    ssm = seq.ssm

    if parallel:
        # cumulative composition C_k = cond_k o cond_{k+1} o ... o cond_{N-1}
        # (maps x at the terminal point to x at checkpoint k-1); marginalizing
        # the terminal Gaussian through each cumulative conditional yields
        # every marginal independently.
        def combine(acc_later, current):
            # fn(a, b) = b o a  (inner = composite of later conditionals,
            # outer = the current, earlier-in-time one); associative since
            # fn(fn(a,b),c) = c o b o a = fn(a, fn(b,c)).
            return jax.vmap(ssm.compose)(current, acc_later)

        cumulative = jax.lax.associative_scan(
            combine, seq.conditional, reverse=True
        )
        return jax.vmap(lambda c: ssm.marginalize(seq.init, c))(cumulative)

    def body(rv, cond):
        rv_prev = ssm.marginalize(rv, cond)
        return rv_prev, rv_prev

    _, marginals = jax.lax.scan(body, seq.init, seq.conditional, reverse=True)
    return marginals


@_full_precision
def markov_sample(
    key, seq: MarkovSeq, *, shape=(), reverse: bool = True, parallel: bool = False
):
    """Joint posterior samples along the Markov sequence.

    Parity (including the return convention the reference destructures,
    /root/reference/experiments/5_vs_interpolation/measure.py:72-75):
    returns ``(qoi, samples), (qoi_terminal, sample_terminal)`` where ``qoi``
    covers checkpoints 0..N-2 in forward-time order and the terminal pieces
    belong at the end.

    ``parallel=True``: once the per-step noises are drawn, the sampling
    recursion ``x_{k-1} = G_k x_k + (d_k + L_k xi_k)`` is a composition of
    plain affine maps -- associative, QR-free -- so it runs as a
    ``lax.associative_scan`` in O(log N) depth (parallel-in-time sampling).
    """
    if not reverse:
        raise NotImplementedError
    ssm = seq.ssm
    num = jax.tree.leaves(seq.conditional)[0].shape[0]
    base = ssm.base_shape()
    k_init, k_steps = jax.random.split(key)
    mean = seq.init.mean
    eps_init = jax.random.normal(k_init, tuple(shape) + mean.shape, mean.dtype)
    eps_steps = jax.random.normal(
        k_steps, (num,) + tuple(shape) + base, mean.dtype
    )

    sample_terminal = ssm.transform_base(seq.init, eps_init)

    if parallel:
        # fold each step's sampled noise into the offset: d'_k = d_k + L_k xi_k
        # (conditional_sample at x = 0), then compose plain affine maps with
        # zero noise cholesky via ssm.compose -- associative, so a log-depth
        # associative scan yields every cumulative map terminal -> checkpoint.
        zeros_state = jnp.zeros_like(seq.init.mean)
        offsets = jax.vmap(
            lambda c, e: ssm.conditional_sample(c, zeros_state, e)
        )(seq.conditional, eps_steps)
        zero_chol = jnp.zeros_like(seq.conditional.noise.cholesky)
        conds_sampled = Conditional(
            seq.conditional.matrix, Normal(offsets, zero_chol)
        )
        cumulative = jax.lax.associative_scan(
            lambda later, cur: jax.vmap(ssm.compose)(cur, later),
            conds_sampled,
            reverse=True,
        )
        zeros_base = jnp.zeros(base, mean.dtype)
        samples = jax.vmap(
            lambda c: ssm.conditional_sample(c, sample_terminal, zeros_base)
        )(cumulative)
    else:
        def body(x, inputs):
            cond, eps = inputs
            x_prev = ssm.conditional_sample(cond, x, eps)
            return x_prev, x_prev

        # Move the time axis of the noise first for scan; the state x
        # broadcasts over the sample shape inside the batched products.
        _, samples = jax.lax.scan(
            body, sample_terminal, (seq.conditional, eps_steps), reverse=True
        )
    # samples: (N-1, *shape, *base) forward-time -> (*shape, N-1, *base)
    ndim_shape = len(shape)
    if ndim_shape:
        samples = jnp.moveaxis(samples, 0, ndim_shape)
    qoi = ssm.qoi_from_sample(samples)
    qoi_terminal = ssm.qoi_from_sample(sample_terminal)
    return (qoi, samples), (qoi_terminal, sample_terminal)


@_full_precision
def log_marginal_likelihood(data, *, standard_deviation, posterior: MarkovSeq):
    """Gaussian log-marginal likelihood of observations of the qoi.

    ``data``: (N, d) observations at the posterior's N checkpoints;
    ``standard_deviation``: broadcastable to (N,).  A backward square-root
    Kalman pass along the Markov chain: observe, condition, marginalize.
    Parity: /root/reference/src/odecheckpts/train_util.py:22-24.
    """
    ssm = posterior.ssm
    data = jnp.asarray(data)
    num = data.shape[0]
    std = jnp.broadcast_to(jnp.asarray(standard_deviation), (num,))
    seq = markov_select_terminal(posterior)

    ll_terminal, rv = ssm.condition_qoi(seq.init, data[-1], std[-1])

    def body(rv, inputs):
        cond, y, s = inputs
        rv_prev = ssm.marginalize(rv, cond)
        ll, rv_cond = ssm.condition_qoi(rv_prev, y, s)
        return rv_cond, ll

    _, lls = jax.lax.scan(
        body, rv, (seq.conditional, data[:-1], std[:-1]), reverse=True
    )
    return ll_terminal + jnp.sum(lls)


@_full_precision
def offgrid_marginals_searchsorted(*, ts, solution, solver):
    """Smoothing marginals at off-grid times by searchsorted interpolation.

    Requires a save-every-step smoother solution; all ``ts`` must lie in the
    open interior of the solved time span (the reference facade pads by 1e-6
    to guarantee this: /root/reference/src/odecheckpts/ivpsolvers.py:133-139).
    Parity: ``stats.offgrid_marginals_searchsorted`` (same file, :117,144).

    For tau in (t_k, t_k+1): with F the filtering marginal at t_k, extrapolate
    F to tau; reverse-extrapolate tau -> t_k+1 to get the backward conditional
    p(x(tau) | x(t_k+1), data<=t_k); marginalize it against the smoothing
    marginal at t_k+1.
    """
    ssm = solution.ssm
    posterior = solution.posterior
    grid = solution.t

    marg_rest = markov_marginals(markov_select_terminal(posterior))
    terminal = jax.tree.map(lambda x: x[-1:], posterior.init)
    smoothing = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b]), marg_rest, terminal
    )

    def interp_one(tau):
        idx = jnp.searchsorted(grid, tau)  # grid[idx-1] <= tau < grid[idx]
        idx = jnp.clip(idx, 1, grid.shape[0] - 1)
        rv_f = jax.tree.map(lambda x: x[idx - 1], posterior.init)
        ms = jax.tree.map(lambda x: x[idx], smoothing)
        scale = solution.output_scale[idx]
        # grad-safe double-where: degenerate sub-intervals snap to the grid
        # state (see ivpsolve._interpolate_at for the f32 rationale)
        eps_soft = jnp.asarray(float(jnp.finfo(grid.dtype).eps) ** 0.75, grid.dtype)
        thresh = eps_soft * jnp.maximum(jnp.abs(tau), 1.0)
        close1 = tau - grid[idx - 1] <= thresh
        close2 = grid[idx] - tau <= thresh
        dt1 = jnp.where(close1, jnp.ones((), grid.dtype), tau - grid[idx - 1])
        dt2 = jnp.where(close2, jnp.ones((), grid.dtype), grid[idx] - tau)
        rv_tau, _ = ssm.extrapolate_direct(rv_f, dt1, scale, False)
        rv_tau = jax.tree.map(lambda a, b: jnp.where(close1, a, b), rv_f, rv_tau)
        _, bwd = ssm.extrapolate_direct(rv_tau, dt2, scale, True)
        smoothed = ssm.marginalize(ms, bwd)
        return jax.tree.map(lambda a, b: jnp.where(close2, a, b), ms, smoothed)

    marginals = jax.vmap(interp_one)(jnp.asarray(ts, grid.dtype))
    return ssm.qoi(marginals.mean), marginals

