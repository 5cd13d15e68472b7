"""Adaptive and fixed-grid IVP solve drivers.

API parity with ``probdiffeq.ivpsolve`` as exercised by the reference
(/root/reference/src/odecheckpts/ivpsolvers.py:52-77,
/root/reference/experiments/4_brusselator/run.py:82-129):

    control_proportional_integral, adaptive,
    solve_adaptive_save_at, solve_adaptive_save_every_step,
    solve_adaptive_terminal_values, solve_fixed_grid.

Driver design (TPU-first, SURVEY.md section 7):

* ``solve_adaptive_save_at`` is ONE fused XLA computation: a ``lax.scan`` over
  checkpoints whose body runs the PI-controlled accept/reject loop in a
  ``while_loop`` (overridable / boundable via ``control_flow``), then
  interpolates.  Memory is O(#checkpoints), independent of the step count --
  the paper's contribution.
* The adaptive state carries exactly the three solution copies the reference
  documents (``step_from``, ``interpolate_from``, and the proposal is formed
  in-flight): experiments/4_brusselator/run.py:69-71.
* No data-dependent Python control flow anywhere on the jit paths; everything
  vmaps (batch members simply mask their finished lanes).
* ``solve_adaptive_save_every_step`` is intentionally an eager, jit-per-step
  Python loop with dynamically growing storage -- that is the semantics (and
  the O(#steps) memory behavior) of the textbook baseline the paper compares
  against ("jit step" label, experiments/2_workprec_simple/run_simple.py:110).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import control_flow
from . import ivpsolvers as _solvers
from .ssm.base import Conditional, MarkovSeq, Normal, Solution

# -- step-size control ---------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Control:
    """Proportional-integral step-size controller (clipped power law)."""

    safety: float = 0.95
    factor_min: float = 0.2
    factor_max: float = 10.0
    power_integral: float = 0.3
    power_proportional: float = 0.4


def control_proportional_integral(**kwargs) -> Control:
    """Parity: ``ivpsolve.control_proportional_integral()``
    (/root/reference/src/odecheckpts/ivpsolvers.py:52)."""
    return Control(**kwargs)


def control_integral(**kwargs) -> Control:
    """Classic I-controller (no proportional term)."""
    return Control(power_integral=1.0, power_proportional=0.0, **kwargs)


def _control_factor(ctrl: Control, errn, errn_prev, error_order: int):
    # step-size control is a discrete decision: reverse-mode through
    # errn**-n1 near a ~zero error norm is +-inf (cf. the same guard in the
    # RK driver); the controller output is treated as non-differentiable
    errn = jax.lax.stop_gradient(errn)
    errn_prev = jax.lax.stop_gradient(errn_prev)
    n1 = ctrl.power_integral / error_order
    n2 = ctrl.power_proportional / error_order
    factor = ctrl.safety * errn**-n1 * (errn_prev / errn) ** n2
    factor = jnp.where(jnp.isfinite(factor), factor, ctrl.factor_min)
    return jnp.clip(factor, ctrl.factor_min, ctrl.factor_max)


@dataclasses.dataclass(frozen=True)
class AdaptiveSolver:
    solver: Any
    atol: Any
    rtol: Any
    control: Control


def adaptive(solver, *, atol=1e-4, rtol=1e-2, control: Optional[Control] = None):
    """Wrap a solver in PI-controlled adaptive step selection.

    Parity: ``ivpsolve.adaptive(solver, atol=, rtol=, control=)``
    (/root/reference/src/odecheckpts/ivpsolvers.py:53)."""
    if control is None:
        control = control_proportional_integral()
    return AdaptiveSolver(solver, atol, rtol, control)


# -- adaptive state and single accept/reject attempt ----------------------------


class _State(NamedTuple):
    t: jax.Array
    rv: Normal
    bwd: Optional[Conditional]  # fixedpoint: accumulated; smoother: last step
    scale_step: jax.Array  # output scale used in the last accepted step
    t_prev: jax.Array  # interpolate_from
    rv_prev: Normal
    bwd_prev: Optional[Conditional]
    dt: jax.Array
    errn_prev: jax.Array
    num_steps: jax.Array
    mle_ssq: jax.Array  # running sum of per-step sigma^2 (MLE calibration)


def _init_state(asolver: AdaptiveSolver, init, t0, dt0) -> _State:
    solver = asolver.solver
    ssm = solver.ssm
    rv0, scale0 = init
    dtype = rv0.mean.dtype
    t0 = jnp.asarray(t0, dtype)
    if solver.strategy.needs_reversal:
        ident = ssm.identity_conditional(dtype)
    else:
        ident = None
    scale0 = ssm.promote_output_scale(scale0).astype(dtype)
    return _State(
        t=t0,
        rv=rv0,
        bwd=ident,
        scale_step=scale0,
        t_prev=t0,
        rv_prev=rv0,
        bwd_prev=ident,
        dt=jnp.asarray(dt0, dtype),
        errn_prev=jnp.ones((), dtype),
        num_steps=jnp.zeros((), jnp.int32),
        mle_ssq=jnp.zeros_like(scale0),
    )


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _dt_floor(ssm, dtype):
    """Smallest dt whose preconditioner stays in normal floating-point range
    (dt^(nu+1/2) must not underflow): used to keep dead/masked lanes and
    exact-hit interpolations total under vmap + reverse-mode AD."""
    nu = ssm.num_derivatives
    return jnp.asarray(jnp.finfo(dtype).tiny ** (1.0 / (nu + 1.5)), dtype)


def _make_step(vf, asolver: AdaptiveSolver, scale_fixed, dt_max=None):
    """One accept/reject attempt; total function (no data-dependent python).

    ``dt_max`` bounds the proposal so that masked-out lanes (vmap batches,
    bounded loops) never drive dt to overflow: required for NaN-free
    reverse-mode AD through the adaptive loop.
    """
    solver = asolver.solver
    strategy = solver.strategy
    ssm = strategy.ssm
    ctrl = asolver.control
    error_order = ssm.num_derivatives + 1
    fixedpoint = strategy.kind == _solvers.FIXEDPOINT
    # local->global error calibration (step control only; posterior untouched)
    kappa = strategy.correction.calibration_factor

    def step(s: _State) -> _State:
        dt = jnp.maximum(s.dt, _dt_floor(ssm, s.dt.dtype))
        if dt_max is not None:
            dt = jnp.minimum(dt, dt_max)
        t_new = s.t + dt
        m_pred, cache = ssm.extrapolate_mean(s.rv.mean, dt)
        z, jacs = _solvers.linearize(strategy, vf, m_pred, t_new)
        sigma, err = _solvers.error_and_scale(strategy, z, jacs, cache)

        u_pred = ssm.qoi(m_pred)
        tolerance = asolver.atol + asolver.rtol * jnp.abs(u_pred)
        errn = kappa * jnp.sqrt(jnp.mean((err / tolerance) ** 2))

        if solver.calibration == _solvers.DYNAMIC:
            tiny = jnp.asarray(jnp.finfo(m_pred.dtype).tiny ** 0.5, m_pred.dtype)
            scale = jnp.maximum(sigma, tiny)
        else:
            scale = ssm.promote_output_scale(scale_fixed).astype(m_pred.dtype)
        rv_pred, bwd_step = ssm.extrapolate_cov(
            s.rv, m_pred, cache, scale, strategy.needs_reversal
        )
        rv_cor, _obs = _solvers.correct(strategy, rv_pred, z, jacs)
        if strategy.needs_reversal:
            bwd_new = ssm.compose(s.bwd, bwd_step) if fixedpoint else bwd_step
        else:
            bwd_new = None

        factor = _control_factor(ctrl, errn, s.errn_prev, error_order)
        dt_next = dt * factor
        if dt_max is not None:
            dt_next = jnp.minimum(dt_next, dt_max)

        # Forced acceptance once dt underflows the local time resolution:
        # keeps the loop total instead of spinning forever on pathological
        # vector fields (NaN states then propagate to the output, like the
        # reference's divergence assertion expects: vdp.py:107-108).
        eps = jnp.finfo(dt.dtype).eps
        dt_stall = 4.0 * eps * jnp.maximum(jnp.abs(s.t), 1.0)
        accept = (errn <= 1.0) | (dt <= dt_stall)

        accepted = _State(
            t=t_new,
            rv=rv_cor,
            bwd=bwd_new,
            scale_step=scale,
            t_prev=s.t,
            rv_prev=s.rv,
            bwd_prev=s.bwd,
            dt=dt_next,
            errn_prev=jnp.maximum(errn, jnp.finfo(dt.dtype).tiny),
            num_steps=s.num_steps + 1,
            mle_ssq=s.mle_ssq + sigma**2,
        )
        rejected = s._replace(dt=dt_next)
        return _tree_select(accept, accepted, rejected)

    return step


# -- interpolation at a checkpoint ----------------------------------------------


def _interpolate_at(strategy, state: _State, t):
    """Emit the solution at interior time t (t_prev <= t <= state.t) and
    rewire the adaptive state so subsequent checkpoints remain consistent.

    Fixedpoint bookkeeping (SURVEY.md hard part #1): the emitted conditional
    maps x(t) back to the *previous* checkpoint (compose(bwd_prev, B1)); the
    continuing state's accumulator is reset to B2 = p(x(t) | x(state.t)),
    obtained by reverse-extrapolating the interpolated marginal.

    Near-degenerate sub-intervals (a step landing ~exactly on the checkpoint)
    are snapped to exact identity conditionals with the grad-safe double-where
    pattern: at dt below ~eps^(3/4) the preconditioned reversal loses the
    dt^(i-j) off-diagonal structure to roundoff (overflowing in f32), while
    the true conditional is identity to within state resolution anyway.
    """
    ssm = strategy.ssm
    dtype = state.rv.mean.dtype
    fixedpoint = strategy.kind == _solvers.FIXEDPOINT
    needs_rev = strategy.needs_reversal
    ident = ssm.identity_conditional(dtype) if needs_rev else None
    eps_soft = jnp.asarray(float(jnp.finfo(dtype).eps) ** 0.75, dtype)
    thresh = eps_soft * jnp.maximum(jnp.abs(jnp.asarray(t, dtype)), 1.0)

    def exact(_):
        emit = (state.rv, state.bwd)
        new = state._replace(
            bwd=ident, t_prev=state.t, rv_prev=state.rv, bwd_prev=ident
        )
        return emit, new

    def interp(_):
        # Interpolation uses the *direct* (unpreconditioned) extrapolation:
        # sub-intervals can be arbitrarily short relative to the state
        # covariance, where the preconditioned reversal amplifies roundoff
        # (see prior.phi_direct).
        dt1_raw = t - state.t_prev
        close1 = dt1_raw <= thresh
        dt1 = jnp.where(close1, jnp.ones((), dtype), dt1_raw)  # sanitized input
        if not needs_rev:
            rv_t, _ = ssm.extrapolate_direct(
                state.rv_prev, dt1, state.scale_step, False
            )
            rv_t = _tree_select(close1, state.rv_prev, rv_t)
            emit = (rv_t, None)
            new = state._replace(t_prev=jnp.asarray(t, dtype), rv_prev=rv_t)
            return emit, new
        rv_t, b1 = ssm.extrapolate_direct(
            state.rv_prev, dt1, state.scale_step, True
        )
        rv_t = _tree_select(close1, state.rv_prev, rv_t)
        b1 = _tree_select(close1, ident, b1)
        emit_cond = ssm.compose(state.bwd_prev, b1) if fixedpoint else b1

        dt2_raw = state.t - t
        close2 = dt2_raw <= thresh
        dt2 = jnp.where(close2, jnp.ones((), dtype), dt2_raw)
        _, b2 = ssm.extrapolate_direct(rv_t, dt2, state.scale_step, True)
        b2 = _tree_select(close2, ident, b2)
        new = state._replace(
            bwd=b2, t_prev=jnp.asarray(t, dtype), rv_prev=rv_t, bwd_prev=ident
        )
        return (rv_t, emit_cond), new

    return jax.lax.cond(state.t == t, exact, interp, None)


# -- mle rescaling ---------------------------------------------------------------


def _mle_factor(state: _State):
    n = jnp.maximum(state.num_steps, 1).astype(state.mle_ssq.dtype)
    return jnp.sqrt(state.mle_ssq / n)


def _maybe_rescale(solver, state, solution: Solution) -> Solution:
    if solver.calibration != _solvers.MLE:
        return solution
    ssm = solver.ssm
    factor = _mle_factor(state)
    post = solution.posterior
    init = Normal(post.init.mean, ssm.rescale_cholesky(post.init.cholesky, factor))
    cond = post.conditional
    if cond is not None:
        cond = Conditional(
            cond.matrix,
            Normal(
                cond.noise.mean, ssm.rescale_cholesky(cond.noise.cholesky, factor)
            ),
        )
    marg = solution.marginals
    if marg is not None:
        marg = Normal(marg.mean, ssm.rescale_cholesky(marg.cholesky, factor))
    return dataclasses.replace(
        solution,
        posterior=MarkovSeq(init, cond, ssm=ssm),
        marginals=marg,
        u_std=solution.u_std * factor,
        output_scale=jnp.broadcast_to(factor, jnp.shape(solution.output_scale)),
    )


# -- drivers ---------------------------------------------------------------------

def _full_precision(fn):
    """Trace solver math at full f32 matmul precision.

    TPU matmul/einsum default to bf16 passes; the solver's tiny covariance
    algebra is latency- (not FLOP-) bound and bf16 noise corrupts the error
    estimates (observed: 17x step-count inflation on TPU vs CPU at f32).
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    # Inspectable marker: tests assert EVERY adaptive driver carries this
    # guard (it was silently dropped from one driver once — d7815fa).
    wrapped.__full_precision__ = True
    return wrapped



def _tree_prepend(first, rest):
    return jax.tree.map(lambda f, r: jnp.concatenate([f[None], r]), first, rest)


def _validate_increasing(ts, name):
    """Concrete-value misuse guard (skipped for traced arrays inside jit)."""
    import numpy as np

    try:
        arr = np.asarray(ts)
    except Exception:
        return  # traced: shapes-only, cannot validate values
    if arr.ndim != 1 or arr.size == 0:
        raise ValueError(f"{name} must be a non-empty 1-D array")
    if arr.size > 1 and not np.all(np.diff(arr) > 0):
        raise ValueError(f"{name} must be strictly increasing")


@_full_precision
def solve_adaptive_save_at(vf, init, *, save_at, dt0, adaptive_solver):
    """Adaptive solve with O(#save_at) memory (the paper's flagship driver).

    Parity: ``ivpsolve.solve_adaptive_save_at``
    (/root/reference/src/odecheckpts/ivpsolvers.py:71-77).  One jittable scan
    over checkpoints; the posterior is a stacked backward MarkovSeq over the
    ``save_at`` grid.
    """
    asolver = adaptive_solver
    solver = asolver.solver
    ssm = solver.ssm
    strategy = solver.strategy
    rv0, scale0 = init
    _validate_increasing(save_at, "save_at")
    state0 = _init_state(asolver, init, save_at[0], dt0)
    step = _make_step(vf, asolver, scale0, dt_max=save_at[-1] - save_at[0])

    def per_checkpoint(state, t_next):
        state = control_flow.while_loop(lambda s: s.t < t_next, step, state)
        (rv_e, cond_e), state = _interpolate_at(strategy, state, t_next)
        return state, (rv_e, cond_e, state.num_steps, state.scale_step)

    final, (rvs, conds, nsteps, scales) = jax.lax.scan(
        per_checkpoint, state0, save_at[1:]
    )

    rvs = _tree_prepend(rv0, rvs)
    if conds is not None:
        conds = _tree_prepend(state0.bwd, conds)
    nsteps = _tree_prepend(jnp.zeros((), nsteps.dtype), nsteps)
    scales = _tree_prepend(ssm.promote_output_scale(scale0).astype(scales.dtype), scales)

    sol = Solution(
        t=save_at,
        u=ssm.qoi(rvs.mean),
        u_std=ssm.qoi_std(rvs),
        output_scale=scales,
        marginals=None,
        posterior=MarkovSeq(rvs, conds, ssm=ssm),
        num_steps=nsteps,
        ssm=ssm,
    )
    return _maybe_rescale(solver, final, sol)


@_full_precision
def solve_adaptive_terminal_values(vf, init, *, t0, t1, dt0, adaptive_solver):
    """Adaptive solve, keeping only the terminal state (O(1) memory).

    Parity: ``ivpsolve.solve_adaptive_terminal_values``
    (/root/reference/experiments/4_brusselator/run.py:82-89)."""
    asolver = adaptive_solver
    solver = asolver.solver
    ssm = solver.ssm
    rv0, scale0 = init
    state0 = _init_state(asolver, init, t0, dt0)
    step = _make_step(vf, asolver, scale0, dt_max=t1 - t0)
    state = control_flow.while_loop(lambda s: s.t < t1, step, state0)
    (rv_e, cond_e), state = _interpolate_at(solver.strategy, state, jnp.asarray(t1))
    sol = Solution(
        t=jnp.asarray(t1, rv_e.mean.dtype),
        u=ssm.qoi(rv_e.mean),
        u_std=ssm.qoi_std(rv_e),
        output_scale=state.scale_step,
        marginals=None,
        posterior=MarkovSeq(rv_e, cond_e, ssm=ssm),
        num_steps=state.num_steps,
        ssm=ssm,
    )
    return _maybe_rescale(solver, state, sol)


@_full_precision
def solve_adaptive_save_every_step(vf, init, *, t0, t1, dt0, adaptive_solver):
    """Adaptive solve storing EVERY accepted step (O(#steps) memory).

    This is the textbook baseline the paper's memory experiment compares
    against (/root/reference/experiments/4_brusselator/run.py:110-116).  By
    its nature the output length is data-dependent, so this driver runs the
    loop eagerly with a jitted step function ("jit step"); it is NOT jittable
    as a whole.  For a bounded, fully-jitted variant see
    ``solve_adaptive_save_every_step_bounded``.
    """
    asolver = adaptive_solver
    solver = asolver.solver
    ssm = solver.ssm
    strategy = solver.strategy
    rv0, scale0 = init
    state = _init_state(asolver, init, t0, dt0)
    step = jax.jit(_make_step(vf, asolver, scale0, dt_max=t1 - t0))
    interp = jax.jit(
        lambda s, t: _interpolate_at(strategy, s, jnp.asarray(t, s.t.dtype))
    )

    t1_f = float(t1)
    emits = [(state.t, state.rv, state.bwd, state.num_steps, state.scale_step)]
    while float(state.t) < t1_f:
        t_before = float(state.t)
        state = step(state)
        if float(state.t) > t_before and float(state.t) <= t1_f:
            emits.append(
                (state.t, state.rv, state.bwd, state.num_steps, state.scale_step)
            )
    if float(state.t) > t1_f:
        (rv_e, cond_e), state = interp(state, t1_f)
        emits.append((state.t_prev, rv_e, cond_e, state.num_steps, state.scale_step))

    ts, rvs, conds, nsteps, scales = jax.tree.map(lambda *xs: jnp.stack(xs), *emits)
    sol = Solution(
        t=ts,
        u=ssm.qoi(rvs.mean),
        u_std=ssm.qoi_std(rvs),
        output_scale=scales,
        marginals=None,
        posterior=MarkovSeq(rvs, conds, ssm=ssm),
        num_steps=nsteps,
        ssm=ssm,
    )
    return _maybe_rescale(solver, state, sol)


@_full_precision
def solve_adaptive_save_every_step_bounded(
    vf, init, *, t0, t1, dt0, adaptive_solver, max_steps: int
):
    """Fully-jittable save-every-step: static max_steps, masked tail.

    TPU-native addition (no reference equivalent): output arrays have length
    ``max_steps + 1``; entries past the true step count repeat the terminal
    state and are flagged invalid in ``valid``.  Returns (solution, valid).
    """
    asolver = adaptive_solver
    solver = asolver.solver
    ssm = solver.ssm
    rv0, scale0 = init
    state0 = _init_state(asolver, init, t0, dt0)
    step = _make_step(vf, asolver, scale0, dt_max=t1 - t0)

    def scan_step(state, _):
        running = state.t < t1
        new = _tree_select(running, step(state), state)
        accepted = new.t > state.t
        return new, (new.t, new.rv, new.bwd, new.num_steps, new.scale_step, accepted)

    final, (ts, rvs, conds, nsteps, scales, accepted) = jax.lax.scan(
        scan_step, state0, None, length=max_steps
    )
    (rv_e, cond_e), final2 = _interpolate_at(
        solver.strategy, final, jnp.asarray(t1, final.t.dtype)
    )
    ts = _tree_prepend(state0.t, ts)
    rvs = _tree_prepend(rv0, rvs)
    if conds is not None:
        conds = _tree_prepend(state0.bwd, conds)
    nsteps = _tree_prepend(jnp.zeros((), nsteps.dtype), nsteps)
    scales = _tree_prepend(ssm.promote_output_scale(scale0).astype(scales.dtype), scales)
    valid = _tree_prepend(jnp.asarray(True), accepted & (ts[1:] <= t1))
    sol = Solution(
        t=ts,
        u=ssm.qoi(rvs.mean),
        u_std=ssm.qoi_std(rvs),
        output_scale=scales,
        marginals=None,
        posterior=MarkovSeq(rvs, conds, ssm=ssm),
        num_steps=nsteps,
        ssm=ssm,
    )
    return _maybe_rescale(solver, final2, sol), (valid, (rv_e, cond_e))


def compact_bounded_solution(solution: Solution, valid) -> Solution:
    """Host-side compaction of a bounded save-every-step solution.

    Drops the masked (rejected / past-t1) entries that
    ``solve_adaptive_save_every_step_bounded`` pads with; output length is
    data-dependent, so this runs eagerly (outside jit), mirroring how the
    eager driver would have stored the trajectory.
    """
    import numpy as np

    idx = jnp.asarray(np.flatnonzero(np.asarray(valid)))

    def take(x):
        return jnp.take(x, idx, axis=0)

    return dataclasses.replace(
        solution,
        t=take(solution.t),
        u=take(solution.u),
        u_std=take(solution.u_std),
        output_scale=take(solution.output_scale),
        posterior=jax.tree.map(take, solution.posterior),
        num_steps=take(solution.num_steps),
    )


@_full_precision
def solve_adaptive_parallel_in_time(
    vf, init, *, t0, t1, dt0, adaptive_solver, max_steps,
    iterations=12, window=16, form="sqrt", warmstart="discovery",
    damping=0.0, precondition=True, iteration_tol=1e-8,
    combine_engine=None, return_diagnostics=False,
):
    """ADAPTIVE parallel-in-time solve: grid discovery + parallel re-solve.

    The parallel-in-time sweep needs a fixed grid; adaptivity makes the grid
    data-dependent.  This driver bridges the two (ROADMAP #9's adaptive
    case): a sequential bounded save-every-step FILTER pass records the
    accepted adaptive grid (cheap: terminal-memory state, no backward
    factors), then ``solve_fixed_grid(parallel=True)`` re-solves on exactly
    that grid with the windowed associative-scan sweep -- so step-size
    selection stays sequential-quality while the expensive (strategy-rich,
    iterated) solve runs parallel-in-time.  Eager between the passes (the
    grid length is data-dependent), like the reference's eager every-step
    driver (/root/reference/src/odecheckpts/ivpsolvers.py solve-and-save-
    every-step usage).

    ``warmstart="discovery"`` (default) seeds every window's linearization
    from the discovery pass's own filtered means, extrapolated one step
    (l_k = Phi_k m_{k-1}) -- the states the sequential pass would linearize
    at, within local error, FOR FREE (the pass already ran).  This is what
    makes STIFF adaptive grids converge: explicit warm starts (rk) explode
    on the large slow-manifold steps stiff-adaptive grids accept, and the
    constant-trajectory start needs ~30 sweeps at fast transitions.  Any
    ``solve_fixed_grid`` warmstart value passes through unchanged.
    ``iteration_tol`` (default 1e-8) makes the per-window sweep count
    adaptive: windows stop sweeping once converged (2-3 sweeps typical with
    the discovery warm start), up to ``iterations``.

    Returns the fixed-grid Solution on the discovered grid (plus the
    per-window diagnostics dict when ``return_diagnostics``).  The discovery
    pass uses the FILTER strategy regardless of ``adaptive_solver``'s
    strategy (only accepted times are kept); the re-solve uses the solver
    exactly as given.
    """
    solver = adaptive_solver.solver
    # grid discovery with a filter-strategy twin (terminal memory; the
    # controller sees identical error estimates, so the grid matches the
    # given solver's adaptive grid)
    strat_f = _solvers.strategy_filter(solver.ssm, solver.strategy.correction)
    solver_f = (
        _solvers.solver_dynamic(strat_f)
        if solver.calibration == _solvers.DYNAMIC
        else _solvers.solver(strat_f)
    )
    asolver_f = adaptive(
        solver_f, atol=adaptive_solver.atol, rtol=adaptive_solver.rtol,
        control=adaptive_solver.control,
    )
    sol_f, (valid, _tail) = solve_adaptive_save_every_step_bounded(
        vf, init, t0=t0, t1=t1, dt0=dt0, adaptive_solver=asolver_f,
        max_steps=max_steps,
    )
    import numpy as np

    valid_np = np.asarray(valid)
    ts = np.asarray(sol_f.t)[valid_np]
    t1_f = float(np.asarray(t1))
    if ts[-1] < t1_f:
        ts = np.concatenate([ts, [t1_f]])
    grid = jnp.asarray(ts, sol_f.t.dtype)
    if isinstance(warmstart, str) and warmstart == "discovery":
        ssm = solver.ssm
        means_f = np.asarray(sol_f.posterior.init.mean)[valid_np]
        m_prev = jnp.asarray(means_f[: len(ts) - 1])
        warmstart = jax.vmap(
            lambda m, dt: ssm.extrapolate_mean(m, dt)[0]
        )(m_prev, jnp.diff(grid))
    return solve_fixed_grid(
        vf, init, grid=grid, solver=solver, parallel=True,
        iterations=iterations, window=window, form=form,
        warmstart=warmstart, damping=damping, precondition=precondition,
        iteration_tol=iteration_tol, combine_engine=combine_engine,
        return_diagnostics=return_diagnostics,
    )


@_full_precision
def solve_fixed_grid(
    vf, init, *, grid, solver, parallel=False, iterations=8, window=16,
    form="cov", warmstart=None, damping=0.0, precondition=True,
    deviation=True, fallback_rtol=1.0, time_shard=None, combine_engine=None,
    iteration_tol=None, return_diagnostics=False,
):
    """Non-adaptive solve on a user grid (any strategy), one ``lax.scan``.

    Parity: ``ivpsolve.solve_fixed_grid``
    (/root/reference/experiments/1_van_der_pol/vdp.py:90-102,
    experiments/5_vs_interpolation/measure.py:134).  With the smoother
    strategy the result carries the full backward MarkovSeq over the grid, as
    required for posterior sampling on a "tstops"-style grid.

    ``parallel=True``: run the forward pass parallel-in-time -- windows of
    ``window`` steps as associative scans with ``iterations`` linearization
    sweeps each; reversal strategies (smoother/fixedpoint) get their
    backward conditionals by a post-pass vmapped revert of the filtered
    marginals.  ``form="sqrt"`` combines square-root (QR) elements, the
    f32-viable variant; ``time_shard=(mesh, axis)`` shards the window
    combines along the STEP axis over a device mesh (the multi-chip axis a
    single IVP can scale on); see
    ``parallel_time.solve_fixed_grid_parallel``."""
    if parallel:
        from . import parallel_time

        return parallel_time.solve_fixed_grid_parallel(
            vf, init, grid=grid, solver=solver, iterations=iterations,
            window=window, form=form, warmstart=warmstart, damping=damping,
            precondition=precondition, deviation=deviation,
            fallback_rtol=fallback_rtol, time_shard=time_shard,
            combine_engine=combine_engine, iteration_tol=iteration_tol,
            return_diagnostics=return_diagnostics,
        )
    if form != "cov" or warmstart is not None or damping != 0.0 or (
        time_shard is not None or combine_engine is not None
        or iteration_tol is not None
    ):
        raise ValueError(
            "form/warmstart/damping/time_shard/combine_engine/iteration_tol "
            "configure the parallel-in-time sweep and have no effect when "
            "parallel=False; pass parallel=True or drop them (got "
            f"form={form!r}, warmstart={warmstart!r}, damping={damping!r}, "
            f"time_shard={time_shard!r}, combine_engine={combine_engine!r}, "
            f"iteration_tol={iteration_tol!r})."
        )
    ssm = solver.ssm
    strategy = solver.strategy
    rv0, scale0 = init
    dtype = rv0.mean.dtype
    _validate_increasing(grid, "grid")
    grid = jnp.asarray(grid, dtype)

    def scan_fn(carry, t_dt):
        rv, mle_ssq, count = carry
        t_new, dt = t_dt
        m_pred, cache = ssm.extrapolate_mean(rv.mean, dt)
        z, jacs = _solvers.linearize(strategy, vf, m_pred, t_new)
        sigma, _err = _solvers.error_and_scale(strategy, z, jacs, cache)
        if solver.calibration == _solvers.DYNAMIC:
            tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
            scale = jnp.maximum(sigma, tiny)
        else:
            scale = ssm.promote_output_scale(scale0).astype(dtype)
        rv_pred, bwd = ssm.extrapolate_cov(
            rv, m_pred, cache, scale, strategy.needs_reversal
        )
        rv_cor, _obs = _solvers.correct(strategy, rv_pred, z, jacs)
        return (rv_cor, mle_ssq + sigma**2, count + 1), (rv_cor, bwd, scale)

    ts = grid[1:]
    dts = jnp.diff(grid)
    # mle_ssq is per-component for backends with per-dimension output scales
    # (blockdiag: sigma is (d,)), matching the adaptive drivers' _State init
    ssq0 = jnp.zeros_like(ssm.promote_output_scale(scale0).astype(dtype))
    (rv_last, mle_ssq, count), (rvs, conds, scales) = jax.lax.scan(
        scan_fn, (rv0, ssq0, jnp.zeros((), jnp.int32)), (ts, dts)
    )

    rvs = _tree_prepend(rv0, rvs)
    scales = _tree_prepend(ssm.promote_output_scale(scale0).astype(dtype), scales)
    if conds is not None:
        conds = _tree_prepend(ssm.identity_conditional(dtype), conds)

    sol = Solution(
        t=grid,
        u=ssm.qoi(rvs.mean),
        u_std=ssm.qoi_std(rvs),
        output_scale=scales,
        marginals=None,
        posterior=MarkovSeq(rvs, conds, ssm=ssm),
        num_steps=jnp.arange(len(grid), dtype=jnp.int32),
        ssm=ssm,
    )
    state_like = _State(
        t=grid[-1],
        rv=rv_last,
        bwd=None,
        scale_step=scales[-1],
        t_prev=grid[-1],
        rv_prev=rv_last,
        bwd_prev=None,
        dt=dts[-1],
        errn_prev=jnp.ones((), dtype),
        num_steps=count,
        mle_ssq=mle_ssq,
    )
    return _maybe_rescale(solver, state_like, sol)
