"""Fused batched SAVE-EVERY-STEP adaptive solver (bounded, smoother-capable).

Closes the fused-engine scope gap for the save-every-step workload class
(ROADMAP #7 residual): the reference's textbook baseline stores every
accepted step (/root/reference/experiments/4_brusselator/run.py:110-116 via
``solve_adaptive_save_every_step``), and the generic TPU-native bounded
driver (``ivpsolve.solve_adaptive_save_every_step_bounded``) does the same
for ONE instance under jit.  This module runs the bounded form on the fused
lanes-last step kernel for whole IVP ensembles.

Design — ATTEMPT-ALIGNED emission.  Output length is data-dependent per
lane, which cannot fit a fixed-shape program; instead the driver scans a
static ``max_steps`` attempts and emits one slot per attempt:

* the slot stores (t, posterior rv, one-step backward conditional,
  accepted); rejected/frozen slots emit an IDENTITY conditional, which is
  exactly neutral under backward composition — so a single masked backward
  sweep smooths the whole ragged ensemble without compaction;
* the emission index is the scalar attempt counter — shared by every lane —
  so no per-lane scatter exists anywhere (TPU-friendly: Mosaic has no
  scatter, and XLA keeps the buffer as one dynamic-update-slice per step);
* lanes that reach ``t1`` freeze inside the step kernel (accept=False), so
  their remaining slots are masked invalid.

Engines: ``xla`` and per-attempt ``pallas`` (each attempt's state round-trips
through HBM anyway to append the slot, so the in-kernel-loop engine has no
buffer to write into VMEM — it is rejected with an actionable error).

Strategies: ``smoother`` (per-step backward conditionals + masked backward
marginals), ``filter`` (no backward pass).  The fixedpoint strategy is a
save_at concept (accumulate BETWEEN checkpoints) and does not apply here.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .batched import (
    LANES,
    _generic_to_state,
    _pallas_step,
    _state_to_generic,
    check_hbm_budget,
    make_step_ll,
)
from .ivpsolve import _interpolate_at, _State, _tree_select
from .ssm.base import Conditional, Normal


class EveryStepSolution(NamedTuple):
    """Attempt-aligned bounded ensemble solution (batch-major).

    ``t``/``u``/``u_std``/``valid`` have a slot axis of length
    ``max_steps + 1`` (slot 0 is the initial condition); slots with
    ``valid == False`` are rejected attempts, post-``t1`` freezes, or the
    overshoot slot, and must be ignored (``compact`` drops them).  The
    terminal state at exactly ``t1`` is returned separately
    (``u_t1``/``u_std_t1``/``marginal_*_t1`` are already smoothed: the
    terminal filtering and smoothing marginals coincide).
    """

    t: jax.Array  # (B, K+1)
    u: jax.Array  # (B, K+1, d) filtered means at the slots
    u_std: jax.Array  # (B, K+1, d)
    valid: jax.Array  # (B, K+1) bool
    num_steps: jax.Array  # (B,) accepted steps
    u_t1: jax.Array  # (B, d)
    u_std_t1: jax.Array  # (B, d)
    marginal_u: Optional[jax.Array]  # (B, K+1, d) smoothed means (smoother)
    marginal_u_std: Optional[jax.Array]  # (B, K+1, d)


def compact(sol: EveryStepSolution, lane: int):
    """Host-side per-lane compaction (eager; output length is data-
    dependent), mirroring ``ivpsolve.compact_bounded_solution``."""
    import numpy as np

    idx = np.flatnonzero(np.asarray(sol.valid[lane]))
    take = lambda x: None if x is None else np.asarray(x[lane])[idx]  # noqa: E731
    return {
        "t": take(sol.t),
        "u": take(sol.u),
        "u_std": take(sol.u_std),
        "marginal_u": take(sol.marginal_u),
        "marginal_u_std": take(sol.marginal_u_std),
    }


def solve_every_step_batched(
    vf,
    u0s,
    params,
    *,
    t0,
    t1,
    dt0,
    tols,
    max_steps: int,
    num_derivatives=4,
    strategy="smoother",
    calibration="dynamic",
    atol_factor=1e-3,
    engine="xla",
    interpret=False,
    vf_vectorized=True,
    lanes=None,
    hbm_budget="auto",
    ode_order=1,
    correction="ts0",
    error_unit="qoi",
    error_calibration=None,
) -> EveryStepSolution:
    """Bounded save-every-step adaptive solve for an IVP ensemble.

    Same step/controller semantics as ``batched.solve_save_at_batched``
    (isotropic backend; ``correction="ts1"`` for d=1).  ``max_steps`` bounds
    ATTEMPTS (accepted + rejected), like the generic bounded driver.
    """
    from . import ivpsolvers, taylor

    if strategy not in ("smoother", "filter"):
        raise ValueError(
            "save-every-step supports strategy 'smoother' or 'filter'; "
            "fixedpoint accumulation is a save_at concept "
            f"(got {strategy!r})"
        )
    if engine not in ("xla", "pallas"):
        raise ValueError(
            "save-every-step engines: 'xla' or per-attempt 'pallas' (the "
            "slot buffer lives in HBM, so the in-kernel-loop engine has "
            f"nothing to gain; got {engine!r})"
        )
    u0s_tuple = u0s if isinstance(u0s, tuple) else (u0s,)
    if len(u0s_tuple) != ode_order:
        raise ValueError(
            f"ode_order={ode_order} needs {ode_order} initial arrays, "
            f"got {len(u0s_tuple)}"
        )
    b, d = u0s_tuple[0].shape
    if correction == "ts1" and d > 1:
        raise ValueError("save-every-step ts1 supports d=1 (isotropic layout)")
    nu = num_derivatives
    # slot buffers dominate: rv (nd + n^2) + cond (2 n^2 + nd) + t/flags,
    # ~= the save_at driver's per-checkpoint cost with max_steps checkpoints
    check_hbm_budget(
        b, d, num_derivatives=nu, num_save_at=max_steps + 1,
        dtype=u0s_tuple[0].dtype, budget=hbm_budget,
    )
    lane_width = lanes or min(LANES * 4, max(LANES, b))
    pad = (-b) % lane_width
    if pad:
        loosest = jnp.argmax(tols)

        def _rep(u):
            row = jax.lax.dynamic_slice_in_dim(u, loosest, 1, axis=0)
            return jnp.concatenate([u, jnp.tile(row, (pad, 1))])

        u0s_tuple = tuple(_rep(u) for u in u0s_tuple)
        tols = jnp.concatenate([tols, jnp.broadcast_to(tols[loosest], (pad,))])
    bb = u0s_tuple[0].shape[0]
    dtype = u0s_tuple[0].dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)

    ssm = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(d,))
    corr = (
        ivpsolvers.correction_ts1(
            ode_order=ode_order, error_unit=error_unit,
            error_calibration=error_calibration,
        )
        if correction == "ts1"
        else ivpsolvers.correction_ts0(
            ode_order=ode_order, error_unit=error_unit,
            error_calibration=error_calibration,
        )
    )
    strat = {
        "filter": ivpsolvers.strategy_filter,
        "smoother": ivpsolvers.strategy_smoother,
    }[strategy](ssm, corr)
    solver_cfg = (
        ivpsolvers.solver_dynamic(strat)
        if calibration == "dynamic"
        else ivpsolvers.solver(strat)
    )
    needs_rev = strat.needs_reversal

    def vf_p(*ys, t):
        return vf(*ys, t=t, p=params)

    if vf_vectorized:
        def vfb(args_dB, t_1B):
            return vf_p(*args_dB, t=t_1B[0])
    else:
        vf_vmapped = jax.vmap(
            lambda args, t: vf_p(*args, t=t),
            in_axes=(tuple([-1] * ode_order), -1),
            out_axes=-1,
        )

        def vfb(args_dB, t_1B):
            bsz = args_dB[0].shape[-1]
            return vf_vmapped(args_dB, jnp.broadcast_to(t_1B[0], (bsz,)))

    def init_one(u0_tuple):
        tco = taylor.odejet_padded_scan(
            lambda *y: vf_p(*y, t=t0), u0_tuple, num=nu + 1 - ode_order
        )
        return solver_cfg.initial_condition(tco, jnp.ones((), dtype))

    rv0, scale0 = jax.vmap(init_one)(u0s_tuple)
    ident = ssm.identity_conditional(dtype)
    ident_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (bb,) + x.shape), ident)
    s0_generic = _State(
        t=jnp.full((bb,), t0, dtype),
        rv=rv0,
        bwd=ident_b if needs_rev else None,
        scale_step=scale0,
        t_prev=jnp.full((bb,), t0, dtype),
        rv_prev=rv0,
        bwd_prev=ident_b if needs_rev else None,
        dt=jnp.full((bb,), dt0, dtype),
        errn_prev=jnp.ones((bb,), dtype),
        num_steps=jnp.zeros((bb,), jnp.int32),
        mle_ssq=jnp.zeros((bb,), dtype),
    )
    state0 = _generic_to_state(s0_generic, needs_rev, dtype)

    step_ll = make_step_ll(
        vfb, nu=nu, d=d, strategy=strategy, calibration=calibration,
        ode_order=ode_order, correction=correction, error_unit=error_unit,
        error_calibration=error_calibration,
    )
    step_call = (
        _pallas_step(step_ll, interpret=interpret, lanes=lane_width)
        if engine == "pallas"
        else step_ll
    )

    atol = (atol_factor * tols)[None, :].astype(dtype)
    rtol = tols[None, :].astype(dtype)
    t1_v = jnp.full((1, bb), t1, dtype)
    dt_max_v = jnp.full((1, bb), t1 - t0, dtype)
    dt_floor_v = jnp.full(
        (1, bb), float(jnp.finfo(dtype).tiny) ** (1.0 / (nu + 1.5)), dtype
    )
    tiny_v = jnp.full((1, bb), float(jnp.finfo(dtype).tiny) ** 0.5, dtype)
    eye_ll = jnp.broadcast_to(
        jnp.eye(nu + 1, dtype=dtype)[:, :, None], (nu + 1, nu + 1, bb)
    )

    def scan_step(state, _):
        t_old = state[0]
        new = step_call(
            state, t1_v, atol, rtol, dt_max_v, dt_floor_v, tiny_v
        )
        acc = new[0] > t_old  # (1, bb)
        if needs_rev:
            # identity conditional at rejected slots: exactly neutral under
            # the masked backward composition below
            a2 = acc[None]
            bwdG = jnp.where(a2, new[3], eye_ll)
            bwd_m = jnp.where(a2, new[4], jnp.zeros_like(new[4]))
            bwd_L = jnp.where(a2, new[5], jnp.zeros_like(new[5]))
            emit = (new[0], new[1], new[2], bwdG, bwd_m, bwd_L, acc)
        else:
            emit = (new[0], new[1], new[2], acc)
        return new, emit

    with jax.default_matmul_precision("float32"):
        final, emits = jax.lax.scan(scan_step, state0, None, length=max_steps)
        gen = _state_to_generic(final, needs_rev)
        interp_v = jax.vmap(
            lambda s, t: _interpolate_at(strat, s, t), in_axes=(0, None)
        )
        (rv_e, cond_e), gen2 = interp_v(gen, t1)

    # batch-major views (slot axis second): (K, a, B) -> (B, K, a)
    def bt(x):
        return jnp.moveaxis(x, -1, 0)

    ts = bt(emits[0][:, 0, :])  # (B, K)
    # emits[1] is (K, n, d, B); per-lane stacks (B, K, n, d)
    means = jnp.transpose(emits[1], (3, 0, 1, 2))
    chols = jnp.transpose(emits[2], (3, 0, 1, 2))
    acc_sl = bt(emits[-1][:, 0, :])  # (B, K) bool
    valid = acc_sl & (ts < t1)  # the t1/overshoot slot is the terminal below

    rvs = Normal(means, chols)
    u_slots = jax.vmap(jax.vmap(ssm.qoi))(rvs.mean)
    u_std_slots = jax.vmap(jax.vmap(ssm.qoi_std))(rvs)

    # prepend the initial condition as slot 0 (always valid)
    t_all = jnp.concatenate([jnp.full((bb, 1), t0, dtype), ts], axis=1)
    u0_q = jax.vmap(ssm.qoi)(rv0.mean)
    u0_std = jax.vmap(ssm.qoi_std)(rv0)
    u_all = jnp.concatenate([u0_q[:, None], u_slots], axis=1)
    u_std_all = jnp.concatenate([u0_std[:, None], u_std_slots], axis=1)
    valid_all = jnp.concatenate(
        [jnp.ones((bb, 1), bool), valid], axis=1
    )
    u_t1 = jax.vmap(ssm.qoi)(rv_e.mean)
    u_std_t1 = jax.vmap(ssm.qoi_std)(rv_e)

    marg_u = marg_std = None
    if needs_rev:
        conds = Conditional(
            jnp.transpose(emits[3], (3, 0, 1, 2)),
            Normal(
                jnp.transpose(emits[4], (3, 0, 1, 2)),
                jnp.transpose(emits[5], (3, 0, 1, 2)),
            ),
        )

        def marginals_one(rv_t1_one, cond_t1_one, conds_one, valid_one):
            # carry = smoothing marginal at the latest not-yet-emitted valid
            # slot; cond_e maps x(t1) -> x(last valid slot)
            carry0 = ssm.marginalize(rv_t1_one, cond_t1_one)

            def back(carry, inp):
                cond_k, val_k = inp
                out = carry  # marginal AT slot k (valid slots only)
                nxt = ssm.marginalize(carry, cond_k)
                carry2 = _tree_select(val_k, nxt, carry)
                return carry2, out

            carry_end, margs_rev = jax.lax.scan(
                back, carry0, (conds_one, valid_one), reverse=True
            )
            # carry_end = marginal at slot 0 (the initial condition)
            mean = jnp.concatenate([carry_end.mean[None], margs_rev.mean])
            chol = jnp.concatenate(
                [carry_end.cholesky[None], margs_rev.cholesky]
            )
            return Normal(mean, chol)

        with jax.default_matmul_precision("float32"):
            margs = jax.vmap(marginals_one)(rv_e, cond_e, conds, valid)
        marg_u = jax.vmap(jax.vmap(ssm.qoi))(margs.mean)
        marg_std = jax.vmap(jax.vmap(ssm.qoi_std))(margs)

    sl = slice(0, b)
    return EveryStepSolution(
        t=t_all[sl],
        u=u_all[sl],
        u_std=u_std_all[sl],
        valid=valid_all[sl],
        num_steps=gen2.num_steps[sl],
        u_t1=u_t1[sl],
        u_std_t1=u_std_t1[sl],
        marginal_u=None if marg_u is None else marg_u[sl],
        marginal_u_std=None if marg_std is None else marg_std[sl],
    )
