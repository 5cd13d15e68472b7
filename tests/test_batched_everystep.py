"""Fused save-every-step driver (batched_everystep) vs the generic bounded
driver.

The oracle is ``ivpsolve.solve_adaptive_save_every_step_bounded`` run per
lane: identical controller semantics, so step sequences and slot masks must
match exactly; the masked backward pass must reproduce the compacted
generic smoothing-marginal chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import (
    batched_everystep,
    ivpsolve,
    ivpsolvers,
    problems,
    taylor,
)


def _ensemble(batch=4, dtype=jnp.float64):
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 8.0))
    key = jax.random.PRNGKey(3)
    u0s = jnp.asarray(
        u0[None] * (1.0 + 0.04 * jax.random.normal(key, (batch, 3))), dtype
    )
    tols = jnp.asarray([1e-4, 1e-6, 1e-5, 1e-4], dtype)[:batch]
    return vf, params, tspan, u0s, tols


def _generic_bounded(vf, params, tspan, u0_one, tol, *, strategy, max_steps):
    nu = 4
    ssm = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = {
        "filter": ivpsolvers.strategy_filter,
        "smoother": ivpsolvers.strategy_smoother,
    }[strategy](ssm, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)

    def vf_p(*ys, t):
        return vf(*ys, t=t, p=params)

    tco = taylor.odejet_padded_scan(
        lambda *y: vf_p(*y, t=tspan[0]), (u0_one,), num=nu
    )
    init = solver.initial_condition(tco, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-3 * tol, rtol=tol)
    sol, (valid, (rv_e, cond_e)) = ivpsolve.solve_adaptive_save_every_step_bounded(
        vf_p, init, t0=tspan[0], t1=tspan[1], dt0=0.1,
        adaptive_solver=asolver, max_steps=max_steps,
    )
    return ssm, sol, valid, rv_e, cond_e


def test_everystep_filter_matches_generic_bounded():
    vf, params, tspan, u0s, tols = _ensemble()
    max_steps = 512
    out = batched_everystep.solve_every_step_batched(
        vf, u0s, params, t0=tspan[0], t1=tspan[1], dt0=0.1, tols=tols,
        max_steps=max_steps, strategy="filter", engine="xla", lanes=4,
    )
    for lane in range(u0s.shape[0]):
        ssm, sol, valid, rv_e, _ = _generic_bounded(
            vf, params, tspan, u0s[lane], float(tols[lane]),
            strategy="filter", max_steps=max_steps,
        )
        v_g = np.asarray(valid)
        v_f = np.asarray(out.valid[lane])
        # generic `valid` counts the t1-overshoot slot as <= t1; the fused
        # driver reports the t1 point separately -- compare interior slots
        interior = np.asarray(sol.t) < tspan[1]
        np.testing.assert_array_equal(v_f & interior, v_g & interior)
        idx = np.flatnonzero(v_f & interior)
        np.testing.assert_allclose(
            np.asarray(out.t[lane])[idx], np.asarray(sol.t)[idx], rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(out.u[lane])[idx], np.asarray(sol.u)[idx],
            rtol=1e-5, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(out.u_t1[lane]), np.asarray(ssm.qoi(rv_e.mean)),
            rtol=1e-5, atol=1e-8,
        )
    assert out.marginal_u is None


def test_everystep_smoother_matches_generic_marginal_chain():
    vf, params, tspan, u0s, tols = _ensemble()
    max_steps = 512
    out = batched_everystep.solve_every_step_batched(
        vf, u0s, params, t0=tspan[0], t1=tspan[1], dt0=0.1, tols=tols,
        max_steps=max_steps, strategy="smoother", engine="xla", lanes=4,
    )
    for lane in range(u0s.shape[0]):
        ssm, sol, valid, rv_e, cond_e = _generic_bounded(
            vf, params, tspan, u0s[lane], float(tols[lane]),
            strategy="smoother", max_steps=max_steps,
        )
        interior = np.asarray(sol.t) < tspan[1]
        v = np.asarray(valid) & interior
        comp = ivpsolve.compact_bounded_solution(
            sol, jnp.asarray(v)
        )
        # oracle marginal chain: terminal at t1 backward through the
        # compacted conditionals (slot 0 carries the identity)
        conds_c = comp.posterior.conditional
        k_last = int(np.sum(v)) - 1
        marg = ssm.marginalize(rv_e, cond_e)
        oracle = [None] * (k_last + 1)
        for k in range(k_last, -1, -1):
            oracle[k] = marg
            cond_k = jax.tree.map(lambda x: x[k], conds_c)
            marg = ssm.marginalize(marg, cond_k)
        oracle_u = np.stack([np.asarray(ssm.qoi(m.mean)) for m in oracle])

        idx = np.flatnonzero(np.asarray(out.valid[lane])
                             & (np.asarray(out.t[lane]) < tspan[1]))
        np.testing.assert_allclose(
            np.asarray(out.t[lane])[idx], np.asarray(comp.t), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(out.marginal_u[lane])[idx], oracle_u,
            rtol=1e-4, atol=1e-7,
        )
        # smoothed means must differ from filtered ones somewhere (the
        # backward pass actually did something); the shift is at the local
        # error scale, so compare against exact-zero, not allclose defaults
        diff = np.max(
            np.abs(
                np.asarray(out.marginal_u[lane])[idx]
                - np.asarray(out.u[lane])[idx]
            )
        )
        assert diff > 1e-12, diff
        np.testing.assert_allclose(
            np.asarray(out.u_t1[lane]), np.asarray(ssm.qoi(rv_e.mean)),
            rtol=1e-5, atol=1e-8,
        )


@pytest.mark.slow  # interpret gate representative stays in test_batched
def test_everystep_pallas_interpret_matches_xla():
    vf, params, tspan, u0s, tols = _ensemble(dtype=jnp.float32)
    kw = dict(
        t0=tspan[0], t1=tspan[1], dt0=0.1, tols=tols, max_steps=256,
        strategy="smoother", lanes=4,
    )
    out_x = batched_everystep.solve_every_step_batched(
        vf, u0s, params, engine="xla", **kw
    )
    out_p = batched_everystep.solve_every_step_batched(
        vf, u0s, params, engine="pallas", interpret=True, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(out_p.valid), np.asarray(out_x.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out_p.u), np.asarray(out_x.u), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_p.marginal_u), np.asarray(out_x.marginal_u),
        rtol=5e-4, atol=1e-5,
    )


def test_everystep_rejects_bad_options():
    vf, params, tspan, u0s, tols = _ensemble()
    kw = dict(
        t0=tspan[0], t1=tspan[1], dt0=0.1, tols=tols, max_steps=32, lanes=4
    )
    for bad in (
        dict(strategy="fixedpoint"),
        dict(engine="pallas-loop"),
    ):
        try:
            batched_everystep.solve_every_step_batched(
                vf, u0s, params, **{**kw, **bad}
            )
            raise AssertionError(f"expected ValueError for {bad}")
        except ValueError:
            pass
