"""Fused batched solver: equivalence against the generic vmapped path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import batched, parallel, problems


def _inputs(batch=8, dtype=jnp.float64):
    vf, (u0,), tspan, params = problems.rigid_body()
    u0 = u0.astype(dtype)
    save_at = jnp.linspace(*tspan, num=5, dtype=dtype)
    key = jax.random.PRNGKey(0)
    u0s = u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3), dtype))
    tols = jnp.tile(jnp.asarray([1e-4, 1e-6], dtype), batch // 2)
    return vf, params, save_at, u0s, tols


@pytest.mark.parametrize("strategy", ["fixedpoint", "filter"])
def test_xla_engine_matches_generic_vmapped_solver(strategy):
    vf, params, save_at, u0s, tols = _inputs()
    u_s, u_f, nsteps = jax.jit(
        lambda: batched.solve_save_at_batched(
            vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
            strategy=strategy, engine="xla",
        )
    )()
    assert np.all(np.isfinite(np.asarray(u_s)))

    solve_generic = parallel.build_batched_solve(
        "ts0-4", vf, u0s[0], save_at, dt0=0.1
    )
    u_ref, steps_ref = solve_generic((u0s,), params, tols)
    if strategy == "fixedpoint":
        np.testing.assert_allclose(
            np.asarray(u_s), np.asarray(u_ref), rtol=1e-7, atol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(nsteps[:, -1]), np.asarray(steps_ref), rtol=0.05
    )


@pytest.mark.slow
def test_residual_error_unit_overresolves_and_agrees():
    # fused-kernel mirror of tests/test_error_units.py: the residual unit
    # (exp-3 protocol; the stiff-TS1 safeguard) must take more steps than
    # the qoi unit and land on the same trajectory
    vf, params, save_at, u0s, _ = _inputs()
    tols = jnp.full((u0s.shape[0],), 1e-5, jnp.float64)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols, engine="xla")
    u_q, _, n_q = batched.solve_save_at_batched(
        vf, u0s, params, error_unit="qoi", **kw)
    u_r, _, n_r = batched.solve_save_at_batched(
        vf, u0s, params, error_unit="residual", **kw)
    assert np.all(np.asarray(n_r[:, -1]) > np.asarray(n_q[:, -1]))
    np.testing.assert_allclose(np.asarray(u_q), np.asarray(u_r),
                               rtol=1e-3, atol=1e-6)


def _inputs_order2(batch=8, dtype=jnp.float64, tspan_frac=0.3):
    """Three-body restricted (2nd-order) ensemble around the Arenstorf orbit
    (the reference's exp-5 workload, measure.py:159-176); a fraction of the
    orbit keeps the CPU test quick."""
    vf, (u0, du0), tspan = problems.three_body_restricted()
    t1 = tspan[0] + tspan_frac * (tspan[1] - tspan[0])
    save_at = jnp.linspace(tspan[0], t1, num=4, dtype=dtype)
    key = jax.random.PRNGKey(1)
    noise = 1e-3 * jax.random.normal(key, (2, batch, 2), dtype)
    u0s = u0.astype(dtype)[None] * (1.0 + noise[0])
    du0s = du0.astype(dtype)[None] * (1.0 + noise[1])
    tols = jnp.full((batch,), 1e-6, dtype)
    return vf, save_at, (u0s, du0s), tols


def test_order2_xla_engine_matches_generic_vmapped_solver():
    vf, save_at, u0s, tols = _inputs_order2()
    u_s, _u_f, nsteps = jax.jit(
        lambda: batched.solve_save_at_batched(
            vf, u0s, (), save_at=save_at, dt0=0.01, tols=tols,
            engine="xla", ode_order=2,
        )
    )()
    assert np.all(np.isfinite(np.asarray(u_s)))

    solve_generic = parallel.build_batched_solve(
        "ts0-4", vf, u0s[0][0], save_at, dt0=0.01, ode_order=2
    )
    u_ref, steps_ref = solve_generic(u0s, (), tols)
    # errn is algebraically identical but not bitwise (reduction order), so a
    # knife-edge accept decision can flip between the stacks; on this
    # quasi-chaotic 2nd-order problem one flipped step compounds to ~0.5%
    # trajectory divergence.  The loose bound here asserts "same algorithm,
    # possibly different knife-edge decisions"; bitwise engine equivalence is
    # asserted by the interpret-mode pallas-vs-xla tests, and solution
    # CORRECTNESS by the closed-form/scipy oracles elsewhere.
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_ref), rtol=2e-2, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(nsteps[:, -1]), np.asarray(steps_ref), rtol=0.05
    )


@pytest.mark.slow  # order-1 interpret gate remains fast; order-2 xla gate too
def test_order2_pallas_interpret_matches_xla_engine():
    vf, save_at, u0s, tols = _inputs_order2(dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.01, tols=tols, ode_order=2)
    u_x, _, n_x = batched.solve_save_at_batched(vf, u0s, (), engine="xla", **kw)
    u_p, _, n_p = batched.solve_save_at_batched(
        vf, u0s, (), engine="pallas", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


def test_hbm_guard_estimate_is_monotone_and_guard_raises():
    # monotone in batch, dim, and checkpoint count
    kw = dict(num_derivatives=4, num_save_at=200, dtype=jnp.float64)
    e1 = batched.estimate_solve_bytes(256, 64, **kw)
    e2 = batched.estimate_solve_bytes(1024, 64, **kw)
    e3 = batched.estimate_solve_bytes(1024, 128, **kw)
    assert e1 < e2 < e3

    # the round-1 crash config (f64, batch 1024, d=64, 200 save_at) must trip
    # a 16 GB v5e-like budget check... scaled: assert it raises on a budget
    # smaller than its own estimate, with an actionable message
    with pytest.raises(MemoryError, match="Reduce the batch"):
        batched.check_hbm_budget(1024, 64, budget=e2 - 1, **kw)
    batched.check_hbm_budget(1024, 64, budget=e2 + 1, **kw)  # fits: no raise
    batched.check_hbm_budget(1024, 64, budget=None, **kw)  # disabled

    # end-to-end: the solve itself refuses before tracing any compute
    vf, params, save_at, u0s, tols = _inputs(batch=8, dtype=jnp.float32)
    with pytest.raises(MemoryError):
        batched.solve_save_at_batched(
            vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
            engine="xla", hbm_budget=1024,
        )


def test_pallas_interpret_matches_xla_engine():
    vf, params, save_at, u0s, tols = _inputs(dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols)
    u_x, _, n_x = batched.solve_save_at_batched(
        vf, u0s, params, engine="xla", **kw
    )
    u_p, _, n_p = batched.solve_save_at_batched(
        vf, u0s, params, engine="pallas", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


def test_bucketed_solve_matches_unbucketed_and_cuts_padded_iterations():
    """Mixed-tolerance bucketing (round-1 ROADMAP 2): identical per-lane
    results, strictly fewer padded while-iterations than one big batch."""
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 20.0))
    save_at = jnp.linspace(0.0, 20.0, num=4)
    batch = 16
    key = jax.random.PRNGKey(2)
    u0s = u0[None] * (1.0 + 0.02 * jax.random.normal(key, (batch, 3)))
    # four step-count classes, interleaved (worst case for unbucketed padding)
    tols = jnp.tile(jnp.asarray([1e-2, 1e-4, 1e-6, 1e-8]), batch // 4)

    kw = dict(save_at=save_at, dt0=0.1, engine="xla")
    u_ref, _uf, steps_ref = jax.jit(
        lambda u, t: batched.solve_save_at_batched(vf, u, params, tols=t, **kw)
    )(u0s, tols)
    (u_b, _uf_b, steps_b), bucket_max = batched.solve_save_at_bucketed(
        vf, u0s, params, tols=tols, num_buckets=4, **kw
    )
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_ref), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(steps_b), np.asarray(steps_ref))

    # padded-iteration proxy: sum_b |bucket| * max_steps(bucket) vs
    # B * max_steps(all) -- the deterministic stand-in for wall time
    per_bucket = sum((batch // 4) * m for m in bucket_max)
    unbucketed = batch * int(jnp.max(steps_ref[:, -1]))
    assert per_bucket < 0.6 * unbucketed, (bucket_max, unbucketed)


def test_ts1_fused_matches_generic_dense_on_vdp():
    """Fused TS1 (d=1, the stiff VdP configuration): equivalence against the
    generic dense-backend TS1 solver, moderately stiff mu=10."""
    from odecheckpts_tpu import ivpsolve, ivpsolvers, taylor

    mu = 10.0
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=mu)
    save_at = jnp.linspace(0.0, 2.0, num=4)
    batch = 8
    key = jax.random.PRNGKey(4)
    noise = 1e-2 * jax.random.normal(key, (batch, 1), jnp.float64)
    u0s = u0[None] * (1.0 + noise)
    du0s = jnp.broadcast_to(du0[None], (batch, 1)) + 0.1 * noise
    tols = jnp.full((batch,), 1e-7, jnp.float64)

    u_s, _uf, nsteps = jax.jit(
        lambda u, t: batched.solve_save_at_batched(
            vf, u, (), save_at=save_at, dt0=0.01, tols=t, engine="xla",
            ode_order=2, correction="ts1", strategy="filter",
        )
    )((u0s, du0s), tols)
    assert np.all(np.isfinite(np.asarray(u_s)))

    # generic oracle: dense TS1 filter, solved per lane
    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)

    def solve_one(u0_one, du0_one, tol):
        tcoeffs = taylor.odejet_padded_scan(
            lambda *y: vf(*y, t=0.0), (u0_one, du0_one), num=nu - 1
        )
        init = solver.initial_condition(tcoeffs, 1.0)
        asolver = ivpsolve.adaptive(solver, atol=1e-3 * tol, rtol=tol)
        sol = ivpsolve.solve_adaptive_save_at(
            vf, init, save_at=save_at, dt0=0.01, adaptive_solver=asolver
        )
        return sol.u, sol.num_steps[-1]

    u_ref, steps_ref = jax.vmap(solve_one)(u0s, du0s, tols)
    np.testing.assert_allclose(
        np.asarray(_uf), np.asarray(u_ref), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(nsteps[:, -1], float), np.asarray(steps_ref, float),
        rtol=0.05,
    )


def test_ts1_layer_responsibility():
    """The isotropic lanes-last STEP builder still owns only d=1 TS1; the
    driver routes d>1 TS1 to the dense engine (round 3) instead of raising
    (dispatch correctness is asserted in tests/test_batched_dense.py)."""
    with pytest.raises(NotImplementedError, match="d=1"):
        batched.make_step_ll(
            lambda args, t: args[0], nu=4, d=3, correction="ts1"
        )


def test_ts1_fused_pallas_interpret_matches_xla():
    """The jvp-derived per-lane Jacobians trace into pure VPU ops: the TS1
    kernel must lower through the Pallas machinery unchanged."""
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=10.0)
    save_at = jnp.linspace(0.0, 2.0, num=3, dtype=jnp.float32)
    batch = 8
    u0s = (
        jnp.broadcast_to(u0.astype(jnp.float32)[None], (batch, 1)),
        jnp.broadcast_to(du0.astype(jnp.float32)[None], (batch, 1)),
    )
    tols = jnp.full((batch,), 1e-4, jnp.float32)
    kw = dict(save_at=save_at, dt0=0.01, tols=tols, ode_order=2,
              correction="ts1")
    u_x, _, n_x = batched.solve_save_at_batched(vf, u0s, (), engine="xla", **kw)
    u_p, _, n_p = batched.solve_save_at_batched(
        vf, u0s, (), engine="pallas", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


@pytest.mark.slow
def test_attempt_cap_bounds_the_while_loop():
    """The chip-hang guard: with a tiny cap the solve returns (truncated)
    instead of iterating forever; with the default cap results are
    unchanged."""
    vf, params, save_at, u0s, tols = _inputs(batch=8, dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols, engine="xla")
    u_full, _, n_full = batched.solve_save_at_batched(vf, u0s, params, **kw)
    u_cap, _, n_cap = batched.solve_save_at_batched(
        vf, u0s, params, max_attempts=10, **kw
    )
    assert int(np.max(np.asarray(n_cap))) <= 4 * 10  # 4 intervals x cap
    assert int(np.max(np.asarray(n_full))) > 4 * 10
    u_default, _, _ = batched.solve_save_at_batched(
        vf, u0s, params, max_attempts=100_000, **kw
    )
    np.testing.assert_array_equal(np.asarray(u_default), np.asarray(u_full))


def test_bucketed_solve_pads_non_divisible_batches():
    """Runtime tolerance mixes rarely split evenly (the routed driver's f32
    band is data-dependent): padding with the loosest lane must keep per-lane
    results identical to the unbucketed solve."""
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 20.0))
    save_at = jnp.linspace(0.0, 20.0, num=4)
    b = 14  # not divisible by 4
    key = jax.random.PRNGKey(2)
    u0s = u0[None] * (1.0 + 0.02 * jax.random.normal(key, (b, 3)))
    tols = jnp.asarray(np.geomspace(1e-2, 1e-6, b))
    kw = dict(save_at=save_at, dt0=0.1, engine="xla")
    u_ref, _uf, n_ref = jax.jit(
        lambda u, t: batched.solve_save_at_batched(vf, u, params, tols=t, **kw)
    )(u0s, tols)
    (u_b, _ufb, n_b), _bm = batched.solve_save_at_bucketed(
        vf, u0s, params, tols=tols, num_buckets=4, **kw
    )
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_ref), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(n_b), np.asarray(n_ref))


def test_bucketed_pad_and_ts1_tuple_state_compose():
    """pad + bucket + TS1 together (round-2 review gap): a non-divisible
    mixed-tolerance VdP ensemble with TUPLE state (ode_order=2) must route
    through the bucketed driver's pad/replicate/scatter logic (the tuple
    branch of ``rep``/``take``) and the TS1 dense dispatch, and reproduce
    the unbucketed per-lane results exactly."""
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=10.0)
    save_at = jnp.linspace(0.0, 2.0, num=3)
    b = 6  # not divisible by num_buckets=4 -> pad 2
    key = jax.random.PRNGKey(7)
    noise = 1e-2 * jax.random.normal(key, (b, 1), jnp.float64)
    u0s = (u0[None] * (1.0 + noise), jnp.broadcast_to(du0[None], (b, 1)))
    tols = jnp.asarray(np.geomspace(1e-3, 1e-7, b))
    kw = dict(save_at=save_at, dt0=0.01, engine="xla", ode_order=2,
              correction="ts1", strategy="filter")
    u_ref, _uf, n_ref = jax.jit(
        lambda u, t: batched.solve_save_at_batched(vf, u, (), tols=t, **kw)
    )(u0s, tols)
    (u_b, _ufb, n_b), _bm = batched.solve_save_at_bucketed(
        vf, u0s, (), tols=tols, num_buckets=4, **kw
    )
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_ref), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(n_b), np.asarray(n_ref))


def test_bucketed_pad_ts1_together():
    """Pad + bucket + TS1 in one driver call: a non-divisible stiff-VdP
    ensemble (ode_order=2, the reference's vdp.py:61-66 solver class) with
    interleaved tolerances must reproduce the unbucketed per-lane results
    exactly through the host-side sort/pad/reorder round trip."""
    vf, (u0, du0), _tspan = problems.van_der_pol(mu=10.0)
    save_at = jnp.linspace(0.0, 2.0, num=3)
    b = 10  # not divisible by num_buckets=4 -> 2 pad lanes
    key = jax.random.PRNGKey(7)
    noise = 1e-2 * jax.random.normal(key, (b, 1), jnp.float64)
    u0s = u0[None] * (1.0 + noise)
    du0s = jnp.broadcast_to(du0[None], (b, 1)) + 0.1 * noise
    # interleaved tolerance classes (worst case for the stable argsort)
    tols = jnp.asarray([1e-4, 1e-7, 1e-5, 1e-6, 1e-4, 1e-7, 1e-5, 1e-6,
                        1e-4, 1e-7])
    kw = dict(save_at=save_at, dt0=0.01, engine="xla", ode_order=2,
              correction="ts1", strategy="filter")
    u_ref, _uf, n_ref = jax.jit(
        lambda u, t: batched.solve_save_at_batched(
            vf, u, (), tols=t, **kw
        )
    )((u0s, du0s), tols)
    (u_b, _ufb, n_b), _bm = batched.solve_save_at_bucketed(
        vf, (u0s, du0s), (), tols=tols, num_buckets=4, **kw
    )
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_ref), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(n_b), np.asarray(n_ref))


def test_pallas_loop_interpret_matches_xla_engine():
    """engine="pallas-loop" (whole accept/reject loop inside the kernel):
    bit-identical step sequences to the per-attempt engines -- lanes at the
    checkpoint are frozen, so per-tile early exit cannot change results."""
    vf, params, save_at, u0s, tols = _inputs(dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols)
    u_x, _, n_x = batched.solve_save_at_batched(
        vf, u0s, params, engine="xla", **kw
    )
    u_p, _, n_p = batched.solve_save_at_batched(
        vf, u0s, params, engine="pallas-loop", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


@pytest.mark.parametrize(
    "nu", [3, pytest.param(5, marks=pytest.mark.slow)]  # nu=5: 79s (r5)
)
def test_nondefault_order_matches_generic(nu):
    """Orders other than nu=4 (the per-tolerance order schedule in bench.py
    and order_sweep.py): the fused engine must equal the generic stack at
    the same order, and the pallas-loop kernel must lower/step identically
    in interpret mode."""
    vf, params, save_at, u0s, tols = _inputs()
    u_s, _uf, nsteps = jax.jit(
        lambda: batched.solve_save_at_batched(
            vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
            num_derivatives=nu, engine="xla",
        )
    )()
    assert np.all(np.isfinite(np.asarray(u_s)))

    solve_generic = parallel.build_batched_solve(
        f"ts0-{nu}", vf, u0s[0], save_at, dt0=0.1
    )
    u_ref, steps_ref = solve_generic((u0s,), params, tols)
    # knife-edge accept/reject divergence between the two drivers grows a
    # few ULP-level step differences into ~1e-7 trajectory deltas
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_ref), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(nsteps[:, -1]), np.asarray(steps_ref), rtol=0.10
    )

    u32, n32_kw = u0s.astype(jnp.float32), tols.astype(jnp.float32)
    sa32 = save_at.astype(jnp.float32)
    u_x, _, n_x = batched.solve_save_at_batched(
        vf, u32, params, save_at=sa32, dt0=0.1, tols=n32_kw,
        num_derivatives=nu, engine="xla",
    )
    u_p, _, n_p = batched.solve_save_at_batched(
        vf, u32, params, save_at=sa32, dt0=0.1, tols=n32_kw,
        num_derivatives=nu, engine="pallas-loop", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
