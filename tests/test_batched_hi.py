"""df32 high-precision fused engine: accuracy, engine equivalence, oracle.

The deliverable this engine exists for is the tight band of the reference's
work-precision protocol (rtol 1e-6..1e-9,
/root/reference/experiments/2_workprec_simple/run_simple.py:150-156) without
64-bit types: these tests gate RMSE/rtol against scipy LSODA truth at
rtol 1e-9 in f32 pairs, bit-equality of the Pallas and XLA engines, and
agreement of the f32-pair run with the f64-pair (double-double) oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate

from odecheckpts_tpu import batched_hi, problems


def _setup(batch=8, tspan=(0.0, 50.0), num_save=5):
    vf, (u0,), _, params = problems.rigid_body(time_span=tspan)
    save_at = np.linspace(tspan[0], tspan[1], num_save)
    key = jax.random.PRNGKey(0)
    noise = 0.05 * jax.random.normal(key, (batch, 3), jnp.float32)
    u0s = jnp.asarray(
        np.asarray(u0, np.float64)[None] * (1.0 + np.asarray(noise, np.float64)),
        jnp.float32,
    )
    return vf, params, save_at, u0s


def _truth(u0_rows, save_at):
    p1, p2, p3 = -2.0, 1.25, -0.5

    def f(_t, y):
        return [p1 * y[1] * y[2], p2 * y[0] * y[2], p3 * y[0] * y[1]]

    outs = []
    for r in u0_rows:
        s = scipy.integrate.solve_ivp(
            f, y0=r, t_span=(save_at[0], save_at[-1]), t_eval=save_at,
            rtol=1e-12, atol=1e-12, method="LSODA",
        )
        outs.append(s.y.T)
    return np.stack(outs)


@pytest.mark.parametrize("rtol", [1e-6, 1e-9])
@pytest.mark.parametrize("strategy", ["fixedpoint", "filter"])
def test_f32_pairs_meet_accuracy_gate_at_tight_tolerance(rtol, strategy):
    """f32 pairs must deliver what previously needed f64: RMSE < 10*rtol
    down to 1e-9 (the bench gate, cf. bench.py RMSE_BOUND_FACTOR)."""
    vf, params, save_at, u0s = _setup()
    solve = batched_hi.make_hi_solver(
        vf, params, save_at=save_at, dt0=0.1,
        vf_df=problems.rigid_body_df(params), engine="xla", lanes=8,
        strategy=strategy,
    )
    us, uf, nsteps = solve(u0s, np.full((8,), rtol, np.float32))
    u = batched_hi.combine64(us)
    truth = _truth(np.asarray(u0s, np.float64), save_at)
    rmse = float(np.sqrt(np.mean((u - truth) ** 2)))
    assert rmse < 10.0 * rtol, (rmse, rtol)
    # plain f32 cannot reach 1e-8 at all: the gate is meaningful
    assert np.all(np.asarray(nsteps)[:, -1] > 100)


def test_pallas_interpret_is_bit_identical_to_xla():
    vf, params, save_at, u0s = _setup()
    tols = np.full((8,), 1e-7, np.float32)
    kw = dict(
        save_at=save_at, dt0=0.1, vf_df=problems.rigid_body_df(params), lanes=8
    )
    sx = batched_hi.make_hi_solver(vf, params, engine="xla", **kw)
    sp = batched_hi.make_hi_solver(vf, params, engine="pallas", interpret=True, **kw)
    (us_x, uf_x, n_x) = sx(u0s, tols)
    (us_p, uf_p, n_p) = sp(u0s, tols)
    for a, b in [(us_x[0], us_p[0]), (us_x[1], us_p[1]),
                 (uf_x[0], uf_p[0]), (uf_x[1], uf_p[1]), (n_x, n_p)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f64_pair_oracle_agrees():
    """The identical algorithm on f64 pairs (double-double) is the rounding
    oracle: the f32-pair solution must sit within a few rtol of it (step
    sequences may differ at accept boundaries; accuracy may not)."""
    rtol = 1e-8
    vf, params, save_at, u0s = _setup()
    tols = np.full((8,), rtol, np.float32)
    kw = dict(save_at=save_at, dt0=0.1, engine="xla", lanes=8)
    s32 = batched_hi.make_hi_solver(
        vf, params, vf_df=problems.rigid_body_df(params), **kw
    )
    s64 = batched_hi.make_hi_solver(vf, params, dtype=jnp.float64, **kw)
    u32 = batched_hi.combine64(s32(u0s, tols)[0])
    u64 = batched_hi.combine64(s64(u0s, tols)[0])
    assert float(np.max(np.abs(u32 - u64))) < 20.0 * rtol


def test_smoother_improves_on_filter_and_filter_output_matches():
    """Increment-form fixedpoint smoothing: u_s differs from u_f in the
    interior (it uses future data), coincides at the final checkpoint."""
    vf, params, save_at, u0s = _setup()
    tols = np.full((8,), 1e-6, np.float32)
    solve = batched_hi.make_hi_solver(
        vf, params, save_at=save_at, dt0=0.1,
        vf_df=problems.rigid_body_df(params), engine="xla", lanes=8,
    )
    us, uf, _ = solve(u0s, tols)
    u_s, u_f = batched_hi.combine64(us), batched_hi.combine64(uf)
    np.testing.assert_allclose(u_s[:, -1], u_f[:, -1], rtol=0, atol=1e-12)
    np.testing.assert_allclose(u_s[:, 0], u_f[:, 0], rtol=0, atol=1e-12)
    assert float(np.max(np.abs(u_s[:, 1:-1] - u_f[:, 1:-1]))) > 1e-9

    truth = _truth(np.asarray(u0s, np.float64), save_at)
    rmse_s = np.sqrt(np.mean((u_s - truth) ** 2))
    rmse_f = np.sqrt(np.mean((u_f - truth) ** 2))
    assert rmse_s <= 2.0 * rmse_f  # smoother is not worse (usually better)


def test_plain_vf_fallback_is_good_to_1em7():
    """wrap_vf_plain evaluates f on the hi channel only; documented floor
    ~rtol 1e-7 (f32 evaluation noise enters through the correction gain)."""
    rtol = 1e-7
    vf, params, save_at, u0s = _setup()
    solve = batched_hi.make_hi_solver(
        vf, params, save_at=save_at, dt0=0.1, engine="xla", lanes=8
    )
    us, _, _ = solve(u0s, np.full((8,), rtol, np.float32))
    truth = _truth(np.asarray(u0s, np.float64), save_at)
    rmse = float(np.sqrt(np.mean((batched_hi.combine64(us) - truth) ** 2)))
    assert rmse < 10.0 * rtol


def test_mixed_tolerances_in_one_batch():
    """Lanes are mask-isolated: a mixed 1e-4..1e-9 batch gives each lane its
    own step count and per-lane accuracy."""
    vf, params, save_at, u0s = _setup()
    tols = np.tile(np.asarray([1e-4, 1e-9], np.float32), 4)
    solve = batched_hi.make_hi_solver(
        vf, params, save_at=save_at, dt0=0.1,
        vf_df=problems.rigid_body_df(params), engine="xla", lanes=8,
    )
    us, _, nsteps = solve(u0s, tols)
    u = batched_hi.combine64(us)
    truth = _truth(np.asarray(u0s, np.float64), save_at)
    err = np.sqrt(np.mean((u - truth) ** 2, axis=(1, 2)))
    n_final = np.asarray(nsteps)[:, -1]
    assert np.all(err[1::2] < 10 * 1e-9)  # tight lanes: tight accuracy
    assert np.all(n_final[1::2] > 3 * n_final[0::2])  # and many more steps


@pytest.mark.slow
def test_routed_solver_meets_per_lane_accuracy_across_nine_decades():
    """Precision routing: one mixed rtol 1e-1..1e-9 ensemble, every lane
    within 10x its own tolerance (f32 lanes via bucketing, df32 below the
    split -- the production mixed-workload driver)."""
    vf, params, save_at, _ = _setup()
    rtols = np.asarray([1e-1, 1e-3, 1e-5, 1e-6, 1e-7, 1e-8, 1e-9, 1e-2],
                       np.float32)
    batch = rtols.size
    key = jax.random.PRNGKey(3)
    noise = 0.05 * jax.random.normal(key, (batch, 3), jnp.float32)
    u0 = jnp.asarray([1.0, 0.0, 0.9])
    u0s = jnp.asarray(
        np.asarray(u0, np.float64)[None] * (1.0 + np.asarray(noise, np.float64)),
        jnp.float32,
    )
    solve = batched_hi.make_routed_solver(
        vf, params, save_at=save_at, dt0=0.1,
        vf_df=problems.rigid_body_df(params), engine="xla", lanes=2,
        num_buckets_f32=2,
    )
    u64, nsteps = solve(u0s, rtols)
    truth = _truth(np.asarray(u0s, np.float64), save_at)
    err = np.sqrt(np.mean((u64 - truth) ** 2, axis=(1, 2)))
    # eps32 floor applies to the f32 lanes; tolerance gate to every lane
    gate = 10.0 * np.maximum(rtols.astype(np.float64), 3e-7)
    assert np.all(err < gate), list(zip(rtols, err))
    # tight lanes took many more steps than loose ones
    assert nsteps[6, -1] > 5 * nsteps[0, -1]


def test_ts1_hi_engine_on_stiff_vdp():
    """TS1 in the df32 engine: stiff VdP mu=1e3 stays finite and tracks
    LSODA truth at loose checkpoints away from the relaxation jumps.  The
    plain-f32 engine cannot solve this regime: the required dt ~ 1/mu sits
    below the f32 stall floor 4*eps32*t, which force-accepts garbage; the
    compensated time axis lowers that floor to ~2^-45 |t|."""
    mu = 1000.0
    vf, (u0, du0), _ = problems.van_der_pol(mu=mu)
    save_at = np.asarray([0.0, 0.5, 1.0])  # before the first jump (t~0.8..3)
    batch = 4
    u0s = (jnp.full((batch, 1), 2.0, jnp.float32),
           jnp.zeros((batch, 1), jnp.float32))
    solve = batched_hi.make_hi_solver(
        vf, (), save_at=save_at, dt0=0.01, engine="xla", lanes=4,
        ode_order=2, correction="ts1", strategy="filter",
    )
    us, _uf, n = solve(u0s, np.full((batch,), 1e-3, np.float32))
    u = batched_hi.combine64(us)[:, :, 0]
    assert np.all(np.isfinite(u))

    def f(_t, y):
        return [y[1], mu * ((1 - y[0] ** 2) * y[1] - y[0])]

    ref = scipy.integrate.solve_ivp(
        f, y0=[2.0, 0.0], t_span=(0.0, 1.0), t_eval=save_at,
        rtol=1e-10, atol=1e-10, method="LSODA",
    ).y[0]
    assert np.max(np.abs(u - ref[None, :])) < 1e-2, (u[0], ref)


def test_ts1_hi_engine_matches_generic_dense_mu10():
    """Non-chaotic regime (mu=10): hi-TS1 filter means equal the generic
    dense-TS1 solver."""
    from odecheckpts_tpu import ivpsolve, ivpsolvers, taylor

    mu = 10.0
    vf, (u0, du0), _ = problems.van_der_pol(mu=mu)
    save_at = np.linspace(0.0, 2.0, 4)
    batch = 4
    u0s32 = (jnp.full((batch, 1), 2.0, jnp.float32),
             jnp.zeros((batch, 1), jnp.float32))
    tol = 1e-6
    solve = batched_hi.make_hi_solver(
        vf, (), save_at=save_at, dt0=0.01, engine="xla", lanes=4,
        ode_order=2, correction="ts1", strategy="filter",
    )
    us, uf, n = solve(u0s32, np.full((batch,), tol, np.float32))
    u = batched_hi.combine64(uf)[:, :, 0]

    nu = 4
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(1,), implementation="dense"
    )
    strat = ivpsolvers.strategy_filter(
        prior, ivpsolvers.correction_ts1(ode_order=2)
    )
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(
        lambda *y: vf(*y, t=0.0), (jnp.asarray([2.0]), jnp.asarray([0.0])),
        num=nu - 1,
    )
    init = solver.initial_condition(tcoeffs, 1.0)
    asolver = ivpsolve.adaptive(solver, atol=1e-3 * tol, rtol=tol)
    sol = ivpsolve.solve_adaptive_save_at(
        vf, init, save_at=jnp.asarray(save_at), dt0=0.01,
        adaptive_solver=asolver,
    )
    np.testing.assert_allclose(u[0], np.asarray(sol.u)[:, 0], rtol=1e-4,
                               atol=1e-6)


def test_hi_pallas_loop_interpret_matches_xla_engine():
    """df32 engine="pallas-loop": same results as the per-attempt engines."""
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 5.0))
    save_at = np.linspace(0.0, 5.0, 3)
    b = 8
    key = jax.random.PRNGKey(0)
    u0s = jnp.asarray(
        np.asarray(u0)[None]
        * (1.0 + 0.01 * np.asarray(jax.random.normal(key, (b, 3)))),
        jnp.float32,
    )
    tols = np.full((b,), 1e-6, np.float32)
    kw = dict(save_at=save_at, dt0=0.1)
    us_x, _, n_x = batched_hi.make_hi_solver(vf, params, engine="xla", **kw)(u0s, tols)
    us_p, _, n_p = batched_hi.make_hi_solver(
        vf, params, engine="pallas-loop", interpret=True, **kw
    )(u0s, tols)
    np.testing.assert_allclose(
        np.asarray(us_p[0]), np.asarray(us_x[0]), rtol=2e-6, atol=1e-8
    )
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
