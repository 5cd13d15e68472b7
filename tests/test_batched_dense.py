"""Fused dense-backend engine (batched_dense) vs the generic dense stack.

VERDICT round-2 item 3: TS1 for d > 1 must leave the generic vmapped path.
The oracle is the generic dense backend (ssm/dense.py) driven through the
facade; the fused engine must reproduce its trajectories (same algebra,
different execution layout) and the Pallas kernel must match the XLA engine
in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import batched, batched_dense, parallel, problems


def _rigid_inputs(dtype=jnp.float64, batch=4):
    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.linspace(*tspan, num=5).astype(dtype)
    key = jax.random.PRNGKey(0)
    u0s = jnp.asarray(
        u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3))), dtype
    )
    tols = jnp.asarray([1e-4, 1e-5, 1e-6, 1e-4], dtype)[:batch]
    return vf, params, save_at, u0s, tols


# 92-110s each measured (r5): the dense fused-vs-generic oracle stays in
# the fast tier via test_dense_ts1_vdp_as_system_matches_generic
@pytest.mark.slow
@pytest.mark.parametrize("corr", ["ts1", "ts0"])
def test_dense_xla_engine_matches_generic_vmapped(corr):
    vf, params, save_at, u0s, tols = _rigid_inputs()

    def solve_one(u0_one, tol):
        from odecheckpts_tpu import facade

        fn = facade.solve(
            f"{corr}-4", vf, u0s[0], save_at, dt0=0.1, atol=1e-3 * tol,
            rtol=tol, implementation="dense",
        )
        u, aux = fn((u0_one,), params)
        return u, aux["solution"].num_steps[-1]

    u_ref, n_ref = jax.vmap(solve_one)(u0s, tols)
    u_s, _u_f, n_fus = batched_dense.solve_save_at_batched_dense(
        vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
        engine="xla", correction=corr, lanes=4,
    )
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_ref), rtol=1e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(n_fus[:, -1], np.float64), np.asarray(n_ref, np.float64),
        rtol=0.05,
    )


def test_dense_ts1_vdp_as_system_matches_generic():
    """Stiff-ish VdP written as a d=2 first-order system (the VERDICT's
    equivalence case): per-lane (2, 2) Jacobians inside the fused step."""
    mu = 10.0

    def vf(y, *, t, p=()):
        return jnp.stack([y[1], mu * ((1.0 - y[0] ** 2) * y[1]) - y[0]])

    save_at = jnp.linspace(0.0, 3.0, num=4)
    u0s = jnp.asarray([[2.0, 0.0], [1.9, 0.1], [2.1, -0.1], [2.0, 0.2]])
    tols = jnp.full((4,), 1e-6)

    def solve_one(u0_one, tol):
        from odecheckpts_tpu import facade

        fn = facade.solve(
            "ts1-4", vf, u0s[0], save_at, dt0=0.01, atol=1e-3 * tol,
            rtol=tol, implementation="dense",
        )
        u, aux = fn((u0_one,), ())
        return u, aux["solution"].num_steps[-1]

    u_ref, n_ref = jax.vmap(solve_one)(u0s, tols)
    u_s, _u_f, n_fus = batched_dense.solve_save_at_batched_dense(
        vf, u0s, (), save_at=save_at, dt0=0.01, tols=tols,
        engine="xla", correction="ts1", lanes=4,
    )
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_ref), rtol=2e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(n_fus[:, -1], np.float64), np.asarray(n_ref, np.float64),
        rtol=0.05,
    )


# interpret-mode compiles are 69-71s each (r5); the Mosaic-vs-XLA interpret
# oracle stays fast via test_batched/test_batched_blockdiag interpret tests
@pytest.mark.slow
def test_dense_pallas_interpret_matches_xla():
    vf, params, save_at, u0s, tols = _rigid_inputs(dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols, correction="ts1", lanes=4)
    u_x, _, n_x = batched_dense.solve_save_at_batched_dense(
        vf, u0s, params, engine="xla", **kw
    )
    u_p, _, n_p = batched_dense.solve_save_at_batched_dense(
        vf, u0s, params, engine="pallas", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


@pytest.mark.slow  # see note above
def test_dense_pallas_loop_interpret_matches_xla():
    vf, params, save_at, u0s, tols = _rigid_inputs(dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols, correction="ts1", lanes=4)
    u_x, _, n_x = batched_dense.solve_save_at_batched_dense(
        vf, u0s, params, engine="xla", **kw
    )
    u_p, _, n_p = batched_dense.solve_save_at_batched_dense(
        vf, u0s, params, engine="pallas-loop", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


def test_solve_save_at_batched_dispatches_ts1_d_gt_1():
    """batched.solve_save_at_batched must route TS1 d>1 to the dense engine
    instead of raising (round-2 scope gap)."""
    vf, params, save_at, u0s, tols = _rigid_inputs(batch=2)
    u_s, _u_f, n = batched.solve_save_at_batched(
        vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
        engine="xla", correction="ts1", lanes=2,
    )
    assert np.all(np.isfinite(np.asarray(u_s)))
    assert int(np.asarray(n)[:, -1].min()) > 0


def test_dense_filter_strategy_runs():
    vf, params, save_at, u0s, tols = _rigid_inputs(batch=2)
    u_s, u_f, _n = batched_dense.solve_save_at_batched_dense(
        vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
        engine="xla", correction="ts1", strategy="filter", lanes=2,
    )
    np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_f))
    assert np.all(np.isfinite(np.asarray(u_s)))
