"""Fused blockdiag engine (batched_blockdiag) vs the generic blockdiag stack.

ROADMAP #6: per-dimension (n, n) covariance factors + per-dimension output
scales on the lanes-last fused layout.  Oracle: the generic blockdiag
backend through the facade; engine equivalence in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import batched, batched_blockdiag, problems


def _inputs(dtype=jnp.float64, batch=4):
    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.linspace(*tspan, num=5).astype(dtype)
    key = jax.random.PRNGKey(0)
    u0s = jnp.asarray(
        u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3))), dtype
    )
    tols = jnp.asarray([1e-4, 1e-5, 1e-6, 1e-4], dtype)[:batch]
    return vf, params, save_at, u0s, tols


def test_blockdiag_xla_engine_matches_generic_vmapped():
    vf, params, save_at, u0s, tols = _inputs()

    def solve_one(u0_one, tol):
        from odecheckpts_tpu import facade

        fn = facade.solve(
            "ts0-4", vf, u0s[0], save_at, dt0=0.1, atol=1e-3 * tol,
            rtol=tol, implementation="blockdiag",
        )
        u, aux = fn((u0_one,), params)
        return u, aux["solution"].num_steps[-1]

    u_ref, n_ref = jax.vmap(solve_one)(u0s, tols)
    u_s, _u_f, n_fus = batched_blockdiag.solve_save_at_batched_blockdiag(
        vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
        engine="xla", lanes=4,
    )
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_ref), rtol=1e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(n_fus[:, -1], np.float64), np.asarray(n_ref, np.float64),
        rtol=0.05,
    )


def test_blockdiag_pallas_interpret_matches_xla():
    vf, params, save_at, u0s, tols = _inputs(dtype=jnp.float32)
    kw = dict(save_at=save_at, dt0=0.1, tols=tols, lanes=4)
    u_x, _, n_x = batched_blockdiag.solve_save_at_batched_blockdiag(
        vf, u0s, params, engine="xla", **kw
    )
    u_p, _, n_p = batched_blockdiag.solve_save_at_batched_blockdiag(
        vf, u0s, params, engine="pallas-loop", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))


def test_blockdiag_dispatch_and_scope():
    vf, params, save_at, u0s, tols = _inputs(batch=2)
    u_s, _u_f, n = batched.solve_save_at_batched(
        vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
        engine="xla", implementation="blockdiag", lanes=2,
    )
    assert np.all(np.isfinite(np.asarray(u_s)))
    assert int(np.asarray(n)[:, -1].min()) > 0
    with pytest.raises(ValueError, match="ts0"):
        batched.solve_save_at_batched(
            vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
            engine="xla", implementation="blockdiag", correction="ts1",
        )


def test_blockdiag_filter_strategy_runs():
    vf, params, save_at, u0s, tols = _inputs(batch=2)
    u_s, u_f, _n = batched_blockdiag.solve_save_at_batched_blockdiag(
        vf, u0s, params, save_at=save_at, dt0=0.1, tols=tols,
        engine="xla", strategy="filter", lanes=2,
    )
    np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_f))
    assert np.all(np.isfinite(np.asarray(u_s)))
