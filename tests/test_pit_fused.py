"""Fused lanes-last parallel-prefix (pit_fused) vs the reference combine.

The sqrt parallel-in-time elements are combined by
``parallel_time._combine_sqrt``; ``pit_fused`` re-expresses that combine in
the lanes-last layout (step axis trailing) and runs the inclusive prefix as
a Kogge-Stone scan, optionally with each level fused into one Mosaic kernel.
These tests pin (a) the single-combine algebra, (b) the prefix semantics vs
``jax.lax.associative_scan``, (c) the Pallas engine in interpret mode, and
(d) the end-to-end solver option.  U/Z factors are compared through their
Grams (QR right-rotation freedom; all consumers read them that way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import (
    ivpsolve,
    ivpsolvers,
    parallel_time,
    pit_fused,
    problems,
    taylor,
)


def _random_elements(key, p, m, c):
    """A batch of p arbitrary sqrt elements (the combine is defined for any
    factors: its Grams R^T R = I + M M^T are always invertible)."""
    ks = jax.random.split(key, 5)
    shp = {"a": (p, m, m), "b": (p, m, c), "u": (p, m, m), "eta": (p, m, c),
           "z": (p, m, m)}
    a, b, u, eta, z = (
        jax.random.normal(k, shp[n], jnp.float64)
        for k, n in zip(ks, ("a", "b", "u", "eta", "z"))
    )
    return (a, b, u, eta, z)


def _assert_elements_match(got, want, atol):
    """A, b, eta exactly; U, Z through their Grams."""
    for idx in (0, 1, 3):
        np.testing.assert_allclose(
            np.asarray(got[idx]), np.asarray(want[idx]), rtol=0, atol=atol
        )
    for idx in (2, 4):
        gram_g = jnp.einsum("...ik,...jk->...ij", got[idx], got[idx])
        gram_w = jnp.einsum("...ik,...jk->...ij", want[idx], want[idx])
        np.testing.assert_allclose(
            np.asarray(gram_g), np.asarray(gram_w), rtol=0, atol=atol
        )


def _to_ll(els):
    return tuple(jnp.moveaxis(e, 0, -1) for e in els)


def _from_ll(els_ll):
    return tuple(jnp.moveaxis(e, -1, 0) for e in els_ll)


def test_combine_ll_matches_sequential_combine():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    e_i = _random_elements(k1, 7, 5, 1)
    e_j = _random_elements(k2, 7, 5, 1)
    want = jax.vmap(parallel_time._combine_sqrt)(e_i, e_j)
    got = _from_ll(pit_fused.combine_sqrt_ll(_to_ll(e_i), _to_ll(e_j)))
    _assert_elements_match(got, want, atol=1e-11)


@pytest.mark.parametrize(
    "p",
    [
        1,
        2,
        # the large-P variants re-verify the same Kogge-Stone identity at
        # 20-28s each (warm, r5); P in {1, 2} keeps the oracle fast
        pytest.param(11, marks=pytest.mark.slow),
        pytest.param(16, marks=pytest.mark.slow),
    ],
)
def test_prefix_scan_matches_associative_scan(p):
    els = _random_elements(jax.random.PRNGKey(p), p, 4, 1)
    want = jax.lax.associative_scan(
        lambda a, b: jax.vmap(parallel_time._combine_sqrt)(a, b), els
    )
    got = pit_fused.prefix_scan_sqrt(els, engine="xla")
    _assert_elements_match(got, want, atol=1e-9)


@pytest.mark.parametrize("p", [1, 2, 5, 8])
def test_prefix_scan_xla_scan_matches_unrolled(p):
    # engine="xla-scan" puts the Kogge-Stone levels under lax.scan (one
    # combine body in the program instead of log2(P) copies — the compile-
    # size fix for the x64-emulated stiff PIT programs); the shift becomes
    # a gather.  Same algebra, so f64 agreement is to rounding.
    els = _random_elements(jax.random.PRNGKey(100 + p), p, 4, 1)
    want = pit_fused.prefix_scan_sqrt(els, engine="xla")
    got = pit_fused.prefix_scan_sqrt(els, engine="xla-scan")
    _assert_elements_match(got, want, atol=1e-9)


def test_identity_element_is_neutral():
    els = _random_elements(jax.random.PRNGKey(3), 5, 4, 2)
    ident = _from_ll(pit_fused.identity_element_ll(4, 2, 5, jnp.float64))
    left = jax.vmap(parallel_time._combine_sqrt)(ident, els)
    right = jax.vmap(parallel_time._combine_sqrt)(els, ident)
    _assert_elements_match(left, els, atol=1e-12)
    _assert_elements_match(right, els, atol=1e-12)


@pytest.mark.slow  # Mosaic-vs-XLA interpret gate stays fast in test_batched
def test_prefix_scan_pallas_interpret_matches_xla():
    # f32: interpret-mode Mosaic and XLA order the QR/solve reductions
    # differently, so unstructured O(1) random elements agree to a few
    # hundred ulps, not bit-exactly (the f64 end-to-end solver comparison in
    # test_combine_engine_end_to_end_matches_default is the exact gate)
    els = _random_elements(jax.random.PRNGKey(7), 5, 3, 1)
    els = tuple(e.astype(jnp.float32) for e in els)
    want = pit_fused.prefix_scan_sqrt(els, engine="xla")
    got = pit_fused.prefix_scan_sqrt(els, engine="pallas", interpret=True)
    _assert_elements_match(got, want, atol=1e-3)


def _fixed_grid_setup():
    vf, u0s, tspan, params = problems.rigid_body()
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(num_derivatives=nu, ode_shape=(3,))
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(
        lambda u: vf_p(u, t=tspan[0]), u0s, num=nu
    )
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(*tspan, num=33)
    return vf_p, init, grid, solver


@pytest.mark.slow  # 64s measured (r5); prefix-scan oracles remain fast
def test_combine_engine_end_to_end_matches_default():
    vf_p, init, grid, solver = _fixed_grid_setup()
    kw = dict(
        grid=grid, solver=solver, parallel=True, iterations=4, window=8,
        form="sqrt",
    )
    base = ivpsolve.solve_fixed_grid(vf_p, init, **kw)
    for engine in ("ll", "ll-scan"):
        got = ivpsolve.solve_fixed_grid(
            vf_p, init, combine_engine=engine, **kw
        )
        np.testing.assert_allclose(
            np.asarray(got.u), np.asarray(base.u), rtol=0, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(got.u_std), np.asarray(base.u_std), rtol=1e-8,
            atol=1e-12,
        )


def test_combine_ll_rank_polymorphic_block_axis():
    # a block axis between the matrix dims and the lanes (blockdiag layout)
    # must behave exactly like running each block separately
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    nb, p, m, c = 3, 5, 4, 1
    e_i = _random_elements(k1, nb * p, m, c)
    e_j = _random_elements(k2, nb * p, m, c)

    def to_blocked(els):
        # (nb*p, m, r) -> (m, r, nb, p)
        return tuple(
            jnp.moveaxis(e.reshape(nb, p, m, -1), (2, 3), (0, 1)) for e in els
        )

    got = pit_fused.combine_sqrt_ll(to_blocked(e_i), to_blocked(e_j))
    flat = tuple(
        jnp.moveaxis(g, (0, 1), (2, 3)).reshape(nb * p, m, -1) for g in got
    )
    want = jax.vmap(parallel_time._combine_sqrt)(e_i, e_j)
    _assert_elements_match(flat, want, atol=1e-11)


@pytest.mark.slow  # block-axis layout also covered by rank-polymorphic test
def test_prefix_scan_block_axis_matches_per_block():
    nb, p, m, c = 2, 7, 3, 1
    els = _random_elements(jax.random.PRNGKey(13), nb * p, m, c)
    blocked = tuple(
        jnp.moveaxis(e.reshape(nb, p, m, -1), (2, 3), (0, 1)) for e in els
    )  # (m, r, nb, p)
    got = pit_fused.prefix_scan_sqrt_ll(blocked, engine="xla")
    for b in range(nb):
        per_block = tuple(e.reshape(nb, p, m, -1)[b] for e in els)
        want = jax.lax.associative_scan(
            lambda x, y: jax.vmap(parallel_time._combine_sqrt)(x, y),
            per_block,
        )
        got_b = tuple(jnp.moveaxis(g[:, :, b, :], -1, 0) for g in got)
        _assert_elements_match(got_b, want, atol=1e-9)


@pytest.mark.slow  # 90s measured (r5)
def test_combine_engine_end_to_end_blockdiag():
    vfp, u0s, tspan, params = problems.rigid_body()
    vf2 = lambda u, *, t: vfp(u, t=t, p=params)  # noqa: E731
    nu = 3
    prior = ivpsolvers.prior_ibm(
        num_derivatives=nu, ode_shape=(3,), implementation="blockdiag"
    )
    strat = ivpsolvers.strategy_filter(prior, ivpsolvers.correction_ts0())
    solver = ivpsolvers.solver_dynamic(strat)
    tcoeffs = taylor.odejet_padded_scan(
        lambda u: vf2(u, t=tspan[0]), u0s, num=nu
    )
    init = solver.initial_condition(tcoeffs, 1.0)
    grid = jnp.linspace(*tspan, num=33)
    kw = dict(
        grid=grid, solver=solver, parallel=True, iterations=4, window=8,
        form="sqrt",
    )
    base = ivpsolve.solve_fixed_grid(vf2, init, **kw)
    got = ivpsolve.solve_fixed_grid(vf2, init, combine_engine="ll", **kw)
    np.testing.assert_allclose(
        np.asarray(got.u), np.asarray(base.u), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(got.u_std), np.asarray(base.u_std), rtol=1e-8, atol=1e-12
    )


def test_combine_engine_validation():
    vf_p, init, grid, solver = _fixed_grid_setup()
    kw = dict(grid=grid, solver=solver)
    with pytest.raises(ValueError, match="sqrt"):
        ivpsolve.solve_fixed_grid(
            vf_p, init, parallel=True, form="cov", combine_engine="ll", **kw
        )
    with pytest.raises(ValueError, match="combine_engine"):
        ivpsolve.solve_fixed_grid(
            vf_p, init, parallel=True, form="sqrt", combine_engine="bogus",
            **kw
        )
    with pytest.raises(ValueError, match="parallel-in-time"):
        ivpsolve.solve_fixed_grid(
            vf_p, init, parallel=False, combine_engine="ll", **kw
        )
