"""The reference's own test matrix, ported: two independent solvers must agree.

Mirrors /root/reference/tests/test_ivpsolvers.py (pytest_cases cross-product
of {checkpoint, interpolate} x {ts0-2, ts0-4} x {bosh3, tsit5} on the logistic
problem, agreement to sqrt(tol), aux-dict contract) using plain pytest
parametrization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import facade, problems


@pytest.mark.parametrize("m0", ["ts0-2", "ts0-4"])
@pytest.mark.parametrize("m1", ["bosh3", "tsit5"])
@pytest.mark.parametrize("variant", ["checkpoint", "interpolate"])
def test_two_solvers_return_the_same_solution(m0, m1, variant):
    vf, u0, time_span, args = problems.logistic()

    dt0 = 0.1
    atol, rtol = 1e-3, 1e-3
    save_at = jnp.linspace(*time_span, num=5)
    u0_like = u0[0]

    if variant == "checkpoint":
        solve1 = facade.solve(m0, vf, u0_like, save_at, dt0=dt0, atol=atol, rtol=rtol)
    else:
        solve1 = facade.solve_via_interpolate(
            m0, vf, u0_like, save_at, dt0=dt0, atol=atol, rtol=rtol
        )
    solution1, aux1 = solve1(u0, args)

    solve2 = facade.solve_rk(m1, vf, u0_like, save_at, dt0=dt0, atol=atol, rtol=rtol)
    solution2, aux2 = solve2(u0, args)

    assert "u0_solve" in aux1.keys()
    assert "u0_solve" in aux2.keys()

    assert np.allclose(
        np.asarray(solution1),
        np.asarray(solution2),
        atol=float(jnp.sqrt(atol)),
        rtol=float(jnp.sqrt(rtol)),
    )


def test_checkpoint_solution_length_is_memory_proxy():
    """The benchmark harness depends on len(aux['u0_solve'])
    (reference run_simple.py:200): #save_at for checkpoints, #steps for
    the interpolation variant."""
    vf, u0, time_span, args = problems.logistic()
    save_at = jnp.linspace(*time_span, num=5)
    sc = facade.solve("ts0-4", vf, u0[0], save_at, dt0=0.1, atol=1e-6, rtol=1e-6)
    _, aux_c = sc(u0, args)
    assert len(aux_c["u0_solve"]) == 5

    si = facade.solve_via_interpolate(
        "ts0-4", vf, u0[0], save_at, dt0=0.1, atol=1e-6, rtol=1e-6
    )
    _, aux_i = si(u0, args)
    assert len(aux_i["u0_solve"]) > 5  # O(#steps)


def test_asolve_scipy_matches_probabilistic():
    vf, u0, time_span, args = problems.rigid_body()
    ts, ys = facade.asolve_scipy("LSODA", vf, time_span, atol=1e-12, rtol=1e-12)(
        u0, args
    )
    save_at = jnp.asarray(ts[-1:])
    solve1 = facade.solve(
        "ts0-4",
        vf,
        u0[0],
        jnp.asarray([time_span[0], time_span[1]]),
        dt0=0.1,
        atol=1e-10,
        rtol=1e-10,
    )
    u_prob, _ = solve1(u0, args)
    np.testing.assert_allclose(u_prob[-1], ys[-1], rtol=1e-6)
    del save_at


def test_facade_backend_selection():
    """implementation= routes to isotropic/blockdiag/scalar backends."""
    vf, u0, time_span, args = problems.logistic()
    save_at = jnp.linspace(*time_span, num=4)
    outs = {}
    for impl in ["isotropic", "blockdiag", "scalar"]:
        fn = facade.solve(
            "ts0-3", vf, u0[0], save_at, dt0=0.1, atol=1e-7, rtol=1e-7,
            implementation=impl,
        )
        u, _aux = fn(u0, args)
        outs[impl] = np.asarray(u)
    np.testing.assert_allclose(outs["isotropic"], outs["blockdiag"], rtol=1e-5)
    np.testing.assert_allclose(outs["blockdiag"], outs["scalar"], rtol=1e-12)
