"""Harness, exp_util, and controller-variant coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import exp_util, facade, harness, ivpsolve, problems


def test_workprec_schema_matches_reference_contract():
    """Record keys the reference benchmark relies on (run_simple.py:208-215).

    Uses a stub algorithm (sol quality proportional to tol) so the harness
    contract is tested without compiling a solver; the harness-on-real-solver
    integration is exercised by the experiment scripts and test_facade.
    """
    truth = jnp.zeros(5)

    def algo(tol):
        return truth + tol, {"u0_solve": jnp.zeros(5)}

    wp = harness.workprec(
        algo,
        precision_fun=harness.rmse_absolute(truth),
        timeit_fun=harness.timeit_fun(2),
    )([1e-3, 1e-5])
    for key in [
        "list_of_args",
        "length_of_longest_vector",
        "work_min",
        "work_mean",
        "work_std",
        "precision",
    ]:
        assert key in wp
    assert np.all(np.asarray(wp["length_of_longest_vector"]) == 5)
    assert float(wp["precision"][1]) < float(wp["precision"][0])


def test_timing_and_memory_helpers():
    runtime = harness.runtime_min(lambda: jnp.ones(8) * 2, num_runs=2)
    assert runtime >= 0.0
    assert harness.nbytes_of_tree({"a": jnp.ones(4), "b": jnp.ones((2, 2))}) > 0
    stats = harness.device_memory_stats()
    assert len(stats) >= 1


def test_tree_random_like_and_styles():
    tree = {"w": jnp.zeros((3, 2)), "b": (jnp.zeros(2), jnp.zeros(()))}
    sample = exp_util.tree_random_like(jax.random.PRNGKey(0), tree)
    assert sample["w"].shape == (3, 2)
    assert not np.allclose(np.asarray(sample["w"]), 0.0)

    style = exp_util.style_simple()
    assert style.marker("TS0(4) (jit loop)") == "o"
    assert style.color("Bosh3() via rk") == "C2"
    style_h = exp_util.style_harder()
    assert style_h.marker("Prob(8) via probabilistic") == "o"
    assert style_h.marker("Yoshida4() via nystrom") == "D"
    assert style_h.label("Yoshida4() via nystrom") == "Nystrom: Yoshida4"
    assert style_h.linestyle("Yoshida4() via nystrom") == "solid"
    assert isinstance(exp_util.plot_params(), dict)
    assert exp_util.fontsize_uniform(9)["font.size"] == 9


def test_integral_controller_solves():
    vf, u0, tspan, params = problems.logistic()
    save_at = jnp.linspace(*tspan, num=4)
    from odecheckpts_tpu import ivpsolvers, taylor

    prior = ivpsolvers.prior_ibm(num_derivatives=3, ode_shape=(1,))
    solver = ivpsolvers.solver_dynamic(
        ivpsolvers.strategy_fixedpoint(prior, ivpsolvers.correction_ts0())
    )
    vf_p = lambda u, *, t: vf(u, t=t, p=params)  # noqa: E731
    tco = taylor.odejet_padded_scan(lambda u: vf_p(u, t=tspan[0]), u0, num=3)
    init = solver.initial_condition(tco, 1.0)
    asolver = ivpsolve.adaptive(
        solver, atol=1e-7, rtol=1e-7, control=ivpsolve.control_integral()
    )
    sol = ivpsolve.solve_adaptive_save_at(
        vf_p, init, save_at=save_at, dt0=0.1, adaptive_solver=asolver
    )

    def exact(ts, u0=0.1):
        c = (1 - u0) / u0
        return 1.0 / (1.0 + c * np.exp(-np.asarray(ts)))

    np.testing.assert_allclose(np.asarray(sol.u)[:, 0], exact(save_at), rtol=1e-4)


@pytest.mark.slow  # 15s warm (r5): two debug_nans recompiles of a full solve
def test_nan_guard_and_debug_nans_context():
    import pytest

    @jax.jit
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    guarded = harness.nan_guard(bad, name="bad")
    assert float(guarded(jnp.asarray(2.0))) > 0.0
    with pytest.raises(FloatingPointError, match="bad"):
        guarded(jnp.asarray(-1.0))

    # the debug_nans context toggles and restores the global flag (raising
    # behavior depends on process-level dispatch state; see its docstring)
    assert not jax.config.jax_debug_nans
    with harness.debug_nans():
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans
