"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import parallel, problems
from jax.sharding import Mesh


def _mesh(axis="batch"):
    devs = np.array(jax.devices())
    if devs.size < 2:
        pytest.skip("needs multiple (virtual) devices")
    return Mesh(devs, (axis,))


def _exact_logistic(ts, u0):
    c = (1.0 - u0) / u0
    return 1.0 / (1.0 + c * np.exp(-np.asarray(ts)))


def test_batched_solve_matches_closed_form():
    vf, (u0,), tspan, params = problems.logistic()
    save_at = jnp.linspace(*tspan, num=5)
    solve_batch = parallel.build_batched_solve(
        "ts0-3", vf, u0, save_at, dt0=0.1
    )
    batch = 16
    u0s = (jnp.linspace(0.05, 0.6, batch)[:, None],)
    tols = jnp.full((batch,), 1e-7)
    us, steps = jax.jit(lambda a, b: solve_batch(a, params, b))(u0s, tols)
    assert us.shape == (batch, 5, 1)
    for i in range(batch):
        np.testing.assert_allclose(
            np.asarray(us)[i, :, 0],
            _exact_logistic(save_at, float(u0s[0][i, 0])),
            rtol=1e-4,
        )
    assert int(jnp.min(steps)) > 0


def test_sharded_solve_matches_unsharded():
    mesh = _mesh()
    vf, (u0,), tspan, params = problems.logistic()
    save_at = jnp.linspace(*tspan, num=5)
    solve_batch = parallel.build_batched_solve("ts0-3", vf, u0, save_at, dt0=0.1)
    batch = 8 * len(jax.devices())
    u0s = (jnp.linspace(0.05, 0.6, batch)[:, None],)
    tols = jnp.tile(jnp.asarray([1e-4, 1e-6]), batch // 2)

    u_ref, steps_ref = solve_batch(u0s, params, tols)

    sharded = parallel.shard_batched_solve(solve_batch, mesh)
    u0s_sh = parallel.shard_along(u0s, mesh)
    tols_sh = parallel.shard_along(tols, mesh)
    u_sh, steps_sh = sharded(u0s_sh, params, tols_sh)

    # jit/fusion differences across the shard boundary allow tiny numerical
    # drift, which can also flip individual accept/reject decisions
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(steps_sh, float), np.asarray(steps_ref, float), rtol=0.06
    )


def test_sharded_fused_engine_matches_unsharded():
    """The fused lanes-last engine composed with shard_map (VERDICT round-1
    gap 4): per-shard fused solves must equal the single-device fused solve."""
    mesh = _mesh()
    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.linspace(*tspan, num=5)
    batch = 4 * len(jax.devices())
    key = jax.random.PRNGKey(0)
    u0s = u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3)))
    tols = jnp.tile(jnp.asarray([1e-4, 1e-6]), batch // 2)

    from odecheckpts_tpu import batched

    u_ref, _uf, steps_ref = jax.jit(
        lambda u, t: batched.solve_save_at_batched(
            vf, u, params, save_at=save_at, dt0=0.1, tols=t, engine="xla"
        )
    )(u0s, tols)

    sharded = parallel.shard_fused_solve(
        vf, params, save_at=save_at, dt0=0.1, mesh=mesh, engine="xla"
    )
    u_sh, _uf_sh, steps_sh = sharded(
        parallel.shard_along(u0s, mesh), parallel.shard_along(tols, mesh)
    )
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(steps_sh[:, -1], float), np.asarray(steps_ref[:, -1], float),
        rtol=0.06,
    )


@pytest.mark.slow
def test_dp_train_step_runs_and_improves():
    optax = pytest.importorskip("optax")
    mesh = _mesh("dp")

    def vf(u, *, t, p):
        return p * u * (1.0 - u)

    save_at = jnp.linspace(0.0, 1.5, num=4)
    batch = len(jax.devices())
    u0s = jnp.linspace(0.1, 0.4, batch)[:, None]
    a_true = 1.3
    ys = jnp.stack(
        [
            jnp.asarray(
                [_exact_true(float(u), t, a_true) for t in np.asarray(save_at)]
            )[:, None]
            for u in u0s[:, 0]
        ]
    )

    optimizer = optax.adam(0.2)
    from odecheckpts_tpu import control_flow

    step = parallel.build_dp_train_step(
        "ts0-2",
        vf,
        u0s[0],
        save_at,
        dt0=0.1,
        atol=1e-5,
        rtol=1e-5,
        optimizer=optimizer,
        mesh=mesh,
    )
    params = jnp.asarray(0.9)
    opt_state = optimizer.init(params)
    u0_sh = parallel.shard_along(u0s, mesh, "dp")
    y_sh = parallel.shard_along(ys, mesh, "dp")
    with control_flow.overwrite_with_bounded(max_steps=128):
        params1, opt_state, loss1 = step(params, opt_state, u0_sh, y_sh)
        params2, opt_state, loss2 = step(params1, opt_state, u0_sh, y_sh)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # moving towards the true parameter
    assert abs(float(params2) - a_true) < abs(0.9 - a_true)


def _exact_true(u0, t, a):
    c = (1.0 - u0) / u0
    return 1.0 / (1.0 + c * np.exp(-a * t))


def test_sharded_hi_engine_matches_unsharded():
    """The df32 tight-tolerance engine under shard_map: per-shard pair
    solves equal the single-device solve bit-for-bit (same kernel, same
    lane masks; sharding only splits the embarrassingly parallel axis)."""
    from odecheckpts_tpu import batched_hi

    mesh = _mesh()
    vf, (u0,), tspan, params = problems.rigid_body(time_span=(0.0, 20.0))
    save_at = jnp.linspace(0.0, 20.0, num=4)
    batch = 2 * len(jax.devices())
    key = jax.random.PRNGKey(0)
    u0s = jnp.asarray(
        u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3))),
        jnp.float32,
    )
    tols = np.full((batch,), 1e-8, np.float32)
    kw = dict(
        save_at=save_at, dt0=0.1, engine="xla", lanes=2,
        vf_df=problems.rigid_body_df(params),
    )
    s_one = batched_hi.make_hi_solver(vf, params, **kw)
    s_shd = batched_hi.make_hi_solver(
        vf, params, shard_mesh=mesh, shard_axis="batch", **kw
    )
    us1, _uf1, n1 = s_one(u0s, tols)
    us2, _uf2, n2 = s_shd(u0s, tols)
    np.testing.assert_array_equal(np.asarray(us1[0]), np.asarray(us2[0]))
    np.testing.assert_array_equal(np.asarray(us1[1]), np.asarray(us2[1]))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_sharded_pallas_loop_interpret_matches_xla():
    """shard_map x Pallas composition proven off-TPU (VERDICT round-2 #5):
    the in-kernel accept/reject loop engine (interpret mode) under dp
    sharding must match the sharded XLA engine."""
    mesh = _mesh()
    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.linspace(*tspan, num=5).astype(jnp.float32)
    batch = 4 * len(jax.devices())
    key = jax.random.PRNGKey(0)
    u0s = jnp.asarray(
        u0[None] * (1.0 + 0.05 * jax.random.normal(key, (batch, 3))),
        jnp.float32,
    )
    tols = jnp.tile(jnp.asarray([1e-3, 1e-5], jnp.float32), batch // 2)
    kw = dict(save_at=save_at, dt0=0.1, mesh=mesh)

    s_xla = parallel.shard_fused_solve(vf, params, engine="xla", **kw)
    s_pl = parallel.shard_fused_solve(
        vf, params, engine="pallas-loop", interpret=True, lanes=2, **kw
    )
    u_x, _ufx, n_x = s_xla(
        parallel.shard_along(u0s, mesh), parallel.shard_along(tols, mesh)
    )
    u_p, _ufp, n_p = s_pl(
        parallel.shard_along(u0s, mesh), parallel.shard_along(tols, mesh)
    )
    np.testing.assert_allclose(
        np.asarray(u_p), np.asarray(u_x), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
