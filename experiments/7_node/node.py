"""Neural ODE trained with probabilistic vs RK solvers (reference old/7_node).

Capability parity with /root/reference/experiments/old/7_node/node.py:

* an MLP vector field (equinox-free; plain pytree params) fitted to a spiral
  / sine trajectory;
* two losses: negative log-marginal likelihood through the probabilistic
  solver (with a TRAINABLE observation scale ``log_sigma``) and plain MSE
  through the native RK solver;
* vmapped solve over a batch of initial conditions
  (old/7_learn_ode_dynamics/learn_ode.py:48-59);
* train/test protocol with held-out initial conditions;
* reverse-mode AD through the adaptive loop via the bounded while loop.
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.flatten_util  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import control_flow, facade, stats  # noqa: E402


def mlp_init(key, sizes):
    params = []
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        scale = 1.0 / jnp.sqrt(1.0 * fan_in)
        params.append(
            (
                scale * jax.random.normal(k1, (fan_in, fan_out)),
                scale * jax.random.normal(k2, (fan_out,)),
            )
        )
    return params


def mlp_apply(params, x):
    for w, b in params[:-1]:
        x = jax.nn.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def main(num_epochs=150, max_steps=128, loss_kind="lml"):
    import optax

    d = 2

    # Ground truth: a linear spiral field
    a_true = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])

    def vf_true(u, *, t, p=()):
        return u @ a_true.T

    def vf(u, *, t, p):
        return mlp_apply(p, u)

    grid = jnp.linspace(0.0, 3.0, num=16)
    key = jax.random.PRNGKey(0)
    u0s_train = jax.random.normal(jax.random.PRNGKey(1), (4, d))
    u0s_test = jax.random.normal(jax.random.PRNGKey(2), (2, d))

    solve_true = facade.solve_rk("dopri5", vf_true, jnp.zeros(d), grid,
                                 dt0=0.1, atol=1e-10, rtol=1e-10)

    def make_data(u0s):
        return jnp.stack([solve_true((u0,), ())[0] for u0 in u0s])

    ys_train, ys_test = make_data(u0s_train), make_data(u0s_test)

    params0 = mlp_init(key, (d, 32, d))
    log_sigma0 = jnp.asarray(-3.0)
    flat0, unflatten = jax.flatten_util.ravel_pytree((params0, log_sigma0))

    solve_prob = facade.solve(
        "ts0-3", vf, jnp.zeros(d), grid, dt0=0.1, atol=1e-4, rtol=1e-4,
        calibrate="none",
    )
    solve_rk = facade.solve_rk("bosh3", vf, jnp.zeros(d), grid,
                               dt0=0.1, atol=1e-6, rtol=1e-6)

    def loss_one_lml(p, log_sigma, u0, y):
        _u, aux = solve_prob((u0,), p)
        lml = stats.log_marginal_likelihood(
            y, standard_deviation=jnp.exp(log_sigma) * jnp.ones(len(grid)),
            posterior=aux["solution"].posterior,
        )
        return -lml

    def loss_one_mse(p, log_sigma, u0, y):
        u, _ = solve_rk((u0,), p)
        return jnp.mean((u - y) ** 2)

    loss_one = loss_one_lml if loss_kind == "lml" else loss_one_mse

    @jax.jit
    def loss_fn(flat, u0s, ys):
        p, log_sigma = unflatten(flat)
        return jnp.mean(jax.vmap(lambda u0, y: loss_one(p, log_sigma, u0, y))(u0s, ys))

    optimizer = optax.adam(3e-3)
    flat = flat0
    opt_state = optimizer.init(flat)

    @jax.jit
    def step(flat, opt_state):
        val, g = jax.value_and_grad(loss_fn)(flat, u0s_train, ys_train)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(flat, updates), opt_state, val

    losses = []
    with control_flow.overwrite_with_bounded(max_steps=max_steps):
        try:
            for epoch in range(num_epochs):
                flat, opt_state, val = step(flat, opt_state)
                losses.append(float(val))
                if epoch % 10 == 0:
                    test = float(loss_fn(flat, u0s_test, ys_test))
                    print(f"epoch {epoch}: train {val:.4f}, test {test:.4f}", flush=True)
        except KeyboardInterrupt:
            pass
        test_final = float(loss_fn(flat, u0s_test, ys_test))

    print(f"final: train {losses[-1]:.4f}, test {test_final:.4f}")
    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, f"losses_{loss_kind}.npy"), jnp.asarray(losses))

    # fitted trajectories for plot_node.py (reference old/7_node/plot_node.py
    # renders data/truth/before/fit curves; same deliverable, our schema):
    # one held-out initial condition rolled out on a dense grid with the
    # trained vs untrained vector field
    ts_dense = jnp.linspace(0.0, 3.0, num=120)
    u0_plot = u0s_test[0]
    roll = facade.solve_rk("dopri5", vf, jnp.zeros(d), ts_dense,
                           dt0=0.1, atol=1e-8, rtol=1e-8)
    roll_true = facade.solve_rk("dopri5", vf_true, jnp.zeros(d), ts_dense,
                                dt0=0.1, atol=1e-10, rtol=1e-10)
    p_fit, _ = unflatten(flat)
    import numpy as _np

    # pure-numpy leaves: pickled JAX arrays re-initialize the default
    # (TPU) backend at np.load time and hang plot scripts off-chip
    fits = {
        "ts": _np.asarray(ts_dense),
        "truth": _np.asarray(roll_true((u0_plot,), ())[0]),
        "before": _np.asarray(roll((u0_plot,), params0)[0]),
        "after": _np.asarray(roll((u0_plot,), p_fit)[0]),
        "data_ts": _np.asarray(grid),
        "data_ys": _np.asarray(solve_true((u0_plot,), ())[0]),
    }
    jnp.save(os.path.join(here, f"fits_{loss_kind}.npy"), fits,
             allow_pickle=True)
    assert losses[-1] < losses[0]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--loss", choices=["lml", "mse"], default="lml")
    a = ap.parse_args()
    main(num_epochs=a.epochs, loss_kind=a.loss)
