"""Recover an ODE initial condition by gradient descent through the solver.

Port of /root/reference/experiments/old/6_learn_ode/learn.py: observe a Van
der Pol trajectory, start from a perturbed initial condition, and recover it
by descending the negative log-marginal likelihood -- reverse-mode through
the adaptive solve (bounded loop).
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from odecheckpts_tpu import control_flow, facade, stats  # noqa: E402


def main(num_epochs=100, mu=1.0, max_steps=256):
    import optax

    def vf(y, ydot, *, t, p=()):
        return mu * (ydot * (1.0 - y**2) - y)

    u0_true = (jnp.asarray([2.0]), jnp.asarray([0.0]))
    grid = jnp.linspace(0.0, 3.0, num=20)

    solve = facade.solve(
        "ts0-4", vf, u0_true[0], grid, dt0=0.1, atol=1e-5, rtol=1e-5,
        ode_order=2, calibrate="none",
    )
    with control_flow.overwrite_with_bounded(max_steps=max_steps):
        data = jax.jit(lambda: solve(u0_true, ())[0])()

    def loss_fn(u0_flat):
        u0 = (u0_flat[:1], u0_flat[1:])
        _u, aux = solve(u0, ())
        lml = stats.log_marginal_likelihood(
            data,
            standard_deviation=1e-2 * jnp.ones(len(grid)),
            posterior=aux["solution"].posterior,
        )
        return -lml

    optimizer = optax.adam(0.05)
    p = jnp.asarray([2.5, 0.3])
    opt_state = optimizer.init(p)
    step = jax.jit(
        lambda p, s: _step(p, s, loss_fn, optimizer)
    )
    with control_flow.overwrite_with_bounded(max_steps=max_steps):
        for epoch in range(num_epochs):
            p, opt_state, loss = step(p, opt_state)
            if epoch % 10 == 0:
                print(f"epoch {epoch}: loss {float(loss):.3f}, u0 {p}", flush=True)

    err = float(jnp.max(jnp.abs(p - jnp.asarray([2.0, 0.0]))))
    print(f"recovered u0: {p}, max error {err:.4f}")
    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, "recovered_u0.npy"), p)
    assert err < 0.1, "initial condition must be recovered"


def _step(p, opt_state, loss_fn, optimizer):
    import optax

    loss, grads = jax.value_and_grad(loss_fn)(p)
    updates, opt_state = optimizer.update(grads, opt_state)
    return optax.apply_updates(p, updates), opt_state, loss


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--mu", type=float, default=1.0)
    a = ap.parse_args()
    main(num_epochs=a.epochs, mu=a.mu)
