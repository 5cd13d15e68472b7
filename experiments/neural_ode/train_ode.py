"""Neural-ODE / parameter-estimation training loop.

Port of /root/reference/experiments/old/neural_ode/train_ode.py: fit an MLP
vector field to data by gradient descent on the negative log-marginal
likelihood of the solver posterior, differentiating REVERSE-MODE through the
PI-adaptive solve.  The reference needed equinox's bounded while loop via
``context_overwrite_while_loop`` (:69-71,119-121); here the bounded loop is a
native framework feature (``control_flow.overwrite_with_bounded``).
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

from odecheckpts_tpu import control_flow, facade, problems, train  # noqa: E402


def main(num_epochs=250, max_steps=128, lr=1e-2):
    import optax

    vf, u0, _tspan, params = problems.neural_ode_mlp(layer_sizes=(2, 20, 1))

    # Data: noisy sine observations on a grid (reference :36-46)
    grid = jnp.linspace(0.0, 1.0, num=100)
    data = jnp.sin(5.0 * jnp.pi * grid)

    solve = facade.solve(
        "ts0-4", vf, u0[0], grid, dt0=0.1, atol=1e-3, rtol=1e-2, calibrate="none"
    )
    obs = train.Observations(ts=grid, ys=data, noise_std=1e-1)
    loss_fn = train.nlml(solve, obs, u0=u0)

    def progress(epoch, value):
        if epoch % 10 == 0:
            print(f"epoch {epoch}: loss {value:.3f}", flush=True)

    theta, losses = train.fit(
        loss_fn,
        params,
        optax.adam(lr),
        num_steps=num_epochs,
        max_solver_steps=max_steps,
        callback=progress,
    )

    here = os.path.dirname(__file__)
    jnp.save(os.path.join(here, "losses.npy"), jnp.asarray(losses))
    with control_flow.overwrite_with_bounded(max_steps=max_steps):
        y_fit, _ = solve(u0, theta)
    jnp.save(os.path.join(here, "fit.npy"), y_fit)
    jnp.save(os.path.join(here, "data.npy"), data)
    print(f"final loss: {losses[-1]:.3f} (initial {losses[0]:.3f})")
    assert losses[-1] < losses[0], "training must reduce the loss"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--max-steps", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-2)
    a = ap.parse_args()
    main(num_epochs=a.epochs, max_steps=a.max_steps, lr=a.lr)
