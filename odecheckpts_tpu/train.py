"""Training utilities: ODE parameter estimation via the posterior likelihood.

Parity with /root/reference/src/odecheckpts/train_util.py (loss:9, update:30)
plus the differentiability machinery the reference pulls from equinox
(bounded while loop: experiments/old/neural_ode/train_ode.py:69-71,119-121) --
here provided natively by ``control_flow.overwrite_with_bounded``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from . import stats


def loss(solver: Callable, unflatten: Callable):
    """Negative log-marginal-likelihood loss from the solver posterior."""

    @jax.jit
    def loss_fn(params, *, X, y, stdev, scale, u0):
        (p,) = unflatten(params)
        sol, info = solver(u0, p, output_scale=scale)
        posterior = info["solution"].posterior
        observation_std = jnp.ones_like(X) * stdev
        marginal_likelihood = stats.log_marginal_likelihood(
            y[:, None], standard_deviation=observation_std, posterior=posterior
        )
        return -1.0 * marginal_likelihood

    return loss_fn


def update(optimizer, loss_fn, /):
    """Single jitted optimization step (optax)."""
    import optax

    @jax.jit
    def update_fn(params, opt_state, **kwargs):
        loss_val, grads = jax.value_and_grad(loss_fn)(params, **kwargs)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss_val}

    return update_fn
