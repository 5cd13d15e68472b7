"""Parameter estimation for ODEs via the posterior marginal likelihood.

Covers the capability of the reference's training utilities
(/root/reference/src/odecheckpts/train_util.py and the bounded-while-loop
machinery its experiments pull from equinox,
experiments/old/neural_ode/train_ode.py:69-121) with a different design:

* parameters are an arbitrary pytree handled directly by optax — no
  ravel/unflatten round-trip through a flat vector;
* the data enters once, as an :class:`Observations` record closed over by the
  loss builder, so the per-step function signature is just ``(theta)``;
* :func:`fit` runs the whole optimisation under the bounded while loop
  (reverse-mode AD through the adaptive solve) in one call.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import control_flow, stats


class Observations(NamedTuple):
    """Noisy trajectory observations on the solver's save_at grid.

    ``ts``: (T,) observation times (must equal the grid the solve closure was
    built with).  ``ys``: (T,) or (T, d) observed values.  ``noise_std``:
    scalar or (T,) observation noise standard deviation.
    """

    ts: jax.Array
    ys: jax.Array
    noise_std: jax.Array | float


def nlml(solve: Callable, observations: Observations, *, u0, output_scale=1.0):
    """Build ``loss(theta) = -log p(ys | theta)`` from a solve closure.

    ``solve`` is a facade-style closure ``solve(u0, theta, output_scale=...)``
    whose aux dict exposes the posterior (``info["solution"].posterior``);
    ``theta`` may be any pytree of vector-field parameters.
    """
    ys = jnp.asarray(observations.ys)
    if ys.ndim == 1:
        ys = ys[:, None]
    std = jnp.broadcast_to(
        jnp.asarray(observations.noise_std), jnp.shape(observations.ts)
    )

    def loss_fn(theta):
        _u, info = solve(u0, theta, output_scale=output_scale)
        lml = stats.log_marginal_likelihood(
            ys, standard_deviation=std, posterior=info["solution"].posterior
        )
        return -lml

    return loss_fn


def gradient_step(loss_fn: Callable, optimizer):
    """Jitted single optimisation step: ``(theta, opt_state) -> (theta',
    opt_state', loss_value)``."""
    import optax

    @jax.jit
    def step(theta, opt_state):
        value, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(theta, updates), opt_state, value

    return step


def fit(
    loss_fn: Callable,
    theta0,
    optimizer,
    *,
    num_steps: int,
    max_solver_steps: Optional[int] = None,
    callback: Optional[Callable[[int, float], None]] = None,
    checkpoint_dir=None,
    checkpoint_every: int = 50,
):
    """Run ``num_steps`` of gradient descent on ``loss_fn``.

    When ``max_solver_steps`` is set, the whole loop (including tracing) runs
    under the bounded while loop so the adaptive solve inside ``loss_fn`` is
    reverse-mode differentiable.  Interruptible: Ctrl-C returns the progress
    so far (the reference keeps partial results the same way,
    train_ode.py:90-91).  Returns ``(theta, losses)``.

    ``checkpoint_dir`` enables durable resume (beyond the reference, which
    persists only results): every ``checkpoint_every`` steps — and on
    Ctrl-C — the ``(theta, opt_state, losses)`` pytree is written via
    :mod:`odecheckpts_tpu.checkpointing`; a rerun with the same directory
    restores the newest checkpoint and continues where it left off.
    ``num_steps`` counts TOTAL steps, so a resumed run does only the
    remainder.
    """
    step = gradient_step(loss_fn, optimizer)
    theta, opt_state = theta0, optimizer.init(theta0)
    losses = []
    start = 0

    if checkpoint_dir is not None:
        from . import checkpointing

        state = checkpointing.restore(checkpoint_dir)
        if state is not None:
            template = (theta, opt_state)
            leaves = jax.tree_util.tree_leaves((state["theta"], state["opt_state"]))
            theta, opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template), leaves
            )
            losses = [float(v) for v in state["losses"]]
            start = state["step"]

    def _save(i):
        from . import checkpointing

        checkpointing.save(
            checkpoint_dir,
            i,
            {
                "theta": theta,
                "opt_state": opt_state,
                "losses": np.asarray(losses, np.float64),
            },
        )

    def run():
        nonlocal theta, opt_state
        try:
            for i in range(start, num_steps):
                theta, opt_state, value = step(theta, opt_state)
                losses.append(float(value))
                if callback is not None:
                    callback(i, losses[-1])
                if checkpoint_dir is not None and (i + 1) % checkpoint_every == 0:
                    _save(i + 1)
        except KeyboardInterrupt:
            if checkpoint_dir is not None and losses:
                _save(len(losses))

    if max_solver_steps is not None:
        with control_flow.overwrite_with_bounded(max_steps=max_solver_steps):
            run()
    else:
        run()
    return theta, losses
