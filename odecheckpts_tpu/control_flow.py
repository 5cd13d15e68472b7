"""Overridable control flow for the adaptive solve loop.

Capability parity with ``probdiffeq.backend.control_flow.
context_overwrite_while_loop`` (used by the reference's training scripts to
swap in a bounded, reverse-differentiable loop:
/root/reference/experiments/old/neural_ode/train_ode.py:69-71,119-121).

The TPU rebuild ships the bounded loop natively: ``bounded_while_loop`` is a
checkpointed ``lax.scan`` with a masked body, so it is reverse-mode
differentiable and compiles to a static trip count -- the layout TPUs prefer.
No third-party (equinox) dependency is required.
"""

from __future__ import annotations

import contextlib
import functools

import jax

_WHILE_LOOP_STACK = [jax.lax.while_loop]


def while_loop(cond_fun, body_fun, init_val):
    """The solver's internal while-loop; defaults to ``jax.lax.while_loop``."""
    return _WHILE_LOOP_STACK[-1](cond_fun, body_fun, init_val)


@contextlib.contextmanager
def context_overwrite_while_loop(fn):
    """Temporarily replace the solver-internal while loop (e.g. with a bounded
    loop to enable reverse-mode AD through the adaptive solver)."""
    _WHILE_LOOP_STACK.append(fn)
    try:
        yield
    finally:
        _WHILE_LOOP_STACK.pop()


def bounded_while_loop(cond_fun, body_fun, init_val, *, max_steps: int, remat: bool = True):
    """while_loop with a static bound: scan + masked body.

    Reverse-mode differentiable; iterations after the predicate turns False
    are no-ops (select), so results match ``lax.while_loop`` whenever the true
    trip count is <= max_steps.  ``remat`` checkpoints each iteration to keep
    the backward-pass memory at O(sqrt)/O(1) per scan segment.
    """

    def step(carry, _):
        pred = cond_fun(carry)
        new = body_fun(carry)
        carry = jax.tree.map(lambda a, b: jax.numpy.where(pred, a, b), new, carry)
        return carry, None

    if remat:
        step = jax.checkpoint(step)
    out, _ = jax.lax.scan(step, init_val, None, length=max_steps)
    return out


def overwrite_with_bounded(max_steps: int, remat: bool = True):
    """Context manager: run solves with the bounded loop (for training)."""
    fn = functools.partial(
        _bounded_entry, max_steps=max_steps, remat=remat
    )
    return context_overwrite_while_loop(fn)


def _bounded_entry(cond_fun, body_fun, init_val, *, max_steps, remat):
    return bounded_while_loop(
        cond_fun, body_fun, init_val, max_steps=max_steps, remat=remat
    )
