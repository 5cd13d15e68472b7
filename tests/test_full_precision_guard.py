"""Every adaptive driver must trace at full f32 matmul precision.

Regression guard: the ``@_full_precision`` decorator was silently dropped from
``solve_adaptive_save_at`` once (commit d7815fa) — invisible to the CPU-x64
suite, but on TPU the default bf16 matmul passes corrupt the error estimates
(observed: 17x step-count inflation; see the decorator's docstring in
``odecheckpts_tpu/ivpsolve.py``).  This test inspects the marker attribute the
decorator stamps, so ANY driver losing the guard fails loudly on CPU.

Parity note: the reference gets this guarantee for free from global x64
(/root/reference/experiments/2_workprec_simple/run_simple.py:19).
"""

import jax
import jax.numpy as jnp
import pytest

from odecheckpts_tpu import ivpsolve

GUARDED_DRIVERS = [
    "solve_adaptive_save_at",
    "solve_adaptive_terminal_values",
    "solve_adaptive_save_every_step",
    "solve_adaptive_save_every_step_bounded",
    "solve_fixed_grid",
]


@pytest.mark.parametrize("name", GUARDED_DRIVERS)
def test_driver_carries_full_precision_guard(name):
    fn = getattr(ivpsolve, name)
    assert getattr(fn, "__full_precision__", False), (
        f"{name} lost its @_full_precision decorator — on TPU this traces "
        "solver math at bf16 matmul precision and inflates adaptive step "
        "counts ~17x. Restore the decorator in odecheckpts_tpu/ivpsolve.py."
    )


def test_no_unguarded_solve_functions():
    """Any NEW public solve_* driver added to ivpsolve must be guarded too."""
    missing = [
        n
        for n in dir(ivpsolve)
        if n.startswith("solve_")
        and callable(getattr(ivpsolve, n))
        and not getattr(getattr(ivpsolve, n), "__full_precision__", False)
    ]
    assert not missing, (
        f"solve drivers without @_full_precision: {missing} — wrap them or "
        "explicitly exempt them here with a comment explaining why bf16 "
        "matmul passes are safe for that driver."
    )


def test_guard_actually_sets_matmul_precision():
    """The decorator must install float32 default matmul precision at trace time."""
    seen = {}

    @ivpsolve._full_precision
    def probe():
        seen["prec"] = jax.config.jax_default_matmul_precision
        return jnp.zeros(())

    probe()
    assert seen["prec"] == "float32"
