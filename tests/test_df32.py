"""df32 pair arithmetic vs a float64 oracle.

Each op runs on f32 pairs built from f64 values; the collapsed result must
match the f64 computation to ~2^-45 relative -- far beyond plain f32
(2^-24), which the "beats_plain_f32" test asserts explicitly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from odecheckpts_tpu import df32


def _pair_from_f64(x64):
    hi = np.asarray(x64, np.float32)
    lo = np.asarray(x64 - hi.astype(np.float64), np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _collapse64(pair):
    return np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)


@pytest.fixture()
def xy64():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2.0, 2.0, size=(512,))
    y = rng.uniform(-2.0, 2.0, size=(512,))
    return x, y


DF32_EPS = 2.0**-45  # pair precision with slop for the "sloppy" add


def test_two_sum_and_two_prod_are_error_free(xy64):
    x64, y64 = xy64
    a = jnp.asarray(x64, jnp.float32)
    b = jnp.asarray(y64, jnp.float32)
    s, e = df32.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact
    )
    p, e = df32.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact
    )


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_pair_pair_ops_match_f64(op, xy64):
    x64, y64 = xy64
    x, y = _pair_from_f64(x64), _pair_from_f64(y64)
    got = _collapse64(getattr(df32, op)(x, y))
    want = {"add": x64 + y64, "sub": x64 - y64, "mul": x64 * y64}[op]
    # for cancelling add/sub the achievable error scales with the OPERANDS
    # (the pair inputs only carry x to 2^-48 relative of |x|)
    scale = np.maximum(np.maximum(np.abs(want), np.abs(x64)), np.abs(y64)) + 1e-30
    assert np.max(np.abs(got - want) / scale) < DF32_EPS


@pytest.mark.parametrize("op", ["add1", "sub1", "mul1", "div1"])
def test_pair_scalar_ops_match_f64(op, xy64):
    x64, y64 = xy64
    x = _pair_from_f64(x64)
    b32 = jnp.asarray(y64, jnp.float32)
    b64 = np.asarray(b32, np.float64)  # the op sees the f32-rounded scalar
    got = _collapse64(getattr(df32, op)(x, b32))
    want = {
        "add1": x64 + b64, "sub1": x64 - b64,
        "mul1": x64 * b64, "div1": x64 / b64,
    }[op]
    scale = np.maximum(np.maximum(np.abs(want), np.abs(x64)), np.abs(b64)) + 1e-30
    assert np.max(np.abs(got - want) / scale) < DF32_EPS


def test_cancellation_chain_beats_plain_f32():
    """Sum 1 + k*eps - 1 over a long chain: pairs keep the tiny residual,
    plain f32 loses it entirely."""
    n = 1000
    inc = 3e-9
    acc = df32.wrap(jnp.ones((4,), jnp.float32))
    plain = jnp.ones((4,), jnp.float32)
    for _ in range(n):
        acc = df32.add1(acc, jnp.float32(inc))
        plain = plain + jnp.float32(inc)
    acc = df32.sub1(acc, jnp.float32(1.0))
    want = n * float(np.float64(np.float32(inc)))
    got = float(_collapse64(acc)[0])
    # error scales with the ACCUMULATOR magnitude (1.0): ~n * 2^-54 << 1e-12
    assert abs(got - want) < 1e-12
    plain_err = abs(float(plain[0]) - 1.0 - want)
    assert plain_err > 1e-3 * want  # plain f32 loses most of the residual


def test_time_axis_accumulation_pattern():
    """t += dt over 5000 steps of 0.0123 stays ~2^-45-accurate (the solver's
    time-axis use case; plain f32 drifts ~1e-4 absolute)."""
    dt = jnp.float32(0.0123)
    t = df32.wrap(jnp.zeros((1,), jnp.float32))
    for _ in range(5000):
        t = df32.add1(t, dt)
    want = 5000 * float(np.float64(np.float32(0.0123)))
    assert abs(float(_collapse64(t)[0]) - want) < 1e-8


def test_f64_pairs_give_double_double():
    """The same ops on f64 pairs hit ~2^-90: dtype polymorphism (used as the
    oracle mode in the hi-precision driver tests)."""
    rng = np.random.default_rng(1)
    x = rng.uniform(1.0, 2.0, size=(64,))
    y = rng.uniform(1.0, 2.0, size=(64,))
    xx = (jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    yy = (jnp.asarray(y), jnp.zeros_like(jnp.asarray(y)))
    hi, lo = df32.mul(xx, yy)
    # hi alone is the correctly-rounded f64 product; lo carries the residue
    np.testing.assert_array_equal(np.asarray(hi), x * y)
