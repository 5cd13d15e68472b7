"""Numerics-equivalence gate for the Pallas kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import pallas_kernels


@pytest.mark.parametrize("shape", [(130, 10, 5), (128, 6, 6), (64, 4, 2)])
def test_batched_qr_matches_reference(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    r_ref = pallas_kernels.batched_qr_r_reference(x)
    r_pal = pallas_kernels.batched_qr_r(x, interpret=True)
    assert r_pal.shape == r_ref.shape
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=2e-5)
    # gram matrices must match exactly enough
    g_ref = np.einsum("bij,bik->bjk", np.asarray(x), np.asarray(x))
    g_pal = np.einsum("bij,bik->bjk", np.asarray(r_pal), np.asarray(r_pal))
    np.testing.assert_allclose(g_pal, g_ref, atol=2e-4)
