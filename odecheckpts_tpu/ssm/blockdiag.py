"""Block-diagonal square-root state-space backend.

One independent (n, n) covariance factor AND one output scale per ODE
dimension -- probdiffeq ships this factorization family alongside isotropic/
dense (SURVEY.md section 2: "probdiffeq also ships blockdiag/scalar, not
exercised here"); it matters when different state components evolve at very
different magnitudes.  Supports TS0 corrections.

Layout: mean (d, n), cholesky (d, n, n), output scale (d,).  Everything is
the per-dimension scalar filter batched over the leading d axis -- which is
exactly the layout TPUs want: the d axis vectorizes across lanes with no
cross-dimension reductions anywhere in the hot loop.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import linalg, prior
from .base import Conditional, Normal


@dataclasses.dataclass(frozen=True)
class BlockDiagSSM:
    num_derivatives: int
    ode_shape: tuple

    name = "blockdiag"

    @property
    def n(self):
        return self.num_derivatives + 1

    @property
    def d(self):
        (d,) = self.ode_shape
        return d

    # -- state construction ------------------------------------------------

    def stack_tcoeffs(self, tcoeffs):
        if len(tcoeffs) != self.n:
            raise ValueError(
                f"expected {self.n} Taylor coefficients, got {len(tcoeffs)}"
            )
        mean = jnp.stack(
            [jnp.broadcast_to(jnp.asarray(c).reshape(-1), (self.d,)) for c in tcoeffs],
            axis=-1,
        )  # (d, n)
        chol = jnp.zeros((self.d, self.n, self.n), mean.dtype)
        return Normal(mean, chol)

    def promote_output_scale(self, scale):
        return jnp.broadcast_to(jnp.asarray(scale), (self.d,))

    def qoi(self, mean):
        return mean[..., :, 0]

    def qoi_from_sample(self, sample):
        return sample[..., :, 0]

    def select_deriv(self, mean, i):
        return mean[..., :, i]

    def qoi_std(self, rv):
        return jnp.sqrt(jnp.sum(rv.cholesky[..., :, 0, :] ** 2, axis=-1))

    # -- extrapolation -------------------------------------------------------

    def _system(self, dtype):
        return prior.system_matrices(self.num_derivatives, dtype)

    def extrapolate_mean(self, mean, dt):
        a, _ = self._system(mean.dtype)
        p, p_inv = prior.preconditioner(dt, self.num_derivatives)
        m_pred = p[None, :] * jnp.einsum("ij,...dj->...di", a, p_inv[None, :] * mean)
        return m_pred, (p, p_inv)

    def extrapolate_cov(self, rv, m_pred, cache, output_scale, reversal):
        a, l_q = self._system(rv.mean.dtype)
        p, p_inv = cache
        l_bar = p_inv[None, :, None] * rv.cholesky  # (d, n, n)
        a_l = jnp.einsum("ij,...djk->...dik", a, l_bar)
        l_q_scaled = output_scale[..., :, None, None] * l_q[None, :, :]
        if not reversal:
            l_pred_bar = linalg.chol_from_stack(
                jnp.swapaxes(a_l, -1, -2), jnp.swapaxes(l_q_scaled, -1, -2)
            )
            return Normal(m_pred, p[None, :, None] * l_pred_bar), None
        l_pred_bar, gain_bar, l_bwd_bar = linalg.revert_markov(a_l, l_q_scaled, l_bar)
        l_pred = p[None, :, None] * l_pred_bar
        gain = (p[None, :, None] * gain_bar) * p_inv[None, None, :]
        noise_mean = rv.mean - jnp.einsum("...dij,...dj->...di", gain, m_pred)
        bwd = Conditional(gain, Normal(noise_mean, p[None, :, None] * l_bwd_bar))
        return Normal(m_pred, l_pred), bwd


    def extrapolate_direct(self, rv, dt, output_scale, reversal):
        """Unpreconditioned extrapolation (see isotropic.extrapolate_direct)."""
        phi = prior.phi_direct(dt, self.num_derivatives)
        p, _ = prior.preconditioner(dt, self.num_derivatives)
        _, l_q = self._system(rv.mean.dtype)
        q_chol = output_scale[..., :, None, None] * (p[:, None] * l_q)[None, :, :]
        m_pred = jnp.einsum("ij,...dj->...di", phi, rv.mean)
        a_l = jnp.einsum("ij,...djk->...dik", phi, rv.cholesky)
        if not reversal:
            l_pred = linalg.chol_from_stack(
                jnp.swapaxes(a_l, -1, -2), jnp.swapaxes(q_chol, -1, -2)
            )
            return Normal(m_pred, l_pred), None
        l_pred, gain, l_bwd = linalg.revert_markov(a_l, q_chol, rv.cholesky)
        noise_mean = rv.mean - jnp.einsum("...dij,...dj->...di", gain, m_pred)
        return Normal(m_pred, l_pred), Conditional(gain, Normal(noise_mean, l_bwd))

    # -- TS0 correction --------------------------------------------------------

    def error_and_scale_deriv(self, z, cache, o, unit="qoi"):
        """Per-dimension MLE scales sigma_i = |z_i| / s_unit and per-dimension
        error estimates in solution units (see isotropic backend docstring)."""
        _, l_q = self._system(z.dtype)
        p, _ = cache
        s_unit = p[o] * jnp.sqrt(jnp.sum(l_q[o, :] ** 2))
        sigma = jnp.abs(z) / s_unit  # (d,)
        if unit == "residual":
            return sigma, sigma * s_unit
        err_u = sigma * p[0] * jnp.sqrt(jnp.sum(l_q[0, :] ** 2))
        return sigma, err_u

    def correct_deriv(self, rv, z, o):
        l = rv.cholesky  # (d, n, n)
        l_obs = l[..., :, o, :]  # (d, n)
        s2 = jnp.sum(l_obs**2, axis=-1)  # (d,)
        s = jnp.sqrt(s2)
        crosscov = jnp.einsum("...dij,...dj->...di", l, l_obs)  # (d, n)
        gain = crosscov / s2[..., :, None]
        mean = rv.mean - gain * z[..., :, None]
        chol = l - gain[..., :, :, None] * l_obs[..., :, None, :]
        return Normal(mean, chol), Normal(z, s)

    # -- conditionals ---------------------------------------------------------

    def identity_conditional(self, dtype):
        eye = jnp.broadcast_to(jnp.eye(self.n, dtype=dtype), (self.d, self.n, self.n))
        noise = Normal(
            jnp.zeros((self.d, self.n), dtype),
            jnp.zeros((self.d, self.n, self.n), dtype),
        )
        return Conditional(eye, noise)

    def marginalize(self, rv, cond):
        mean = jnp.einsum("...dij,...dj->...di", cond.matrix, rv.mean) + cond.noise.mean
        chol = linalg.chol_from_stack(
            jnp.swapaxes(cond.matrix @ rv.cholesky, -1, -2),
            jnp.swapaxes(cond.noise.cholesky, -1, -2),
        )
        return Normal(mean, chol)

    def compose(self, outer, inner):
        matrix = outer.matrix @ inner.matrix
        mean = (
            jnp.einsum("...dij,...dj->...di", outer.matrix, inner.noise.mean)
            + outer.noise.mean
        )
        chol = linalg.chol_from_stack(
            jnp.swapaxes(outer.matrix @ inner.noise.cholesky, -1, -2),
            jnp.swapaxes(outer.noise.cholesky, -1, -2),
        )
        return Conditional(matrix, Normal(mean, chol))

    # -- data observation ------------------------------------------------------

    def condition_qoi(self, rv, data, obs_std):
        l = rv.cholesky
        l0 = l[..., :, 0, :]  # (d, n)
        s2 = jnp.sum(l0**2, axis=-1) + obs_std**2
        s = jnp.sqrt(s2)
        crosscov = jnp.einsum("...dij,...dj->...di", l, l0)
        gain = crosscov / s2[..., :, None]
        resid = rv.mean[..., :, 0] - data
        mean = rv.mean - gain * resid[..., :, None]
        beta = (1.0 / (s * (s + obs_std)))[..., :, None, None]
        chol = l - beta * crosscov[..., :, :, None] * l0[..., :, None, :]
        loglik = jnp.sum(
            -0.5 * resid**2 / s2 - jnp.log(s) - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
        )
        return loglik, Normal(mean, chol)

    # -- sampling -------------------------------------------------------------

    def base_shape(self):
        return (self.d, self.n)

    def transform_base(self, rv, xi):
        return rv.mean + jnp.einsum("dij,...dj->...di", rv.cholesky, xi)

    def conditional_sample(self, cond, x, xi):
        return (
            jnp.einsum("dij,...dj->...di", cond.matrix, x)
            + cond.noise.mean
            + jnp.einsum("dij,...dj->...di", cond.noise.cholesky, xi)
        )

    def rescale_cholesky(self, tree_chol, factor):
        # factor: (d,) broadcast onto (..., d, n, n)
        return tree_chol * factor[..., :, None, None]
