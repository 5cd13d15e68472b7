"""Isotropic square-root state-space backend.

One shared (n, n) covariance factor across all d ODE dimensions -- the cheap
backend the reference selects for every large problem (Brusselator with
ode_shape=(2N,): /root/reference/experiments/4_brusselator/run.py:51; the
facade default: /root/reference/src/odecheckpts/ivpsolvers.py:32).

TPU notes: the mean is laid out (n, d) so extrapolation is an (n, n) x (n, d)
matmul -- MXU-shaped when d is large (Brusselator d=1024) and trivially
batchable when thousands of IVPs are vmapped.  All covariance work is on
(n, n) with n = nu+1 <= 9 and uses the unrolled-Householder QR path.
Corrections are rank-1 Potter-style updates: no QR in the correct step at all.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import linalg, prior
from .base import Conditional, Normal


@dataclasses.dataclass(frozen=True)
class IsotropicSSM:
    num_derivatives: int
    ode_shape: tuple

    name = "isotropic"

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
            [jnp.broadcast_to(jnp.asarray(c).reshape(-1), (self.d,)) for c in tcoeffs]
        )
        chol = jnp.zeros((self.n, self.n), mean.dtype)
        return Normal(mean, chol)

    def promote_output_scale(self, scale):
        return jnp.asarray(scale)

    def qoi(self, mean):
        return mean[..., 0, :]

    def qoi_from_sample(self, sample):
        return sample[..., 0, :]

    def select_deriv(self, mean, i):
        return mean[..., i, :]

    def qoi_std(self, rv):
        s = jnp.sqrt(jnp.sum(rv.cholesky[..., 0, :] ** 2, axis=-1))
        return jnp.broadcast_to(s[..., None], rv.mean.shape[:-2] + (self.d,))

    # -- extrapolation (IBM prior) ------------------------------------------

    def _system(self, dtype):
        return prior.system_matrices(self.num_derivatives, dtype)

    def extrapolate_mean(self, mean, dt):
        a, _ = self._system(mean.dtype)
        p, p_inv = prior.preconditioner(dt, self.num_derivatives)
        m_pred = p[:, None] * (a @ (p_inv[:, None] * mean))
        return m_pred, (p, p_inv)

    def extrapolate_cov(self, rv, m_pred, cache, output_scale, reversal):
        a, l_q = self._system(rv.mean.dtype)
        p, p_inv = cache
        l_bar = p_inv[:, None] * rv.cholesky
        a_l = a @ l_bar
        l_q_scaled = output_scale * l_q
        if not reversal:
            l_pred_bar = linalg.chol_from_stack(
                jnp.swapaxes(a_l, -1, -2), jnp.swapaxes(l_q_scaled, -1, -2)
            )
            return Normal(m_pred, p[:, None] * l_pred_bar), None
        l_pred_bar, gain_bar, l_bwd_bar = linalg.revert_markov(a_l, l_q_scaled, l_bar)
        l_pred = p[:, None] * l_pred_bar
        gain = (p[:, None] * gain_bar) * p_inv[None, :]
        noise_mean = rv.mean - gain @ m_pred
        bwd = Conditional(gain, Normal(noise_mean, p[:, None] * l_bwd_bar))
        return Normal(m_pred, l_pred), bwd


    def extrapolate_direct(self, rv, dt, output_scale, reversal):
        """Extrapolation in unpreconditioned coordinates (interpolation path).

        Exact same semantics as extrapolate_mean + extrapolate_cov, but formed
        from Phi(dt) and chol(Q(dt)) = P Lq directly: no P^{-1} appears, so no
        roundoff amplification when the state covariance dwarfs Q(dt) (short
        sub-intervals inside long accepted steps); see prior.phi_direct.
        """
        phi = prior.phi_direct(dt, self.num_derivatives)
        p, _ = prior.preconditioner(dt, self.num_derivatives)
        _, l_q = self._system(rv.mean.dtype)
        q_chol = output_scale * (p[:, None] * l_q)
        m_pred = phi @ rv.mean
        a_l = phi @ rv.cholesky
        if not reversal:
            l_pred = linalg.chol_from_stack(
                jnp.swapaxes(a_l, -1, -2), jnp.swapaxes(q_chol, -1, -2)
            )
            return Normal(m_pred, l_pred), None
        l_pred, gain, l_bwd = linalg.revert_markov(a_l, q_chol, rv.cholesky)
        noise_mean = rv.mean - gain @ m_pred
        return Normal(m_pred, l_pred), Conditional(gain, Normal(noise_mean, l_bwd))

    # -- TS0 correction -------------------------------------------------------

    def error_and_scale_deriv(self, z, cache, o, unit="qoi"):
        """Local MLE output scale and error estimate from the TS0 residual.

        Residual model: z ~ N(0, sigma^2 * (H Q_unit H^T)) with
        H Q^{1/2} = p_o * Lq_bar[o, :] in preconditioned coordinates, so
        sigma_hat = ||z|| / (s_unit sqrt(d)).

        The step-control error estimate lives in *solution units*: the
        calibrated process-noise standard deviation of the u-component,
        err = sigma_hat * sqrt(Q(dt)_00) = sigma_hat * p_0 * ||Lq[0, :]||.
        Its magnitude scales as dt^(nu+1) -- matching the controller's
        error_contraction_rate = nu+1 and the atol + rtol|u| normalization.
        """
        _, l_q = self._system(z.dtype)
        p, _ = cache
        s_unit = p[o] * jnp.sqrt(jnp.sum(l_q[o, :] ** 2))
        sigma = jnp.sqrt(jnp.sum(z**2)) / (s_unit * jnp.sqrt(1.0 * self.d))
        if unit == "residual":
            err = sigma * s_unit  # = ||z|| / sqrt(d): u^(o)-unit residual
        else:
            err = sigma * p[0] * jnp.sqrt(jnp.sum(l_q[0, :] ** 2))
        return sigma, jnp.broadcast_to(err, (self.d,))

    def correct_deriv(self, rv, z, o):
        """Exact constraint update on the o-th derivative (EK0 / TS0).

        Rank-1 factor update (no QR): with c = Sigma e_o and s^2 = Sigma_oo,
        L_cor = L - (c/s^2) l_obs is an exact square root of the corrected
        covariance; see the derivation in SURVEY.md section 7 / arXiv:2208.06452.
        """
        l = rv.cholesky
        l_obs = l[..., o, :]
        s2 = jnp.sum(l_obs**2, axis=-1)
        s = jnp.sqrt(s2)
        crosscov = l @ l_obs[..., None]  # (..., n, 1)
        gain = crosscov[..., 0] / s2[..., None]  # (..., n)
        mean = rv.mean - gain[..., :, None] * z[..., None, :]
        chol = l - gain[..., :, None] * l_obs[..., None, :]
        return Normal(mean, chol), Normal(z, s)

    # -- conditionals ---------------------------------------------------------

    def identity_conditional(self, dtype):
        eye = jnp.eye(self.n, dtype=dtype)
        noise = Normal(
            jnp.zeros((self.n, self.d), dtype), jnp.zeros((self.n, self.n), dtype)
        )
        return Conditional(eye, noise)

    def marginalize(self, rv, cond):
        mean = cond.matrix @ rv.mean + cond.noise.mean
        chol = linalg.chol_from_stack(
            jnp.swapaxes(cond.matrix @ rv.cholesky, -1, -2),
            jnp.swapaxes(cond.noise.cholesky, -1, -2),
        )
        return Normal(mean, chol)

    def compose(self, outer, inner):
        """Conditional composition: outer(inner(x)), both backward-in-time."""
        matrix = outer.matrix @ inner.matrix
        mean = outer.matrix @ inner.noise.mean + outer.noise.mean
        chol = linalg.chol_from_stack(
            jnp.swapaxes(outer.matrix @ inner.noise.cholesky, -1, -2),
            jnp.swapaxes(outer.noise.cholesky, -1, -2),
        )
        return Conditional(matrix, Normal(mean, chol))

    # -- data observation (qoi + noise), used by stats.log_marginal_likelihood

    def condition_qoi(self, rv, data, obs_std):
        """Observe ``data = qoi(x) + N(0, obs_std^2 I_d)``; Potter update.

        Returns (gaussian log-likelihood of ``data``, conditioned state).
        """
        l = rv.cholesky
        l0 = l[..., 0, :]
        s2 = jnp.sum(l0**2, axis=-1) + obs_std**2
        s = jnp.sqrt(s2)
        crosscov = (l @ l0[..., None])[..., 0]
        gain = crosscov / s2
        resid = rv.mean[..., 0, :] - data
        mean = rv.mean - gain[..., :, None] * resid[..., None, :]
        beta = 1.0 / (s * (s + obs_std))
        chol = l - beta * crosscov[..., :, None] * l0[..., None, :]
        loglik = (
            -0.5 * jnp.sum(resid**2, axis=-1) / s2
            - self.d * jnp.log(s)
            - 0.5 * self.d * jnp.log(2.0 * jnp.pi)
        )
        return loglik, Normal(mean, chol)

    # -- sampling -------------------------------------------------------------

    def base_shape(self):
        return (self.n, self.d)

    def transform_base(self, rv, xi):
        return rv.mean + rv.cholesky @ xi

    def conditional_sample(self, cond, x, xi):
        return cond.matrix @ x + cond.noise.mean + cond.noise.cholesky @ xi

    def rescale_cholesky(self, tree_chol, factor):
        return tree_chol * factor
