"""Dense square-root state-space backend.

Full (n*d, n*d) covariance factor -- the backend the reference selects for the
stiff Van der Pol study where cross-derivative correlations matter
(/root/reference/experiments/1_van_der_pol/vdp.py:61, ``impl.select("dense",
ode_shape=(1,))``) and the only backend that supports first-order (TS1 / EK1)
linearization.

Layout: derivative-major flat state ``x = (u^(0), u^(1), ..., u^(nu))`` with
each ``u^(i)`` a d-block, so ``x[i*d + k] = u^(i)_k``.  The IBM transition is
``kron(A, I_d)`` and is applied via reshape/einsum (never materializing the
Kronecker product for the mean path); the preconditioner is ``repeat(p, d)``.
Corrections use the single-QR revert (linalg.revert_observation).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import linalg, prior
from .base import Conditional, Normal


@dataclasses.dataclass(frozen=True)
class DenseSSM:
    num_derivatives: int
    ode_shape: tuple

    name = "dense"

    @property
    def n(self):
        return self.num_derivatives + 1

    @property
    def d(self):
        (d,) = self.ode_shape
        return d

    @property
    def ndim(self):
        return self.n * self.d

    # -- state construction ------------------------------------------------

    def stack_tcoeffs(self, tcoeffs):
        if len(tcoeffs) != self.n:
            raise ValueError(
                f"expected {self.n} Taylor coefficients, got {len(tcoeffs)}"
            )
        mean = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(c).reshape(-1), (self.d,)) for c in tcoeffs]
        )
        chol = jnp.zeros((self.ndim, self.ndim), mean.dtype)
        return Normal(mean, chol)

    def promote_output_scale(self, scale):
        return jnp.asarray(scale)

    def qoi(self, mean):
        return mean[..., : self.d]

    def qoi_from_sample(self, sample):
        return sample[..., : self.d]

    def select_deriv(self, mean, i):
        return mean[..., i * self.d : (i + 1) * self.d]

    def qoi_std(self, rv):
        block = rv.cholesky[..., : self.d, :]
        return jnp.sqrt(jnp.sum(block**2, axis=-1))

    # -- extrapolation (IBM prior) ------------------------------------------

    def _system(self, dtype):
        return prior.system_matrices(self.num_derivatives, dtype)

    def _precond(self, dt):
        p, p_inv = prior.preconditioner(dt, self.num_derivatives)
        return jnp.repeat(p, self.d), jnp.repeat(p_inv, self.d)

    def _apply_a(self, a, x, matrix: bool):
        """kron(A, I_d) @ x for x of shape (..., nd) or, if matrix, (..., nd, m)."""
        if matrix:
            lead, m = x.shape[:-2], x.shape[-1]
            xr = x.reshape(lead + (self.n, self.d, m))
            out = jnp.einsum("ij,...jdm->...idm", a, xr)
            return out.reshape(lead + (self.ndim, m))
        lead = x.shape[:-1]
        xr = x.reshape(lead + (self.n, self.d))
        out = jnp.einsum("ij,...jd->...id", a, xr)
        return out.reshape(lead + (self.ndim,))

    def extrapolate_mean(self, mean, dt):
        a, _ = self._system(mean.dtype)
        p, p_inv = self._precond(dt)
        m_pred = p * self._apply_a(a, p_inv * mean, matrix=False)
        return m_pred, (p, p_inv)

    def _l_q_dense(self, dtype, scale):
        _, l_q = self._system(dtype)
        return jnp.kron(scale * l_q, jnp.eye(self.d, dtype=dtype))

    def extrapolate_cov(self, rv, m_pred, cache, output_scale, reversal):
        a, _ = self._system(rv.mean.dtype)
        p, p_inv = cache
        l_bar = p_inv[:, None] * rv.cholesky
        a_l = self._apply_a(a, l_bar, matrix=True)
        l_q_scaled = self._l_q_dense(rv.mean.dtype, output_scale)
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
        """Unpreconditioned extrapolation (see isotropic.extrapolate_direct)."""
        phi = prior.phi_direct(dt, self.num_derivatives)
        p_scal, _ = prior.preconditioner(dt, self.num_derivatives)
        _, l_q = self._system(rv.mean.dtype)
        q_chol = jnp.kron(
            output_scale * (p_scal[:, None] * l_q),
            jnp.eye(self.d, dtype=rv.mean.dtype),
        )
        m_pred = self._apply_a(phi, rv.mean, matrix=False)
        a_l = self._apply_a(phi, rv.cholesky, matrix=True)
        if not reversal:
            l_pred = linalg.chol_from_stack(
                jnp.swapaxes(a_l, -1, -2), jnp.swapaxes(q_chol, -1, -2)
            )
            return Normal(m_pred, l_pred), None
        l_pred, gain, l_bwd = linalg.revert_markov(a_l, q_chol, rv.cholesky)
        noise_mean = rv.mean - (gain @ m_pred[..., None])[..., 0]
        return Normal(m_pred, l_pred), Conditional(gain, Normal(noise_mean, l_bwd))

    # -- TS0/TS1 corrections ---------------------------------------------------

    def h_q_unit(self, cache, o, jacobians):
        """(d, nd) factor ``H Q_unit^{1/2}`` of the local residual model.

        ``jacobians``: tuple of (d, d) Jacobians of the vector field w.r.t.
        each of the first ``o`` derivatives (empty for TS0).  In preconditioned
        coordinates ``Q^{1/2} = P kron(Lq, I)``, so block j of H Q^{1/2} is
        ``p_o Lq[o, j] I - sum_k p_k Lq[k, j] J_k``.
        """
        p, _ = cache
        _, l_q = self._system(p.dtype)
        p_scal = p[:: self.d]  # undo the repeat: p for each derivative index
        eye = jnp.eye(self.d, dtype=p.dtype)
        blocks = p_scal[o] * l_q[o, :][:, None, None] * eye[None, :, :]
        for k, jac in enumerate(jacobians):
            blocks = blocks - p_scal[k] * l_q[k, :][:, None, None] * jac[None, :, :]
        # blocks: (n, d, d) with blocks[j] = column-block j -> (d, nd)
        return jnp.swapaxes(blocks, 0, 1).reshape(self.d, self.ndim)

    def error_and_scale(self, z, h_q, cache, unit="qoi"):
        """sigma_hat = sqrt(z^T S^{-1} z / d) with S = (H Q^{1/2})(H Q^{1/2})^T.

        As in the isotropic backend, the step-control error estimate is the
        calibrated process-noise std of the u-components,
        err_i = sigma_hat * sqrt(Q(dt)_{ii}) = sigma_hat * p_0 * ||Lq[0, :]||
        (identical across i by the Kronecker structure): order dt^(nu+1).
        """
        p, _ = cache
        _, l_q = self._system(p.dtype)
        r_s = linalg.qr_r(jnp.swapaxes(h_q, -1, -2))  # (d, d) upper, R^T R = S
        white = linalg.tri_solve_lower(jnp.swapaxes(r_s, -1, -2), z[..., None])
        sigma = jnp.sqrt(jnp.sum(white**2) / self.d)
        if unit == "residual":
            err = sigma * jnp.sqrt(jnp.sum(r_s**2, axis=-2))  # sqrt(diag S)
            return sigma, err
        err_u = sigma * p[0] * jnp.sqrt(jnp.sum(l_q[0, :] ** 2))
        return sigma, jnp.broadcast_to(err_u, (self.d,))

    def correct_affine(self, rv, z, h_l):
        """Noise-free affine correction given ``h_l = H @ L`` and residual z."""
        l_obs, gain, l_cor = linalg.revert_observation(rv.cholesky, h_l)
        mean = rv.mean - (gain @ z[..., None])[..., 0]
        return Normal(mean, l_cor), Normal(z, l_obs)

    def h_l_rows(self, chol, o, jacobians):
        """H @ L for H = E_o - sum_k J_k E_k (the TS0/TS1 observation)."""
        h_l = chol[..., o * self.d : (o + 1) * self.d, :]
        for k, jac in enumerate(jacobians):
            h_l = h_l - jac @ chol[..., k * self.d : (k + 1) * self.d, :]
        return h_l

    # -- conditionals ---------------------------------------------------------

    def identity_conditional(self, dtype):
        eye = jnp.eye(self.ndim, dtype=dtype)
        noise = Normal(
            jnp.zeros((self.ndim,), dtype), jnp.zeros((self.ndim, self.ndim), dtype)
        )
        return Conditional(eye, noise)

    def marginalize(self, rv, cond):
        mean = (cond.matrix @ rv.mean[..., None])[..., 0] + cond.noise.mean
        chol = linalg.chol_from_stack(
            jnp.swapaxes(cond.matrix @ rv.cholesky, -1, -2),
            jnp.swapaxes(cond.noise.cholesky, -1, -2),
        )
        return Normal(mean, chol)

    def compose(self, outer, inner):
        matrix = outer.matrix @ inner.matrix
        mean = (outer.matrix @ inner.noise.mean[..., None])[..., 0] + outer.noise.mean
        chol = linalg.chol_from_stack(
            jnp.swapaxes(outer.matrix @ inner.noise.cholesky, -1, -2),
            jnp.swapaxes(outer.noise.cholesky, -1, -2),
        )
        return Conditional(matrix, Normal(mean, chol))

    # -- data observation ------------------------------------------------------

    def condition_qoi(self, rv, data, obs_std):
        l = rv.cholesky
        h_l = l[..., : self.d, :]
        l_noise = obs_std * jnp.eye(self.d, dtype=l.dtype)
        l_obs, gain, l_cor = linalg.revert_observation(l, h_l, l_noise)
        resid = rv.mean[..., : self.d] - data
        mean = rv.mean - (gain @ resid[..., None])[..., 0]
        white = linalg.tri_solve_lower(l_obs, resid[..., None])[..., 0]
        loglik = (
            -0.5 * jnp.sum(white**2, axis=-1)
            - linalg.tri_logdet(l_obs)
            - 0.5 * self.d * jnp.log(2.0 * jnp.pi)
        )
        return loglik, Normal(mean, l_cor)

    # -- sampling -------------------------------------------------------------

    def base_shape(self):
        return (self.ndim,)

    def transform_base(self, rv, xi):
        return rv.mean + (rv.cholesky @ xi[..., None])[..., 0]

    def conditional_sample(self, cond, x, xi):
        return (
            (cond.matrix @ x[..., None])[..., 0]
            + cond.noise.mean
            + (cond.noise.cholesky @ xi[..., None])[..., 0]
        )

    def rescale_cholesky(self, tree_chol, factor):
        return tree_chol * factor
