"""Fused lanes-last parallel-prefix for the sqrt parallel-in-time elements.

``jax.lax.associative_scan`` over the sqrt filtering elements
(parallel_time._combine_sqrt) lowers each tree level into dozens of tiny
batched (m, m) matmul/QR kernels (m = 5 for the isotropic nu=4 state) --
the same launch-overhead-bound fragmentation the fused step engines in
``batched.py`` solved with the lanes-last layout.  This module provides the
equivalent treatment for the prefix combine:

* every element field carries the STEP axis as its last (128-lane)
  dimension -- (m, m, P) transition/covariance factors, (m, c, P) mean
  columns -- so each combine is a handful of full-width VPU broadcasts
  instead of P tiny matrix ops;
* the prefix runs as a Kogge-Stone scan: ceil(log2(P)) levels, each ONE
  full-width lanes-last combine.  In vector form every level costs one
  full-width combine regardless of the scan algorithm, so Kogge-Stone
  (log2 P levels) strictly beats the work-efficient two-pass tree
  (2 log2 P levels) here;
* ``engine="pallas"`` additionally fuses each level's combine into a single
  Mosaic kernel (the shift/select between levels stays at the XLA level,
  where it fuses into the operand copies).

Semantics match ``parallel_time._combine_sqrt`` exactly up to orthogonal
right-factors of (U, Z) (QR sign/rotation freedom; all consumers read the
factors through their Grams), verified by tests/test_parallel_in_time.py.

Reference anchor: this replaces the hot loop behind the paper-adjacent
parallel-in-time option (SURVEY.md section 5 "long-context" stretch goal);
the reference itself has no parallel-in-time code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .batched import _qr_r_cols, _matmul_ll


def _mat(a, b):
    """(m, k, B) @ (k, l, B) lanes-last matmul (unrolled broadcast-sum)."""
    return _matmul_ll(a, b, a.shape[1])


def _swap(a):
    return jnp.swapaxes(a, 0, 1)


def _psolve_ll(r, x):
    """Solve (R^T R) Y = X for upper-triangular (m, m, B) R, X (m, k, B).

    Forward substitution with R^T, then backward with R -- the Gram-form
    solve the sqrt elements carry (parallel_time._psolve, lanes-last)."""
    m = r.shape[0]
    w = [None] * m
    for i in range(m):  # R^T w = x
        acc = x[i]
        for k in range(i):
            acc = acc - r[k, i][None, :] * w[k]
        w[i] = acc / r[i, i][None, :]
    out = [None] * m
    for i in reversed(range(m)):  # R y = w
        acc = w[i]
        for k in range(i + 1, m):
            acc = acc - r[i, k][None, :] * out[k]
        out[i] = acc / r[i, i][None, :]
    return jnp.stack(out, axis=0)


def _rsolve_upper_ll(x, r):
    """Y = X R^{-1} for upper-triangular (m, m, B) R, X (m, m, B):
    forward substitution over the columns of R (parallel_time._rsolve_upper,
    lanes-last)."""
    m = r.shape[0]
    cols = [None] * m
    for j in range(m):
        acc = jax.lax.slice_in_dim(x, j, j + 1, axis=1)[:, 0, :]  # (m, B)
        for k in range(j):
            acc = acc - cols[k] * r[k, j][None, :]
        cols[j] = acc / r[j, j][None, :]
    return jnp.stack(cols, axis=1)


def _qr_stacked(top_rows, bottom_rows, m):
    """R of the (2m, m) stack whose column c is [top_rows[c]; bottom_rows[c]]
    ((m, B) each); returns the (m, m, B) upper-triangular R."""
    cols = [
        jnp.concatenate([top_rows[c], bottom_rows[c]], axis=0)
        for c in range(m)
    ]
    cols = _qr_r_cols(cols, 2 * m, m)
    return jnp.stack([c[:m] for c in cols], axis=1)


def combine_sqrt_ll(e_i, e_j):
    """Lanes-last sqrt combination (parallel_time._combine_sqrt, with the
    step/pair axis as the trailing lane dimension).

    Elements are (A, b, U, eta, Z) with shapes (m, m, B), (m, c, B),
    (m, m, B), (m, c, B), (m, m, B); C = U U^T, J = Z Z^T.  Pure jnp
    (scatter-free one-hots, unrolled small-matrix loops), so it lowers both
    under XLA and inside a Mosaic kernel.
    """
    a_i, b_i, u_i, eta_i, z_i = e_i
    a_j, b_j, u_j, eta_j, z_j = e_j
    m = a_i.shape[0]
    dt = a_i.dtype

    uiT = _swap(u_i)
    zjT = _swap(z_j)
    mm = _mat(uiT, z_j)  # (m, m, B)
    mmT = _swap(mm)

    # one-hot identity rows for the [M; I] stacks (scatter-free: iota ==).
    # Rank-polymorphic: extra batch axes (blockdiag's per-dimension blocks)
    # may sit between the matrix dims and the trailing lane axis.
    rows_iota = jax.lax.broadcasted_iota(
        jnp.int32, (m,) + (1,) * (a_i.ndim - 2), 0
    )
    ones_b = jnp.ones_like(a_i[0, 0])[None]  # (1, *extra, B)
    eye_rows = [
        (rows_iota == c).astype(dt) * ones_b for c in range(m)
    ]  # each (m, B)

    # R1^T R1 = I + M M^T (QR of [M^T; I]); R2^T R2 = I + M^T M ([M; I])
    r1 = _qr_stacked([mmT[:, c, :] for c in range(m)], eye_rows, m)
    r2 = _qr_stacked([mm[:, c, :] for c in range(m)], eye_rows, m)

    # (I + C_i J_j)^{-1} x = x - U_i (R1^T R1)^{-1} M Z_j^T x
    zta = _mat(zjT, a_i)
    a = _mat(a_j, a_i) - _mat(_mat(a_j, u_i), _psolve_ll(r1, _mat(mm, zta)))
    x = b_i + _mat(u_i, _mat(uiT, eta_j))
    b = (
        _mat(a_j, x - _mat(u_i, _psolve_ll(r1, _mat(mm, _mat(zjT, x)))))
        + b_j
    )
    # (I + C_i J_j)^{-1} C_i = (U_i R1^{-1})(U_i R1^{-1})^T
    v = _rsolve_upper_ll(u_i, r1)
    ajv = _mat(a_j, v)
    u = _swap(_qr_stacked([ajv[c] for c in range(m)], [u_j[c] for c in range(m)], m))

    # dual side: (I + J_j C_i)^{-1} y = y - Z_j (R2^T R2)^{-1} M^T U_i^T y
    y0 = eta_j - _mat(z_j, _mat(zjT, b_i))
    eta = (
        _mat(_swap(a_i), y0 - _mat(z_j, _psolve_ll(r2, _mat(mmT, _mat(uiT, y0)))))
        + eta_i
    )
    y = _rsolve_upper_ll(z_j, r2)
    # column c of (y^T a_i) = row c of (a_i^T y)
    aty = _mat(_swap(a_i), y)
    z = _swap(_qr_stacked([aty[c] for c in range(m)], [z_i[c] for c in range(m)], m))
    return (a, b, u, eta, z)


def identity_element_ll(m, c, p, dtype, extra=()):
    """Neutral sqrt element broadcast over ``p`` lanes: x_k = x_{k-1}.

    ``extra``: batch axes between the matrix dims and the lane axis
    (blockdiag's per-dimension block axis)."""
    extra = tuple(extra)
    tail = (1,) * (len(extra) + 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (m, m) + tail, 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (m, m) + tail, 1)
    eye = jnp.broadcast_to(
        (rows_iota == cols_iota).astype(dtype), (m, m) + extra + (p,)
    )
    zmm = jnp.zeros((m, m) + extra + (p,), dtype)
    zmc = jnp.zeros((m, c) + extra + (p,), dtype)
    return (eye, zmc, zmm, zmc, zmm)


def _pallas_combine(m, c, lanes, interpret):
    """One full-width lanes-last combine as a single Mosaic kernel, tiled in
    ``lanes``-wide blocks along the trailing axis."""
    from jax.experimental import pallas as pl

    n_in = 10

    def kernel(*refs):
        ins = [r[...] for r in refs[:n_in]]
        outs = combine_sqrt_ll(tuple(ins[:5]), tuple(ins[5:]))
        for r, o in zip(refs[n_in:], outs):
            r[...] = o

    def call(e_i, e_j):
        operands = list(e_i) + list(e_j)
        p = operands[0].shape[-1]
        grid = (max(1, p // lanes),)

        def spec(arr):
            blk = arr.shape[:-1] + (min(lanes, p),)
            nd = arr.ndim
            return pl.BlockSpec(blk, lambda i, _nd=nd: (0,) * (_nd - 1) + (i,))

        out_shapes = [
            jax.ShapeDtypeStruct(o.shape, o.dtype) for o in operands[:5]
        ]
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(o) for o in operands],
            out_specs=[spec(o) for o in operands[:5]],
            out_shape=out_shapes,
            interpret=interpret,
        )(*operands)
        return tuple(res)

    return call


def prefix_scan_sqrt_ll(els_ll, *, engine="xla", lanes=512, interpret=False):
    """Inclusive prefix of lanes-last sqrt elements under ``combine_sqrt_ll``.

    ``els_ll``: (A, b, U, eta, Z) with trailing step axis P.  Kogge-Stone:
    level s combines each element with its s-left neighbour (identity fill),
    so prefix[i] accumulates elements [0..i] after ceil(log2 P) levels.
    ``engine="pallas"`` runs each level's combine as one Mosaic kernel
    (requires P padded to the 128-lane tile; handled here).
    ``engine="xla-scan"`` runs the levels under ``lax.scan`` with a traced
    shift (gather instead of static slice): the combine body appears in the
    program once, not ceil(log2 P) times — the compile-size fix for the
    x64-emulated stiff solves (9.2k vs 70-86k jaxpr eqns at the VdP
    TS1(4) dense shapes; exposed as ``combine_engine="ll-scan"``).
    """
    a = els_ll[0]
    p0 = a.shape[-1]
    m, c = els_ll[1].shape[0], els_ll[1].shape[1]
    extra = a.shape[2:-1]  # blockdiag block axes, if any
    dtype = a.dtype

    pad = 0
    if engine == "pallas":
        tile = min(lanes, max(128, 128 * ((p0 + 127) // 128)))
        pad = (-p0) % min(tile, 128)
    if pad:
        idp = identity_element_ll(m, c, pad, dtype, extra)
        els_ll = tuple(
            jnp.concatenate([e, i], axis=-1) for e, i in zip(els_ll, idp)
        )
    p = p0 + pad

    if engine == "pallas":
        combine = _pallas_combine(m, c, min(lanes, p), interpret)
    else:
        combine = combine_sqrt_ll

    ident = identity_element_ll(m, c, p, dtype, extra)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p), 2)

    if engine == "xla-scan":
        # lax.scan over the Kogge-Stone levels with the shift as a TRACED
        # per-level value: the combine body lands in the program ONCE
        # instead of ceil(log2 P) times.  The x64-emulated parallel-in-time
        # programs are compile-bound through the TPU relay (measured: the
        # stiff VdP w=1024 program is ~86k jaxpr equations, ~8k PER LEVEL,
        # vs 837 for the sequential solve; its relay compile exceeded 85
        # minutes) — the shift becomes a gather instead of a static slice,
        # a rounding error next to the per-level stacked QRs.
        import numpy as _np

        n_levels = max(int(_np.ceil(_np.log2(p))), 0) if p > 1 else 0
        shifts = jnp.asarray(
            [1 << lv for lv in range(n_levels)], jnp.int32
        )
        lanes_1d = jnp.arange(p, dtype=jnp.int32)

        def _level(pre, s):
            idx = jnp.maximum(lanes_1d - s, 0)
            mask = lane_iota >= s
            shifted = tuple(
                jnp.where(mask, jnp.take(x, idx, axis=-1), i_el)
                for x, i_el in zip(pre, ident)
            )
            new = combine_sqrt_ll(shifted, pre)
            pre = tuple(
                jnp.where(mask, nw, old) for nw, old in zip(new, pre)
            )
            return pre, None

        pre, _ = jax.lax.scan(_level, els_ll, shifts)
        if pad:
            pre = tuple(
                jax.lax.slice_in_dim(x, 0, p0, axis=-1) for x in pre
            )
        return pre

    pre = els_ll
    s = 1
    while s < p:
        shifted = tuple(
            jnp.concatenate(
                [
                    jax.lax.slice_in_dim(i_el, 0, s, axis=-1),
                    jax.lax.slice_in_dim(x, 0, p - s, axis=-1),
                ],
                axis=-1,
            )
            for x, i_el in zip(pre, ident)
        )
        new = combine(shifted, pre)
        mask = lane_iota >= s
        pre = tuple(jnp.where(mask, nw, old) for nw, old in zip(new, pre))
        s *= 2
    if pad:
        pre = tuple(jax.lax.slice_in_dim(x, 0, p0, axis=-1) for x in pre)
    return pre


def prefix_scan_sqrt(els, *, engine="xla", lanes=512, interpret=False):
    """Step-axis-leading convenience wrapper: elements (P, m, m)/(P, m, c)
    in, inclusive prefixes in the same layout out."""
    els_ll = tuple(jnp.moveaxis(e, 0, -1) for e in els)
    pre = prefix_scan_sqrt_ll(
        els_ll, engine=engine, lanes=lanes, interpret=interpret
    )
    return tuple(jnp.moveaxis(e, -1, 0) for e in pre)


# ---------------------------------------------------------------------------
# fused ELEMENT BUILD + MARGINAL (round 4): the per-sweep work around the
# prefix — constructing each step's sqrt element from (Phi, Qc, H, v) and
# pushing the window-start state through the prefixes — carries the same
# tiny-(m, m)-kernel fragmentation the combine had.  Both are pure
# small-matrix algebra, so they reuse the lanes-last primitives verbatim.
# Semantics mirror parallel_time._element_sqrt / _marginal_from_prefix_sqrt
# exactly up to orthogonal right-factors of (U, Z) and f32 rounding.


def _eye_ll(m, dtype, like):
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m) + (1,) * (like.ndim - 2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m) + (1,) * (like.ndim - 2), 1)
    return (rows == cols).astype(dtype)


def element_sqrt_ll(phi, qc, h, v, drift=None):
    """Lanes-last sqrt filtering elements: one call builds ALL steps.

    Shapes (B = step/lane axis): ``phi``/``qc`` (m, m, B), ``h`` (r, m, B),
    ``v`` (r, c, B), ``drift`` (m, c, B) or None.  Returns the
    (A, b, U, eta, Z) tuple of parallel_time._element_sqrt with trailing B.
    """
    m = phi.shape[0]
    r = h.shape[0]
    g = _mat(h, qc)  # (r, m, B): S = g g^T
    # R_s: upper (r, r, B) of the (m, r, B) stack g^T
    gT = _swap(g)
    r_s = jnp.stack(
        _qr_r_cols([gT[:, c] for c in range(r)], m, r), axis=1
    )[:r]
    k_gain = _mat(qc, _swap(_psolve_ll(r_s, g)))  # (m, r, B)
    i_kh = _eye_ll(m, phi.dtype, phi) - _mat(k_gain, h)
    a = _mat(i_kh, phi)
    if drift is None:
        b = _mat(k_gain, v)
        v_eff = v
    else:
        b = _mat(i_kh, drift) + _mat(k_gain, v)
        v_eff = v - _mat(h, drift)
    u = _mat(i_kh, qc)
    z_r = _rsolve_upper_ll(_mat(_swap(phi), _swap(h)), r_s)  # (m, r, B)
    if r < m:
        z = jnp.concatenate(
            [z_r, jnp.zeros((m, m - r) + z_r.shape[2:], phi.dtype)], axis=1
        )
    else:
        z = z_r
    eta = _mat(_swap(phi), _mat(_swap(h), _psolve_ll(r_s, v_eff)))
    return (a, b, u, eta, z)


def marginal_sqrt_ll(prefix, m0c, w0):
    """Lanes-last window marginals: N(m0, W0 W0^T) through every prefix.

    ``prefix``: lanes-last element tuple ((m, m, B), (m, c, B), ...);
    ``m0c`` (m, c) and ``w0`` (m, m) are the window-start state (shared
    across lanes).  Returns (means (m, c, B), lower factors (m, m, B))."""
    a, b, u, eta, z = prefix
    m = a.shape[0]
    dt = a.dtype
    m0l = m0c[..., None]
    w0l = w0[..., None]
    ones_b = jnp.ones_like(a[0, 0])[None]  # (1, B)
    rows_iota = jax.lax.broadcasted_iota(
        jnp.int32, (m,) + (1,) * (a.ndim - 2), 0
    )
    eye_rows = [(rows_iota == c).astype(dt) * ones_b for c in range(m)]

    m0w = _mat(_swap(w0l), z)  # (m, m, B): W0^T Z_k
    # R0^T R0 = I + (W0^T Z)(W0^T Z)^T via the [m0w^T; I] stack
    r0 = _qr_stacked([m0w[c] for c in range(m)], eye_rows, m)
    innov = eta - _mat(z, _mat(_swap(z), m0l))  # (m, c, B)
    m0_upd = m0l + _mat(w0l, _psolve_ll(r0, _mat(_swap(w0l), innov)))
    v0 = _rsolve_upper_ll(w0l * ones_b[None], r0)  # (m, m, B)
    mean = _mat(a, m0_upd) + b
    av = _mat(a, v0)
    chol = _swap(
        _qr_stacked([av[c] for c in range(m)], [u[c] for c in range(m)], m)
    )
    return mean, chol
