"""Matrix-valued constraint transforms.

Reference: ``prim/mat/fun/{cholesky_corr,cholesky_factor,corr_matrix,
cov_matrix}_constrain.hpp`` and ``read_corr_L.hpp``.  The reference's
sequential row/column loops become exclusive-cumprod formulations: for both
the row-major (cholesky_corr) and the C-vine column-major (corr_matrix)
orderings, the "remaining length" term is

    W[r, c] = prod_{l < c} (1 - Z[r, l]^2)   (Z strictly lower triangular)

so L = Z * sqrt(W) off-diagonal and diag(L) = sqrt(W[r, r]).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from math_tpu.special import log1m


def _tril_rowmajor(k: int):
    """Strict-lower-triangle indices in row-major order (Stan cholesky_corr)."""
    return np.tril_indices(k, -1)


def _tril_colmajor(k: int):
    """Strict-lower-triangle indices in column-major order (Stan C-vine CPCs)."""
    r, c = np.triu_indices(k, 1)
    return c, r


def _excl_cumprod(a):
    """Exclusive cumprod along the last axis: out[..., j] = prod_{l<j} a[..., l]."""
    return jnp.concatenate(
        [jnp.ones_like(a[..., :1]), jnp.cumprod(a[..., :-1], axis=-1)], axis=-1
    )


def _corr_chol_from_z(zmat):
    """L from a strictly-lower matrix of partial correlations z."""
    k = zmat.shape[-1]
    a = 1.0 - jnp.square(zmat)  # == 1 off the strict lower triangle (z=0 there)
    w = _excl_cumprod(a)
    tril_mask = jnp.tril(jnp.ones((k, k), dtype=bool), -1)
    low = jnp.where(tril_mask, zmat * jnp.sqrt(w), 0.0)
    diag = jnp.sqrt(jnp.diagonal(w, axis1=-2, axis2=-1))
    return low + jnp.zeros_like(low).at[..., np.arange(k), np.arange(k)].set(diag), w


# --- cholesky_corr (ref: cholesky_corr_constrain.hpp) -----------------------


def cholesky_corr_constrain(x, k: int):
    z = jnp.tanh(x)
    rows, cols = _tril_rowmajor(k)
    zmat = jnp.zeros(x.shape[:-1] + (k, k), dtype=x.dtype).at[..., rows, cols].set(z)
    return _corr_chol_from_z(zmat)[0]


def cholesky_corr_constrain_lp(x, k: int):
    z = jnp.tanh(x)
    rows, cols = _tril_rowmajor(k)
    zmat = jnp.zeros(x.shape[:-1] + (k, k), dtype=x.dtype).at[..., rows, cols].set(z)
    L, w = _corr_chol_from_z(zmat)
    # corr_constrain jacobian: sum log(1 - z^2)
    lp = jnp.sum(log1m(jnp.square(z)))
    # cholesky part (ref: cholesky_corr_constrain.hpp:70-73): for each row i,
    # columns j = 1..i-1 contribute 0.5*log(1 - sum_sqs) = 0.5*log W[i, j].
    jj, ii = np.meshgrid(np.arange(k), np.arange(k))
    mask = (jj >= 1) & (jj < ii)
    lp = lp + 0.5 * jnp.sum(jnp.where(mask, jnp.log(jnp.maximum(w, 1e-300)), 0.0))
    return L, lp


def cholesky_corr_free(L, k: int):
    """Invert: W[r,c] = 1 - sum_{l<c} L[r,l]^2, z = L/sqrt(W) (strict lower)."""
    L = jnp.asarray(L)
    s = jnp.concatenate(
        [
            jnp.zeros_like(L[..., :1]),
            jnp.cumsum(jnp.square(L[..., :-1]), axis=-1),
        ],
        axis=-1,
    )
    z = L / jnp.sqrt(jnp.maximum(1.0 - s, 1e-300))
    rows, cols = _tril_rowmajor(k)
    return jnp.arctanh(z[..., rows, cols])


# --- corr_matrix via C-vine CPCs (ref: corr_matrix_constrain, read_corr_L) --


def _read_corr_L(cpc_vec, k: int):
    rows, cols = _tril_colmajor(k)
    zmat = (
        jnp.zeros(cpc_vec.shape[:-1] + (k, k), dtype=cpc_vec.dtype)
        .at[..., rows, cols]
        .set(cpc_vec)
    )
    return _corr_chol_from_z(zmat)


def corr_matrix_constrain(x, k: int):
    L, _ = _read_corr_L(jnp.tanh(x), k)
    return L @ jnp.swapaxes(L, -1, -2)


def corr_matrix_constrain_lp(x, k: int):
    z = jnp.tanh(x)
    # corr_constrain jacobian per CPC
    lp = jnp.sum(log1m(jnp.square(z)))
    L, _ = _read_corr_L(z, k)
    # read_corr_L jacobian (ref: read_corr_L.hpp:95-102): CPC in 0-indexed
    # column c gets weight (K - c - 2); only columns 0..K-3 contribute.
    rows, cols = _tril_colmajor(k)
    wts = jnp.asarray(np.maximum(k - cols - 2, 0), dtype=z.dtype)
    lp = lp + 0.5 * jnp.sum(wts * log1m(jnp.square(z)))
    return L @ jnp.swapaxes(L, -1, -2), lp


def corr_matrix_free(y, k: int):
    L = jnp.linalg.cholesky(y)
    s = jnp.concatenate(
        [
            jnp.zeros_like(L[..., :1]),
            jnp.cumsum(jnp.square(L[..., :-1]), axis=-1),
        ],
        axis=-1,
    )
    z = L / jnp.sqrt(jnp.maximum(1.0 - s, 1e-300))
    rows, cols = _tril_colmajor(k)
    return jnp.arctanh(z[..., rows, cols])


# --- cov_matrix: y = L L^T, L lower-tri w/ exp diag (ref: cov_matrix_*) -----


def _cov_chol(x, k: int):
    rows, cols = np.tril_indices(k)  # row-major incl. diagonal
    Lv = jnp.zeros(x.shape[:-1] + (k, k), dtype=x.dtype).at[..., rows, cols].set(x)
    d = jnp.diagonal(Lv, axis1=-2, axis2=-1)
    L = Lv.at[..., np.arange(k), np.arange(k)].set(jnp.exp(d))
    return L, d


def cov_matrix_constrain(x, k: int):
    L, _ = _cov_chol(x, k)
    return L @ jnp.swapaxes(L, -1, -2)


def cov_matrix_constrain_lp(x, k: int):
    """lp += K log 2 + sum_k (K - k + 1) log L_kk  (ref: cov_matrix_constrain.hpp:89-92)."""
    L, d = _cov_chol(x, k)
    wts = jnp.asarray(np.arange(k, 0, -1) + 1, dtype=L.dtype)  # K-k+1, k 0-indexed
    lp = k * np.log(2.0) + jnp.sum(wts * d)
    return L @ jnp.swapaxes(L, -1, -2), lp


def cov_matrix_free(y, k: int):
    L = jnp.linalg.cholesky(y)
    d = jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))
    L = L.at[..., np.arange(k), np.arange(k)].set(d)
    rows, cols = np.tril_indices(k)
    return L[..., rows, cols]


# --- read_corr/read_cov builders (ref: read_corr_L.hpp, read_cov_L.hpp,
# --- read_corr_matrix.hpp, read_cov_matrix.hpp) -----------------------------


def read_corr_L(cpcs, k: int):
    """Cholesky factor of a correlation matrix from canonical partial
    correlations (C-vine, column-major order).  ref: ``read_corr_L.hpp``."""
    return _read_corr_L(jnp.asarray(cpcs), k)[0]


def read_corr_matrix(cpcs, k: int):
    """Correlation matrix from CPCs (ref: ``read_corr_matrix.hpp``)."""
    L = read_corr_L(cpcs, k)
    return L @ jnp.swapaxes(L, -1, -2)


def read_cov_L(cpcs, sds, k: int | None = None):
    """Covariance Cholesky factor = diag(sds) @ read_corr_L (ref:
    ``read_cov_L.hpp``)."""
    sds = jnp.asarray(sds)
    k = sds.shape[-1] if k is None else k
    return sds[..., :, None] * read_corr_L(cpcs, k)


def read_cov_matrix(cpcs, sds):
    """Covariance matrix from CPCs + standard deviations (ref:
    ``read_cov_matrix.hpp``)."""
    L = read_cov_L(cpcs, sds)
    return L @ jnp.swapaxes(L, -1, -2)


def factor_U(U, k: int):
    """Upper-tri Cholesky of a correlation matrix -> atanh-CPCs (ref:
    ``factor_U.hpp``).  Row-major over the upper triangle == the C-vine
    column-major lower ordering used by ``read_corr_L``."""
    L = jnp.swapaxes(jnp.asarray(U), -1, -2)
    s = jnp.concatenate(
        [
            jnp.zeros_like(L[..., :1]),
            jnp.cumsum(jnp.square(L[..., :-1]), axis=-1),
        ],
        axis=-1,
    )
    z = L / jnp.sqrt(jnp.maximum(1.0 - s, 1e-300))
    rows, cols = _tril_colmajor(k)
    return jnp.arctanh(jnp.clip(z[..., rows, cols], -1 + 1e-15, 1 - 1e-15))


def factor_cov_matrix(y, k: int | None = None):
    """Factor a covariance matrix into (atanh-CPCs, log-sds) (ref:
    ``factor_cov_matrix.hpp``; tuple return replaces output params)."""
    y = jnp.asarray(y)
    k = y.shape[-1] if k is None else k
    sds = jnp.sqrt(jnp.diagonal(y, axis1=-2, axis2=-1))
    corr = y / (sds[..., :, None] * sds[..., None, :])
    return corr_matrix_free(corr, k), jnp.log(sds)


def make_nu(eta, k: int):
    """Beta-variate degrees of freedom for the LKJ onion construction
    (ref: ``make_nu.hpp``): row i (0-based) of the CPC triangle gets
    nu = 2 * (eta + (k - 2)/2 - i/2), repeated k-1-i times."""
    rows = np.repeat(np.arange(k - 1), np.arange(k - 1, 0, -1))
    return 2.0 * (eta + 0.5 * (k - 2.0) - 0.5 * jnp.asarray(rows, dtype=jnp.result_type(eta, 1.0)))


# --- cov_matrix via LKJ parameterization: CPCs + sds (ref:
# --- cov_matrix_constrain_lkj.hpp, cov_matrix_free_lkj.hpp) -----------------


def cov_matrix_constrain_lkj(x, k: int):
    """x = [(k choose 2) unconstrained CPCs, k unconstrained log-sds]."""
    kc2 = (k * (k - 1)) // 2
    cpcs = jnp.tanh(x[..., :kc2])
    sds = jnp.exp(x[..., kc2:])
    return read_cov_matrix(cpcs, sds)


def cov_matrix_constrain_lkj_lp(x, k: int):
    kc2 = (k * (k - 1)) // 2
    z = jnp.tanh(x[..., :kc2])
    logsds = x[..., kc2:]
    sds = jnp.exp(logsds)
    # corr_constrain (tanh) jacobian + positive_constrain jacobian
    lp = jnp.sum(log1m(jnp.square(z))) + jnp.sum(logsds)
    # read_corr_L jacobian (column-weighted) + read_cov_L adjustment
    rows, cols = _tril_colmajor(k)
    wts = jnp.asarray(np.maximum(k - cols - 2, 0), dtype=z.dtype)
    lp = lp + 0.5 * jnp.sum(wts * log1m(jnp.square(z)))
    lp = lp + (jnp.sum(logsds) + np.log(2.0)) * k
    return read_cov_matrix(z, sds), lp


def cov_matrix_free_lkj(y, k: int | None = None):
    """Invert cov_matrix_constrain_lkj (ref: ``cov_matrix_free_lkj.hpp``)."""
    cpcs, logsds = factor_cov_matrix(y, k)
    return jnp.concatenate([cpcs, logsds], axis=-1)


# --- cholesky_factor: M x N lower trapezoid, positive diag (ref: same) ------


def _chol_factor_idx(m: int, n: int):
    rows, cols = np.tril_indices(m)
    keep = cols < n
    return rows[keep], cols[keep]


def cholesky_factor_constrain(x, m: int, n: int):
    rows, cols = _chol_factor_idx(m, n)
    Lv = jnp.zeros(x.shape[:-1] + (m, n), dtype=x.dtype).at[..., rows, cols].set(x)
    d = jnp.diagonal(Lv, axis1=-2, axis2=-1)
    return Lv.at[..., np.arange(n), np.arange(n)].set(jnp.exp(d))


def cholesky_factor_constrain_lp(x, m: int, n: int):
    """lp += sum of diagonal free params (ref: cholesky_factor_constrain.hpp)."""
    rows, cols = _chol_factor_idx(m, n)
    Lv = jnp.zeros(x.shape[:-1] + (m, n), dtype=x.dtype).at[..., rows, cols].set(x)
    d = jnp.diagonal(Lv, axis1=-2, axis2=-1)
    L = Lv.at[..., np.arange(n), np.arange(n)].set(jnp.exp(d))
    return L, jnp.sum(d)


def cholesky_factor_free(L, m: int, n: int):
    L = jnp.asarray(L)
    d = jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))
    Lv = L.at[..., np.arange(n), np.arange(n)].set(d)
    rows, cols = _chol_factor_idx(m, n)
    return Lv[..., rows, cols]
