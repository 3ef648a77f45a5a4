"""Multivariate distributions.

Reference: ``stan/math/prim/mat/prob/*`` (25 families; this module covers the
core set, the GLM fusions live in ``glm.py``).  Conventions:

- ``y`` may carry leading batch dimensions; the result is the summed
  log-density over the batch (matching Stan's vectorized std::vector
  overloads).
- Cholesky-parameterized forms are the fast path (triangular solves stay on
  the MXU); the plain covariance forms factorize internally, exactly like
  the reference routes ``multi_normal`` through an LDLT/LLT factorization.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp

from math_tpu.special import LOG_TWO, LOG_PI, LOG_TWO_PI
from math_tpu.utils.propto import include_summand
from math_tpu.dists._util import fdtype, ok_pos, ok_simplex


def _chol_logdet(L):
    return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def _solve_tri_lower(L, b):
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


# --- multi_normal family (ref: multi_normal[_cholesky,_prec]_lpdf.hpp) ------


def multi_normal_cholesky_lpdf(y, mu, L, *, propto=False):
    """MVN with Cholesky-factored covariance (ref: multi_normal_cholesky_lpdf.hpp)."""
    dt = fdtype(y, mu, L)
    y = jnp.asarray(y, dt)
    mu = jnp.asarray(mu, dt)
    L = jnp.asarray(L, dt)
    k = L.shape[-1]
    diff = y - mu  # (..., K)
    z = jnp.vectorize(_solve_tri_lower, signature="(k,k),(k)->(k)")(L, diff)
    nbatch = max(diff.size // k, 1) if diff.ndim > 1 else 1
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, y, mu, L):
        lp = lp - 0.5 * jnp.sum(jnp.square(z))
    if include_summand(propto, L):
        lp = lp - nbatch * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
    if include_summand(propto):
        lp = lp - 0.5 * k * nbatch * LOG_TWO_PI
    return lp


def multi_normal_lpdf(y, mu, sigma, *, propto=False):
    """MVN density (ref: multi_normal_lpdf.hpp).

    Above ``KernelThresholds.cholesky_blocked_min_dim`` the O(k³)
    solve+log-det runs through the fused blocked factorization
    (``ops.cholesky.spd_solve_logdiag_tpu``) — XLA:TPU's native
    cholesky/triangular_solve lowerings compile pathologically there."""
    dt = fdtype(y, mu, sigma)
    sigma_a = jnp.asarray(sigma, dt)
    from math_tpu.config import get_config

    th = get_config().thresholds
    if (
        sigma_a.ndim == 2
        and sigma_a.shape[-1] >= th.cholesky_blocked_min_dim
    ):
        from math_tpu.ops.cholesky import spd_solve_logdiag_tpu

        y_a = jnp.asarray(y, dt)
        mu_a = jnp.asarray(mu, dt)
        k = sigma_a.shape[-1]
        diff = y_a - mu_a
        diff2 = diff.reshape(-1, k) if diff.ndim > 1 else diff[None]
        z, slogdiag = spd_solve_logdiag_tpu(sigma_a, diff2.T)
        nbatch = diff2.shape[0]
        lp = jnp.zeros((), dt)
        if include_summand(propto, y, mu, sigma):
            lp = lp - 0.5 * jnp.sum(jnp.square(z))
        if include_summand(propto, sigma):
            lp = lp - nbatch * slogdiag  # = -nbatch/2 * log|Sigma|
        if include_summand(propto):
            lp = lp - 0.5 * k * nbatch * LOG_TWO_PI
        return lp
    L = jnp.linalg.cholesky(sigma_a)
    return multi_normal_cholesky_lpdf(y, mu, L, propto=propto)


def multi_normal_prec_lpdf(y, mu, omega, *, propto=False):
    """MVN with precision matrix (ref: multi_normal_prec_lpdf.hpp)."""
    dt = fdtype(y, mu, omega)
    y = jnp.asarray(y, dt)
    mu = jnp.asarray(mu, dt)
    omega = jnp.asarray(omega, dt)
    k = omega.shape[-1]
    diff = y - mu
    nbatch = max(diff.size // k, 1) if diff.ndim > 1 else 1
    Lp = jnp.linalg.cholesky(omega)
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, y, mu, omega):
        w = jnp.einsum("...i,...ij,...j->...", diff, omega, diff)
        lp = lp - 0.5 * jnp.sum(w)
    if include_summand(propto, omega):
        lp = lp + nbatch * _chol_logdet(Lp)
    if include_summand(propto):
        lp = lp - 0.5 * k * nbatch * LOG_TWO_PI
    return lp


def multi_normal_rng(key, mu, sigma, shape=None):
    mu = jnp.asarray(mu)
    return jax.random.multivariate_normal(
        key, mu, jnp.asarray(sigma), shape=shape, method="cholesky"
    )


def multi_normal_cholesky_rng(key, mu, L, shape=None):
    mu = jnp.asarray(mu)
    L = jnp.asarray(L)
    shape = shape if shape is not None else jnp.broadcast_shapes(
        mu.shape[:-1], L.shape[:-2]
    )
    z = jax.random.normal(key, shape + mu.shape[-1:], dtype=L.dtype)
    return mu + jnp.einsum("...ij,...j->...i", L, z)


def multi_normal_prec_rng(key, mu, omega, shape=None):
    """Draw via U^-1 z with U the upper Cholesky of the precision."""
    mu = jnp.asarray(mu)
    omega = jnp.asarray(omega)
    Lp = jnp.linalg.cholesky(omega)
    shape = shape if shape is not None else jnp.broadcast_shapes(
        mu.shape[:-1], omega.shape[:-2]
    )
    z = jax.random.normal(key, shape + mu.shape[-1:], dtype=Lp.dtype)
    u = jnp.broadcast_to(
        jnp.swapaxes(Lp, -1, -2), z.shape[:-1] + Lp.shape[-2:]
    )
    x = jax.scipy.linalg.solve_triangular(u, z[..., None], lower=False)[..., 0]
    return mu + x


# --- multi_student_t (ref: multi_student_t_lpdf.hpp) ------------------------


def multi_student_t_lpdf(y, nu, mu, sigma, *, propto=False):
    dt = fdtype(y, nu, mu, sigma)
    y = jnp.asarray(y, dt)
    mu = jnp.asarray(mu, dt)
    sigma = jnp.asarray(sigma, dt)
    nu = jnp.asarray(nu, dt)
    k = sigma.shape[-1]
    L = jnp.linalg.cholesky(sigma)
    diff = y - mu
    z = jnp.vectorize(_solve_tri_lower, signature="(k,k),(k)->(k)")(L, diff)
    q = jnp.sum(jnp.square(z), axis=-1)  # (...,) per row
    nbatch = max(q.size, 1)
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, y, nu, mu, sigma):
        lp = lp - 0.5 * (nu + k) * jnp.sum(jnp.log1p(q / nu))
    if include_summand(propto, nu):
        lp = lp + nbatch * (
            jsp.gammaln(0.5 * (nu + k))
            - jsp.gammaln(0.5 * nu)
            - 0.5 * k * jnp.log(nu)
        )
    if include_summand(propto, sigma):
        lp = lp - nbatch * _chol_logdet(L)
    if include_summand(propto):
        lp = lp - 0.5 * k * nbatch * LOG_PI
    return lp


def multi_student_t_rng(key, nu, mu, sigma, shape=None):
    mu = jnp.asarray(mu)
    sigma = jnp.asarray(sigma)
    shape = shape if shape is not None else mu.shape[:-1]
    k1, k2 = jax.random.split(key)
    g = jax.random.gamma(k1, 0.5 * nu, shape) / (0.5 * nu)
    z = jax.random.multivariate_normal(
        k2, jnp.zeros_like(mu), sigma, shape=shape, method="cholesky"
    )
    return mu + z / jnp.sqrt(g)[..., None]


# --- dirichlet / multinomial (ref: dirichlet_lpdf.hpp, multinomial_lpmf) ----


def dirichlet_lpdf(theta, alpha, *, propto=False):
    dt = fdtype(theta, alpha)
    theta = jnp.asarray(theta, dt)
    alpha = jnp.asarray(alpha, dt)
    th, al = jnp.broadcast_arrays(theta, alpha)
    nbatch = max(th.size // th.shape[-1], 1)
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, alpha):
        lp = lp + jnp.sum(jsp.gammaln(jnp.sum(al, axis=-1))) - jnp.sum(
            jsp.gammaln(al)
        )
    if include_summand(propto, theta, alpha):
        lp = lp + jnp.sum(jsp.xlogy(al - 1.0, th))
    ok = jnp.all(ok_simplex(th)) & jnp.all(al > 0)
    return jnp.where(ok, lp, -jnp.inf)


def dirichlet_rng(key, alpha, shape=None):
    alpha = jnp.asarray(alpha)
    shape = shape if shape is not None else alpha.shape[:-1]
    return jax.random.dirichlet(key, alpha, shape)


def multinomial_lpmf(y, theta, *, propto=False):
    dt = fdtype(theta)
    yf = jnp.asarray(y, dt)
    theta = jnp.asarray(theta, dt)
    yb, tb = jnp.broadcast_arrays(yf, theta)
    n = jnp.sum(yb, axis=-1)
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto):
        lp = lp + jnp.sum(jsp.gammaln(n + 1.0)) - jnp.sum(jsp.gammaln(yb + 1.0))
    if include_summand(propto, theta):
        lp = lp + jnp.sum(jsp.xlogy(yb, tb))
    ok = jnp.all(yb >= 0) & jnp.all(ok_simplex(theta))
    return jnp.where(ok, lp, -jnp.inf)


def multinomial_rng(key, theta, n, shape=None):
    """n draws over categories theta via iterated binomials (exact)."""
    theta = jnp.asarray(theta)
    k = theta.shape[-1]
    shape = shape if shape is not None else theta.shape[:-1]

    def body(carry, i):
        key, rem, cum = carry
        key, sub = jax.random.split(key)
        p = jnp.clip(theta[..., i] / jnp.maximum(1.0 - cum, 1e-30), 0.0, 1.0)
        draw = jax.random.binomial(sub, rem, p, shape=shape).astype(jnp.int32)
        return (key, rem - draw, cum + theta[..., i]), draw

    n0 = jnp.broadcast_to(jnp.asarray(n, jnp.int32), shape)
    (_, rem, _), draws = jax.lax.scan(
        body, (key, n0, jnp.zeros(shape, theta.dtype)), jnp.arange(k - 1)
    )
    draws = jnp.moveaxis(draws, 0, -1)
    return jnp.concatenate([draws, rem[..., None]], axis=-1)


# --- LKJ (ref: lkj_corr_cholesky_lpdf.hpp, lkj_corr_lpdf.hpp) ---------------


def do_lkj_constant(eta, k):
    """LKJ normalizing constant, general-eta branch (ref: lkj_corr_lpdf.hpp:
    do_lkj_constant, Lewandowski-Kurowicka-Joe theorem 5)."""
    dt = fdtype(eta)
    eta = jnp.asarray(eta, dt)
    km1 = k - 1
    ks = jnp.arange(1, k, dtype=dt)
    return km1 * jsp.gammaln(eta + 0.5 * km1) - jnp.sum(
        0.5 * ks * LOG_PI + jsp.gammaln(eta + 0.5 * (km1 - ks))
    )


def lkj_corr_cholesky_lpdf(L, eta, *, propto=False):
    """lp = const(eta,K) + sum_k [(K-k-1) + (2 eta - 2)] log L_kk, k=1..K-1
    (ref: lkj_corr_cholesky_lpdf.hpp:18-40)."""
    dt = fdtype(L, eta)
    L = jnp.asarray(L, dt)
    eta = jnp.asarray(eta, dt)
    k = L.shape[-1]
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, eta):
        lp = lp + do_lkj_constant(eta, k)
    if include_summand(propto, L, eta):
        logdiag = jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)[..., 1:])
        wts = jnp.arange(k - 2, -1.0, -1.0, dtype=dt)  # K-1-k-1 for k=0..K-2
        lp = lp + jnp.sum((wts + 2.0 * eta - 2.0) * logdiag)
    return lp


def lkj_corr_lpdf(y, eta, *, propto=False):
    """lp = const + (eta - 1) log|y| (ref: lkj_corr_lpdf.hpp).

    Value-level corr-matrix validation (the reference's
    ``check_corr_matrix``: unit diagonal, symmetry, positive-definite) maps
    to the -inf convention; PD is detected via Cholesky nan rows (no grad
    flows through the mask).
    """
    dt = fdtype(y, eta)
    y = jnp.asarray(y, dt)
    eta = jnp.asarray(eta, dt)
    k = y.shape[-1]
    tol = jnp.maximum(1e-8, 16.0 * k * jnp.finfo(dt).eps)
    diag = jnp.diagonal(y, axis1=-2, axis2=-1)
    ok = (
        jnp.all(jnp.isfinite(y))
        & jnp.all(jnp.abs(diag - 1.0) <= tol)
        & jnp.all(jnp.abs(y - jnp.swapaxes(y, -1, -2)) <= tol)
        & jnp.all(ok_pos(eta))
    )
    ldiag = jnp.diagonal(
        jnp.linalg.cholesky(jax.lax.stop_gradient(y)), axis1=-2, axis2=-1
    )
    ok = ok & jnp.all(jnp.isfinite(ldiag) & (ldiag > 0))
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, eta):
        lp = lp + do_lkj_constant(eta, k)
    if include_summand(propto, y, eta):
        # double-where: slogdet of a singular y has NaN cotangents even when
        # the output is masked to -inf; feed it the identity when invalid.
        y_safe = jnp.where(
            ok, y, jnp.broadcast_to(jnp.eye(k, dtype=dt), y.shape)
        )
        sign, logdet = jnp.linalg.slogdet(y_safe)
        lp = lp + jnp.sum((eta - 1.0) * logdet)
    return jnp.where(ok, lp, -jnp.inf)


def lkj_corr_cholesky_rng(key, k, eta, shape=()):
    """Onion-method sampler (matches the reference's vine/onion behavior)."""
    dt = fdtype(eta)
    eta = jnp.asarray(eta, dt)

    def one(key):
        L = jnp.zeros((k, k), dt).at[0, 0].set(1.0)
        beta = eta + 0.5 * (k - 2)
        for i in range(1, k):
            key_i = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(key_i)
            b = beta - 0.5 * (i - 1)
            # squared radius ~ Beta(i/2, b)
            r2 = jax.random.beta(k1, 0.5 * i, b)
            u = jax.random.normal(k2, (i,), dtype=dt)
            u = u / jnp.linalg.norm(u)
            L = L.at[i, :i].set(jnp.sqrt(r2) * u)
            L = L.at[i, i].set(jnp.sqrt(1.0 - r2))
        return L

    if shape == ():
        return one(key)
    keys = jax.random.split(key, int(jnp.prod(jnp.asarray(shape))))
    Ls = jax.vmap(one)(keys)
    return Ls.reshape(tuple(shape) + (k, k))


def lkj_corr_rng(key, k, eta, shape=()):
    L = lkj_corr_cholesky_rng(key, k, eta, shape)
    return L @ jnp.swapaxes(L, -1, -2)


# --- wishart / inv_wishart (ref: wishart_lpdf.hpp, inv_wishart_lpdf.hpp) ----


def wishart_lpdf(w, nu, s, *, propto=False):
    dt = fdtype(w, nu, s)
    w = jnp.asarray(w, dt)
    nu = jnp.asarray(nu, dt)
    s = jnp.asarray(s, dt)
    k = s.shape[-1]
    Lw = jnp.linalg.cholesky(w)
    Ls = jnp.linalg.cholesky(s)
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, w, nu):
        lp = lp + (nu - k - 1.0) * _chol_logdet(Lw)
    if include_summand(propto, w, s):
        # tr(S^-1 W) = || Ls^-1 Lw ||_F^2
        x = jax.scipy.linalg.solve_triangular(Ls, Lw, lower=True)
        lp = lp - 0.5 * jnp.sum(jnp.square(x))
    if include_summand(propto, nu):
        lp = lp - 0.5 * nu * k * LOG_TWO - jsp.multigammaln(0.5 * nu, k)
    if include_summand(propto, nu, s):
        lp = lp - nu * _chol_logdet(Ls)
    return lp


def inv_wishart_lpdf(w, nu, s, *, propto=False):
    dt = fdtype(w, nu, s)
    w = jnp.asarray(w, dt)
    nu = jnp.asarray(nu, dt)
    s = jnp.asarray(s, dt)
    k = s.shape[-1]
    Lw = jnp.linalg.cholesky(w)
    Ls = jnp.linalg.cholesky(s)
    lp = jnp.zeros((), dtype=dt)
    if include_summand(propto, w, nu):
        lp = lp - (nu + k + 1.0) * _chol_logdet(Lw)
    if include_summand(propto, w, s):
        # tr(S W^-1) = || Lw^-1 Ls ||_F^2
        x = jax.scipy.linalg.solve_triangular(Lw, Ls, lower=True)
        lp = lp - 0.5 * jnp.sum(jnp.square(x))
    if include_summand(propto, nu):
        lp = lp - 0.5 * nu * k * LOG_TWO - jsp.multigammaln(0.5 * nu, k)
    if include_summand(propto, nu, s):
        lp = lp + nu * _chol_logdet(Ls)
    return lp


def wishart_rng(key, nu, s, shape=()):
    """Bartlett decomposition: W = L A A^T L^T."""
    s = jnp.asarray(s)
    k = s.shape[-1]
    Ls = jnp.linalg.cholesky(s)
    k1, k2 = jax.random.split(key)
    nu = jnp.asarray(nu, Ls.dtype)
    df = nu - jnp.arange(k, dtype=Ls.dtype)
    c = jnp.sqrt(2.0 * jax.random.gamma(k1, 0.5 * df, tuple(shape) + (k,)))
    z = jax.random.normal(k2, tuple(shape) + (k, k), dtype=Ls.dtype)
    A = jnp.tril(z, -1) + jnp.zeros_like(z).at[
        ..., jnp.arange(k), jnp.arange(k)
    ].set(c)
    La = Ls @ A
    return La @ jnp.swapaxes(La, -1, -2)


def inv_wishart_rng(key, nu, s, shape=()):
    sinv = jnp.linalg.inv(jnp.asarray(s))
    w = wishart_rng(key, nu, sinv, shape)
    return jnp.linalg.inv(w)
