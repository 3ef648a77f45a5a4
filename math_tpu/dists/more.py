"""Remaining distribution families completing reference parity.

Covers: wiener first-passage (Navarro-Fuss), gaussian_dlm_obs (Kalman
filter likelihood), multi_gp[_cholesky], matrix_normal_prec, lkj_cov,
beta_binomial cdf family, neg_binomial lcdf/lccdf, and the glm/dlm rngs.
References: same-named files under ``prim/{scal,mat}/prob``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp
from math_tpu.special.incbeta import inc_beta  # differentiable in (a, b, x)

from math_tpu.special import LOG_SQRT_TWO_PI, LOG_TWO_PI, lbeta, lchoose
from math_tpu.utils.propto import include_summand
from math_tpu.dists._util import bcast, fdtype, finish, finish_prod, ok_pos, safe
from math_tpu.dists.multivariate import do_lkj_constant, lkj_corr_lpdf
from math_tpu.ops.linalg import (
    log_determinant_spd,
    trace_gen_quad_form,
)

__all__ = [
    "wiener_lpdf",
    "gaussian_dlm_obs_lpdf",
    "gaussian_dlm_obs_rng",
    "multi_gp_lpdf",
    "multi_gp_cholesky_lpdf",
    "matrix_normal_prec_lpdf",
    "matrix_normal_prec_rng",
    "lkj_cov_lpdf",
    "dirichlet_lpmf",
    "beta_binomial_cdf",
    "beta_binomial_lcdf",
    "beta_binomial_lccdf",
    "neg_binomial_lcdf",
    "neg_binomial_lccdf",
    "bernoulli_logit_glm_rng",
]


# --- wiener first-passage time (ref: wiener_lpdf.hpp, Navarro & Fuss 2009) --

_WIENER_K_SMALL = 7  # terms k = -7..7; exceeds the reference's 1e-6 budget
_WIENER_K_LARGE = 16


def wiener_lpdf(y, alpha, tau, beta, delta, *, propto=False):
    """Upper-boundary Wiener FPT density: y RT (s), alpha boundary sep,
    tau nondecision time, beta in (0,1) bias, delta drift."""
    yb, ab, tb, bb, db = bcast(y, alpha, tau, beta, delta)
    okp = (
        ok_pos(ab)
        & ok_pos(tb)
        & jnp.isfinite(bb)
        & (bb >= 0)
        & (bb <= 1)
        & jnp.isfinite(db)
    )
    sup = yb > tb
    ok = okp & sup & jnp.isfinite(yb)
    a = safe(ab, okp)
    w = 1.0 - safe(bb, okp, 0.5)
    a2 = jnp.square(a)
    x = safe(yb - tb, sup) / a2  # normalized time, > 0

    sqrt_x = jnp.sqrt(x)
    log_x = jnp.log(x)

    # number-of-terms heuristics (ref: wiener_lpdf.hpp:168-199), used only
    # to pick the better-converging series; term counts are static here.
    err = 1e-6
    kl = jnp.where(
        math.pi * err * x < 1,
        jnp.maximum(
            jnp.sqrt(jnp.maximum(-2.0 * math.sqrt(math.pi)
                                 * (math.log(math.pi * err) + log_x), 0.0))
            / sqrt_x,
            sqrt_x / math.pi,
        ),
        sqrt_x / math.pi,
    )
    t0 = 2.0 * math.sqrt(2.0 * math.pi) * err * sqrt_x
    ks = jnp.where(
        t0 < 1,
        jnp.maximum(
            2.0 + sqrt_x * jnp.sqrt(jnp.maximum(-2.0 * jnp.log(jnp.maximum(t0, 1e-300)), 0.0)),
            sqrt_x + 1.0,
        ),
        2.0,
    )

    # small-time series: sum_k (w + 2k) exp(-(w+2k)^2 / (2x)), evaluated as
    # a signed logsumexp so deep-tail tiny x (terms ~ exp(-w^2/2x) << 1e-300)
    # keeps full log-scale accuracy instead of underflowing to a clamp
    kk = jnp.arange(-_WIENER_K_SMALL, _WIENER_K_SMALL + 1, dtype=x.dtype)
    arg = w[..., None] + 2.0 * kk
    log_terms = (
        jnp.log(jnp.maximum(jnp.abs(arg), 1e-300))
        - jnp.square(arg) * 0.5 / x[..., None]
    )
    lsum, sgn = jsp.logsumexp(
        log_terms, axis=-1, b=jnp.sign(arg), return_sign=True
    )
    log_small = (
        jnp.where(sgn > 0, lsum, -jnp.inf)
        - (0.5 * math.log(2.0) + 0.5 * math.log(math.pi))
        - 1.5 * log_x
    )

    # large-time series: sum_k k exp(-k^2 pi^2 x / 2) sin(k pi w)
    kk2 = jnp.arange(1, _WIENER_K_LARGE + 1, dtype=x.dtype)
    large_sum = jnp.sum(
        kk2
        * jnp.exp(-jnp.square(kk2) * (0.5 * math.pi**2) * x[..., None])
        * jnp.sin(kk2 * math.pi * w[..., None]),
        axis=-1,
    )
    log_large = jnp.log(jnp.maximum(large_sum, 1e-300)) + math.log(math.pi)

    log_f = jnp.where(ks < kl, log_small, log_large)
    lp = (
        safe(db, okp, 0.0) * a * w
        - jnp.square(safe(db, okp, 0.0)) * x * a2 / 2.0
        - jnp.log(a2)
        + log_f
    )
    return finish(lp, ok)


# --- gaussian_dlm_obs: Kalman-filter likelihood (ref: gaussian_dlm_obs_lpdf) -


def gaussian_dlm_obs_lpdf(y, F, G, V, W, m0, C0, *, propto=False):
    """Dynamic linear model observation density.

    theta_t = G theta_{t-1} + w_t,  w_t ~ N(0, W)
    y_t     = F' theta_t + v_t,     v_t ~ N(0, V)
    theta_0 ~ N(m0, C0);  y is (r, T) with columns as time points.

    V may be (r, r) or a length-r vector (diagonal observation noise).
    Likelihood evaluated by the forward Kalman recursion under lax.scan —
    the TPU-native analog of the reference's sequential filter.
    """
    dt = fdtype(y, F, G, V, W, m0, C0)
    y = jnp.asarray(y, dt)
    F = jnp.asarray(F, dt)
    G = jnp.asarray(G, dt)
    V = jnp.asarray(V, dt)
    W = jnp.asarray(W, dt)
    m0 = jnp.asarray(m0, dt)
    C0 = jnp.asarray(C0, dt)
    r = y.shape[0]
    Vm = jnp.diag(V) if V.ndim == 1 else V

    def step(carry, y_t):
        m, C, lp = carry
        a = G @ m
        R = G @ C @ G.T + W
        f = F.T @ a
        Q = F.T @ R @ F + Vm
        Lq = jnp.linalg.cholesky(Q)
        e = y_t - f
        z = jax.scipy.linalg.solve_triangular(Lq, e, lower=True)
        lp = lp - 0.5 * (
            jnp.sum(jnp.square(z))
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lq)))
            + r * LOG_TWO_PI
        )
        K = R @ F @ jax.scipy.linalg.cho_solve((Lq, True), jnp.eye(r, dtype=dt))
        m = a + K @ e
        C = R - K @ Q @ K.T
        C = 0.5 * (C + C.T)
        return (m, C, lp), None

    (_, _, lp), _ = jax.lax.scan(step, (m0, C0, jnp.zeros((), dt)), y.T)
    return lp


def gaussian_dlm_obs_rng(key, F, G, V, W, m0, C0, T):
    """Simulate a DLM observation sequence; returns (r, T)."""
    dt = fdtype(F, G, V, W, m0, C0)
    F = jnp.asarray(F, dt)
    G = jnp.asarray(G, dt)
    V = jnp.asarray(V, dt)
    W = jnp.asarray(W, dt)
    Vm = jnp.diag(V) if V.ndim == 1 else V
    n = G.shape[0]
    r = F.shape[1]
    k0, k1 = jax.random.split(key)
    L0 = jnp.linalg.cholesky(jnp.asarray(C0, dt))
    theta = jnp.asarray(m0, dt) + L0 @ jax.random.normal(k0, (n,), dt)
    Lw = jnp.linalg.cholesky(W)
    Lv = jnp.linalg.cholesky(Vm)

    def step(carry, k):
        theta = carry
        kw, kv = jax.random.split(k)
        theta = G @ theta + Lw @ jax.random.normal(kw, (n,), dt)
        y = F.T @ theta + Lv @ jax.random.normal(kv, (r,), dt)
        return theta, y

    _, ys = jax.lax.scan(step, theta, jax.random.split(k1, T))
    return ys.T


# --- multi_gp (ref: multi_gp_lpdf.hpp, multi_gp_cholesky_lpdf.hpp) ----------


def multi_gp_lpdf(y, sigma, w, *, propto=False):
    """y (K, N): K independent rows, row k ~ N(0, Sigma / w_k)."""
    dt = fdtype(y, sigma, w)
    y = jnp.asarray(y, dt)
    sigma = jnp.asarray(sigma, dt)
    w = jnp.asarray(w, dt)
    kk, n = y.shape
    L = jnp.linalg.cholesky(sigma)
    lp = jnp.zeros((), dt)
    if include_summand(propto):
        lp = lp - 0.5 * LOG_TWO_PI * kk * n
    if include_summand(propto, sigma):
        lp = lp - kk * jnp.sum(jnp.log(jnp.diagonal(L)))
    if include_summand(propto, w):
        lp = lp + 0.5 * n * jnp.sum(jnp.log(w))
    if include_summand(propto, y, w, sigma):
        z = jax.scipy.linalg.solve_triangular(L, y.T, lower=True)  # (N, K)
        lp = lp - 0.5 * jnp.sum(w * jnp.sum(jnp.square(z), axis=0))
    return lp


def multi_gp_cholesky_lpdf(y, L, w, *, propto=False):
    """Same with Sigma = L L^T pre-factored (ref: multi_gp_cholesky_lpdf)."""
    dt = fdtype(y, L, w)
    y = jnp.asarray(y, dt)
    L = jnp.asarray(L, dt)
    w = jnp.asarray(w, dt)
    kk, n = y.shape
    lp = jnp.zeros((), dt)
    if include_summand(propto):
        lp = lp - 0.5 * LOG_TWO_PI * kk * n
    if include_summand(propto, L):
        lp = lp - kk * jnp.sum(jnp.log(jnp.diagonal(L)))
    if include_summand(propto, w):
        lp = lp + 0.5 * n * jnp.sum(jnp.log(w))
    if include_summand(propto, y, w, L):
        z = jax.scipy.linalg.solve_triangular(L, y.T, lower=True)
        lp = lp - 0.5 * jnp.sum(w * jnp.sum(jnp.square(z), axis=0))
    return lp


# --- matrix_normal_prec (ref: matrix_normal_prec_lpdf.hpp) ------------------


def matrix_normal_prec_lpdf(y, mu, sigma, d, *, propto=False):
    """Matrix normal with row precision Sigma (n x n) and column precision
    D (p x p): lp = -1/2 tr(D (y-Mu)' Sigma (y-Mu)) + 0.5(n log|D|... )"""
    dt = fdtype(y, mu, sigma, d)
    y = jnp.asarray(y, dt)
    mu = jnp.asarray(mu, dt)
    sigma = jnp.asarray(sigma, dt)
    d = jnp.asarray(d, dt)
    n, p = y.shape
    lp = jnp.zeros((), dt)
    if include_summand(propto):
        lp = lp - LOG_SQRT_TWO_PI * n * p
    if include_summand(propto, sigma):
        lp = lp + 0.5 * p * log_determinant_spd(sigma)
    if include_summand(propto, d):
        lp = lp + 0.5 * n * log_determinant_spd(d)
    if include_summand(propto, y, mu, sigma, d):
        lp = lp - 0.5 * trace_gen_quad_form(d, sigma, y - mu)
    return lp


def matrix_normal_prec_rng(key, mu, sigma, d, shape=()):
    """Draw Y ~ MN(Mu, Sigma^-1, D^-1)."""
    dt = fdtype(mu, sigma, d)
    mu = jnp.asarray(mu, dt)
    n, p = mu.shape
    Ls = jnp.linalg.cholesky(jnp.asarray(sigma, dt))
    Ld = jnp.linalg.cholesky(jnp.asarray(d, dt))
    z = jax.random.normal(key, tuple(shape) + (n, p), dt)
    # A = Ls^-T Z Ld^-1: row cov Ls^-T Ls^-1 = Sigma^-1, col cov
    # Ld^-T Ld^-1 = D^-1 (vec(A) ~ N(0, D^-1 (x) Sigma^-1))
    ut = jnp.broadcast_to(
        jnp.swapaxes(Ls, -1, -2), z.shape[:-2] + Ls.shape
    )
    c = jax.scipy.linalg.solve_triangular(ut, z, lower=False)
    ct = jnp.swapaxes(c, -1, -2)
    ldt = jnp.broadcast_to(
        jnp.swapaxes(Ld, -1, -2), ct.shape[:-2] + Ld.shape
    )
    at = jax.scipy.linalg.solve_triangular(ldt, ct, lower=False)
    return mu + jnp.swapaxes(at, -1, -2)


# --- lkj_cov (ref: lkj_cov_lpdf.hpp): lognormal sds + LKJ correlation -------


def lkj_cov_lpdf(y, mu, sigma, eta, *, propto=False):
    """Deprecated-in-reference compound prior: lognormal(mu, sigma) on the
    sqrt-diagonal, LKJ(eta) on the correlation matrix."""
    dt = fdtype(y, mu, sigma, eta)
    y = jnp.asarray(y, dt)
    k = y.shape[-1]
    sds = jnp.sqrt(jnp.diagonal(y, axis1=-2, axis2=-1))
    from math_tpu.dists.continuous import lognormal_lpdf

    lp = lognormal_lpdf(sds, mu, sigma, propto=propto)
    dinv = 1.0 / sds
    corr = y * dinv[..., :, None] * dinv[..., None, :]
    lp = lp + lkj_corr_lpdf(corr, eta, propto=propto)
    return lp


def dirichlet_lpmf(theta, alpha, *, propto=False):
    from math_tpu.dists.multivariate import dirichlet_lpdf

    return dirichlet_lpdf(theta, alpha, propto=propto)


# --- beta_binomial cdfs (ref: beta_binomial_cdf.hpp) ------------------------


def _beta_binomial_cdf_elem(y, n, a, b, kmax):
    k = jnp.arange(kmax + 1, dtype=a.dtype)
    logpmf = (
        lchoose(n[..., None], k)
        + lbeta(k + a[..., None], n[..., None] - k + b[..., None])
        - lbeta(a[..., None], b[..., None])
    )
    pmf = jnp.where(k <= n[..., None], jnp.exp(logpmf), 0.0)
    return jnp.sum(jnp.where(k <= y[..., None], pmf, 0.0), axis=-1)


def _beta_binomial_cdf_args(y, n, alpha, beta):
    import numpy as np

    yb, nb, ab, bb = bcast(y, n, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb) & (nb >= 0)
    try:
        # bound from the RAW n argument: the broadcast nb picks up tracers
        # from (alpha, beta) even when n itself is concrete data
        kmax = int(np.max(np.asarray(n)))
    except Exception as e:  # tracer n: needs a concrete support bound
        raise ValueError(
            "beta_binomial cdf requires concrete n (support summation)"
        ) from e
    p = jnp.where(
        yb < 0,
        0.0,
        jnp.where(
            yb >= nb,
            1.0,
            _beta_binomial_cdf_elem(
                jnp.floor(yb), nb, safe(ab, ok), safe(bb, ok), kmax
            ),
        ),
    )
    return p, ok


def beta_binomial_cdf(y, n, alpha, beta):
    p, ok = _beta_binomial_cdf_args(y, n, alpha, beta)
    return finish_prod(p, ok)


def beta_binomial_lcdf(y, n, alpha, beta):
    p, ok = _beta_binomial_cdf_args(y, n, alpha, beta)
    return finish(jnp.log(jnp.maximum(p, 1e-300)), ok)


def beta_binomial_lccdf(y, n, alpha, beta):
    p, ok = _beta_binomial_cdf_args(y, n, alpha, beta)
    return finish(jnp.log1p(-jnp.minimum(p, 1.0 - 1e-16)), ok)


# --- neg_binomial lcdf/lccdf (ref: neg_binomial_lcdf.hpp) -------------------


def neg_binomial_lcdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb < 0,
        0.0,
        inc_beta(
            safe(ab, ok), jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, bb / (1.0 + bb)
        ),
    )
    return finish(jnp.log(jnp.maximum(p, 1e-300)), ok)


def neg_binomial_lccdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb < 0,
        0.0,
        inc_beta(
            safe(ab, ok), jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, bb / (1.0 + bb)
        ),
    )
    return finish(jnp.log1p(-jnp.minimum(p, 1.0 - 1e-16)), ok)


# --- glm rng (ref: bernoulli_logit_glm_rng.hpp) -----------------------------


def bernoulli_logit_glm_rng(key, x, alpha, beta, shape=None):
    x = jnp.asarray(x)
    eta = x @ jnp.asarray(beta) + alpha
    shape = shape if shape is not None else eta.shape
    return jax.random.bernoulli(key, jax.nn.sigmoid(eta), shape).astype(jnp.int32)
