"""Discrete univariate distributions.

Reference: ``prim/scal/prob/{bernoulli,binomial,beta_binomial,poisson,
neg_binomial*,hypergeometric}_*.hpp`` plus the categorical/ordered families
from ``prim/mat/prob``.  Same conventions as ``continuous.py``: summed lpmf
with trace-time ``propto`` pruning, product-form cdf, log-form lcdf/lccdf,
``jax.random`` rngs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp
from math_tpu.special.incbeta import inc_beta  # differentiable in (a, b, x)

from math_tpu.special import lbeta, lchoose, log1m, log1m_exp
from math_tpu.utils.propto import include_summand
from math_tpu.dists._util import (
    bcast,
    fdtype,
    finish,
    finish_prod,
    ok_ordered,
    ok_pos,
    ok_simplex,
    safe,
)


def _rng_shape(shape, *params):
    if shape is not None:
        return shape
    return jnp.broadcast_shapes(*(jnp.shape(p) for p in params))


def _int_ok(y):
    yf = jnp.asarray(y, dtype=fdtype(y))
    return jnp.isfinite(yf) & (yf == jnp.round(yf))


# --- bernoulli (ref: bernoulli_lpmf.hpp, bernoulli_logit_lpmf.hpp) ----------


def bernoulli_lpmf(y, theta, *, propto=False):
    yb, tb = bcast(y, theta)
    okp = jnp.isfinite(tb) & (tb >= 0) & (tb <= 1)
    sup = (yb == 0) | (yb == 1)
    ok = okp & sup
    t = jnp.clip(safe(tb, okp, 0.5), 1e-300, 1.0)
    lp = jnp.zeros_like(tb)
    if include_summand(propto, y, theta):
        lp = jsp.xlogy(yb, t) + jsp.xlog1py(1.0 - yb, -t)
    return finish(lp, ok)


def bernoulli_cdf(y, theta):
    yb, tb = bcast(y, theta)
    ok = (tb >= 0) & (tb <= 1)
    p = jnp.where(yb < 0, 0.0, jnp.where(yb < 1, 1.0 - tb, 1.0))
    return finish_prod(p, ok)


def bernoulli_lcdf(y, theta):
    yb, tb = bcast(y, theta)
    ok = (tb >= 0) & (tb <= 1)
    lp = jnp.where(yb < 0, -jnp.inf, jnp.where(yb < 1, log1m(tb), 0.0))
    return finish(lp, ok)


def bernoulli_lccdf(y, theta):
    yb, tb = bcast(y, theta)
    ok = (tb >= 0) & (tb <= 1)
    lp = jnp.where(yb < 0, 0.0, jnp.where(yb < 1, jnp.log(tb), -jnp.inf))
    return finish(lp, ok)


def bernoulli_rng(key, theta, shape=None):
    shape = _rng_shape(shape, theta)
    return jax.random.bernoulli(key, jnp.asarray(theta), shape).astype(jnp.int32)


def bernoulli_logit_lpmf(y, alpha, *, propto=False):
    """Fused logit bernoulli: -softplus(-sign*alpha) (ref: bernoulli_logit_lpmf.hpp)."""
    yb, ab = bcast(y, alpha)
    okp = jnp.isfinite(ab)
    sup = (yb == 0) | (yb == 1)
    ok = okp & sup
    sign = 2.0 * yb - 1.0
    lp = jnp.zeros_like(ab)
    if include_summand(propto, y, alpha):
        lp = -jax.nn.softplus(-sign * safe(ab, okp, 0.0))
    return finish(lp, ok)


def bernoulli_logit_rng(key, alpha, shape=None):
    shape = _rng_shape(shape, alpha)
    return jax.random.bernoulli(key, jax.nn.sigmoid(jnp.asarray(alpha)), shape).astype(
        jnp.int32
    )


# --- binomial (ref: binomial_lpmf.hpp, binomial_logit_lpmf.hpp) -------------


def binomial_lpmf(y, n, theta, *, propto=False):
    yb, nb, tb = bcast(y, n, theta)
    okp = (tb >= 0) & (tb <= 1) & (nb >= 0)
    sup = (yb >= 0) & (yb <= nb)
    ok = okp & sup
    t = safe(tb, okp, 0.5)
    lp = jnp.zeros_like(tb)
    if include_summand(propto):
        lp = lp + lchoose(nb, yb)
    if include_summand(propto, theta):
        lp = lp + jsp.xlogy(yb, t) + jsp.xlog1py(nb - yb, -t)
    return finish(lp, ok)


def binomial_cdf(y, n, theta):
    yb, nb, tb = bcast(y, n, theta)
    ok = (tb >= 0) & (tb <= 1) & (nb >= 0)
    yc = jnp.clip(yb, -1.0, nb)
    # P(Y <= y) = I_{1-theta}(n - y, y + 1)
    p = jnp.where(
        yc < 0,
        0.0,
        jnp.where(
            yc >= nb,
            1.0,
            inc_beta(jnp.maximum(nb - yc, 1e-10), yc + 1.0, 1.0 - tb),
        ),
    )
    return finish_prod(p, ok)


def binomial_lcdf(y, n, theta):
    yb, nb, tb = bcast(y, n, theta)
    ok = (tb >= 0) & (tb <= 1) & (nb >= 0)
    yc = jnp.clip(yb, -1.0, nb)
    p = jnp.where(
        yc < 0,
        0.0,
        jnp.where(
            yc >= nb,
            1.0,
            inc_beta(jnp.maximum(nb - yc, 1e-10), yc + 1.0, 1.0 - tb),
        ),
    )
    return finish(jnp.log(p), ok)


def binomial_lccdf(y, n, theta):
    yb, nb, tb = bcast(y, n, theta)
    ok = (tb >= 0) & (tb <= 1) & (nb >= 0)
    yc = jnp.clip(yb, -1.0, nb)
    p = jnp.where(
        yc < 0,
        0.0,
        jnp.where(
            yc >= nb,
            1.0,
            inc_beta(jnp.maximum(nb - yc, 1e-10), yc + 1.0, 1.0 - tb),
        ),
    )
    return finish(jnp.log1p(-p), ok)


def binomial_rng(key, n, theta, shape=None):
    shape = _rng_shape(shape, n, theta)
    return jax.random.binomial(key, n, theta, shape=shape).astype(jnp.int32)


def binomial_logit_lpmf(y, n, alpha, *, propto=False):
    yb, nb, ab = bcast(y, n, alpha)
    okp = jnp.isfinite(ab) & (nb >= 0)
    sup = (yb >= 0) & (yb <= nb)
    ok = okp & sup
    a = safe(ab, okp, 0.0)
    lp = jnp.zeros_like(ab)
    if include_summand(propto):
        lp = lp + lchoose(nb, yb)
    if include_summand(propto, alpha):
        lp = lp - yb * jax.nn.softplus(-a) - (nb - yb) * jax.nn.softplus(a)
    return finish(lp, ok)


def binomial_logit_rng(key, n, alpha, shape=None):
    return binomial_rng(key, n, jax.nn.sigmoid(jnp.asarray(alpha)), shape)


# --- beta_binomial (ref: beta_binomial_lpmf.hpp) ----------------------------


def beta_binomial_lpmf(y, n, alpha, beta, *, propto=False):
    yb, nb, ab, bb = bcast(y, n, alpha, beta)
    okp = ok_pos(ab) & ok_pos(bb) & (nb >= 0)
    sup = (yb >= 0) & (yb <= nb)
    ok = okp & sup
    a, b = safe(ab, okp), safe(bb, okp)
    ys = jnp.clip(yb, 0.0, nb)
    lp = jnp.zeros_like(ab)
    if include_summand(propto):
        lp = lp + lchoose(nb, ys)
    if include_summand(propto, alpha, beta):
        lp = lp + lbeta(ys + a, nb - ys + b) - lbeta(a, b)
    return finish(lp, ok)


def beta_binomial_rng(key, n, alpha, beta, shape=None):
    shape = _rng_shape(shape, n, alpha, beta)
    k1, k2 = jax.random.split(key)
    p = jax.random.beta(k1, alpha, beta, shape)
    return jax.random.binomial(k2, n, p, shape=shape).astype(jnp.int32)


# --- poisson (ref: poisson_lpmf.hpp, poisson_log_lpmf.hpp) ------------------


def poisson_lpmf(y, lam, *, propto=False):
    yb, lb = bcast(y, lam)
    okp = jnp.isfinite(lb) & (lb >= 0)
    sup = (yb >= 0) & _int_ok(yb)
    ok = okp & sup
    l = jnp.maximum(safe(lb, okp), 1e-300)
    ys = jnp.maximum(yb, 0.0)
    lp = jnp.zeros_like(lb)
    if include_summand(propto, lam):
        lp = lp - l
    if include_summand(propto, y, lam):
        lp = lp + jsp.xlogy(ys, l)
    if include_summand(propto, y):
        lp = lp - jsp.gammaln(ys + 1.0)
    return finish(lp, ok)


def poisson_cdf(y, lam):
    yb, lb = bcast(y, lam)
    ok = (lb >= 0) & jnp.isfinite(lb)
    p = jnp.where(yb < 0, 0.0, jsp.gammaincc(jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, lb))
    return finish_prod(p, ok)


def poisson_lcdf(y, lam):
    yb, lb = bcast(y, lam)
    ok = (lb >= 0) & jnp.isfinite(lb)
    p = jnp.where(yb < 0, 0.0, jsp.gammaincc(jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, lb))
    return finish(jnp.log(p), ok)


def poisson_lccdf(y, lam):
    yb, lb = bcast(y, lam)
    ok = (lb >= 0) & jnp.isfinite(lb)
    p = jnp.where(yb < 0, 0.0, jsp.gammainc(jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, lb))
    return finish(jnp.log(jnp.where(yb < 0, 1.0, p)), ok)


def poisson_rng(key, lam, shape=None):
    shape = _rng_shape(shape, lam)
    return jax.random.poisson(key, lam, shape)


def poisson_log_lpmf(y, alpha, *, propto=False):
    """Fused log-rate poisson: y*alpha - exp(alpha) (ref: poisson_log_lpmf.hpp)."""
    yb, ab = bcast(y, alpha)
    okp = ~jnp.isnan(ab)
    sup = (yb >= 0) & _int_ok(yb)
    ok = okp & sup
    a = safe(ab, okp, 0.0)
    ys = jnp.maximum(yb, 0.0)
    lp = jnp.zeros_like(ab)
    if include_summand(propto, y, alpha):
        lp = lp + ys * a
    if include_summand(propto, alpha):
        lp = lp - jnp.exp(a)
    if include_summand(propto, y):
        lp = lp - jsp.gammaln(ys + 1.0)
    return finish(lp, ok)


def poisson_log_rng(key, alpha, shape=None):
    shape = _rng_shape(shape, alpha)
    return jax.random.poisson(key, jnp.exp(jnp.asarray(alpha)), shape)


# --- negative binomial (ref: neg_binomial_lpmf.hpp, neg_binomial_2*.hpp) ----


def neg_binomial_lpmf(y, alpha, beta, *, propto=False):
    """Shape/inverse-scale parameterization (ref: neg_binomial_lpmf.hpp)."""
    yb, ab, bb = bcast(y, alpha, beta)
    okp = ok_pos(ab) & ok_pos(bb)
    sup = (yb >= 0) & _int_ok(yb)
    ok = okp & sup
    a, b = safe(ab, okp), safe(bb, okp)
    ys = jnp.maximum(yb, 0.0)
    lp = jnp.zeros_like(ab)
    if include_summand(propto, y, alpha):
        lp = lp + jsp.gammaln(ys + a) - jsp.gammaln(a)
    if include_summand(propto, y):
        lp = lp - jsp.gammaln(ys + 1.0)
    if include_summand(propto, alpha, beta):
        lp = lp + a * (jnp.log(b) - jnp.log1p(b))
    if include_summand(propto, y, beta):
        lp = lp - ys * jnp.log1p(b)
    return finish(lp, ok)


def neg_binomial_cdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    # P(Y <= y) = I_{b/(1+b)}(alpha, y+1)
    p = jnp.where(
        yb < 0,
        0.0,
        inc_beta(safe(ab, ok), jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, bb / (1.0 + bb)),
    )
    return finish_prod(p, ok)


def neg_binomial_rng(key, alpha, beta, shape=None):
    shape = _rng_shape(shape, alpha, beta)
    k1, k2 = jax.random.split(key)
    lam = jax.random.gamma(k1, alpha, shape) / beta
    return jax.random.poisson(k2, lam, shape)


def neg_binomial_2_lpmf(y, mu, phi, *, propto=False):
    """Mean/dispersion parameterization (ref: neg_binomial_2_lpmf.hpp)."""
    yb, mb, pb = bcast(y, mu, phi)
    okp = ok_pos(mb) & ok_pos(pb)
    sup = (yb >= 0) & _int_ok(yb)
    ok = okp & sup
    m, p = safe(mb, okp), safe(pb, okp)
    ys = jnp.maximum(yb, 0.0)
    log_mu_phi = jnp.log(m + p)
    lp = jnp.zeros_like(mb)
    if include_summand(propto, y, phi):
        lp = lp + jsp.gammaln(ys + p) - jsp.gammaln(p)
    if include_summand(propto, y):
        lp = lp - jsp.gammaln(ys + 1.0)
    if include_summand(propto, y, mu, phi):
        lp = lp + ys * (jnp.log(m) - log_mu_phi)
    if include_summand(propto, mu, phi):
        lp = lp + p * (jnp.log(p) - log_mu_phi)
    return finish(lp, ok)


def neg_binomial_2_cdf(y, mu, phi):
    yb, mb, pb = bcast(y, mu, phi)
    ok = ok_pos(mb) & ok_pos(pb)
    p = jnp.where(
        yb < 0,
        0.0,
        inc_beta(
            safe(pb, ok),
            jnp.floor(jnp.maximum(yb, 0.0)) + 1.0,
            pb / (pb + mb),
        ),
    )
    return finish_prod(p, ok)


def neg_binomial_2_lcdf(y, mu, phi):
    yb, mb, pb = bcast(y, mu, phi)
    ok = ok_pos(mb) & ok_pos(pb)
    p = jnp.where(
        yb < 0,
        0.0,
        inc_beta(
            safe(pb, ok), jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, pb / (pb + mb)
        ),
    )
    return finish(jnp.log(p), ok)


def neg_binomial_2_lccdf(y, mu, phi):
    yb, mb, pb = bcast(y, mu, phi)
    ok = ok_pos(mb) & ok_pos(pb)
    p = jnp.where(
        yb < 0,
        0.0,
        inc_beta(
            safe(pb, ok), jnp.floor(jnp.maximum(yb, 0.0)) + 1.0, pb / (pb + mb)
        ),
    )
    return finish(jnp.log1p(-p), ok)


def neg_binomial_2_rng(key, mu, phi, shape=None):
    shape = _rng_shape(shape, mu, phi)
    k1, k2 = jax.random.split(key)
    lam = jax.random.gamma(k1, phi, shape) * (mu / phi)
    return jax.random.poisson(k2, lam, shape)


def neg_binomial_2_log_lpmf(y, eta, phi, *, propto=False):
    """Log-mean parameterization, fused stable (ref: neg_binomial_2_log_lpmf.hpp)."""
    yb, eb, pb = bcast(y, eta, phi)
    okp = jnp.isfinite(eb) & ok_pos(pb)
    sup = (yb >= 0) & _int_ok(yb)
    ok = okp & sup
    e, p = safe(eb, okp, 0.0), safe(pb, okp)
    ys = jnp.maximum(yb, 0.0)
    log_phi = jnp.log(p)
    lse = jnp.logaddexp(e, log_phi)
    lp = jnp.zeros_like(eb)
    if include_summand(propto, y, phi):
        lp = lp + jsp.gammaln(ys + p) - jsp.gammaln(p)
    if include_summand(propto, y):
        lp = lp - jsp.gammaln(ys + 1.0)
    if include_summand(propto, y, eta, phi):
        lp = lp + ys * (e - lse)
    if include_summand(propto, eta, phi):
        lp = lp + p * (log_phi - lse)
    return finish(lp, ok)


def neg_binomial_2_log_rng(key, eta, phi, shape=None):
    return neg_binomial_2_rng(key, jnp.exp(jnp.asarray(eta)), phi, shape)


# --- hypergeometric (ref: hypergeometric_lpmf.hpp) --------------------------


def hypergeometric_lpmf(y, n, a, b, *, propto=False):
    """Successes y in n draws from a successes + b failures, no replacement."""
    yb, nb, ab, bb = bcast(y, n, a, b)
    okp = (nb >= 0) & (ab >= 0) & (bb >= 0) & (nb <= ab + bb)
    sup = (yb >= jnp.maximum(0.0, nb - bb)) & (yb <= jnp.minimum(ab, nb))
    ok = okp & sup
    ys = jnp.clip(yb, 0.0, ab)
    lp = lchoose(ab, ys) + lchoose(bb, nb - ys) - lchoose(ab + bb, nb)
    return finish(lp, ok)


def hypergeometric_rng(key, n, a, b, shape=None):
    """Sequential draws via Fisher's noncentral=1 urn scheme, vectorized."""
    shape = _rng_shape(shape, n, a, b)
    n = jnp.broadcast_to(jnp.asarray(n), shape)
    a = jnp.broadcast_to(jnp.asarray(a), shape)
    b = jnp.broadcast_to(jnp.asarray(b), shape)
    max_n = int(jnp.max(n)) if n.size else 0

    def body(i, carry):
        key, drawn, rem_a, rem_b = carry
        key, sub = jax.random.split(key)
        p = rem_a / jnp.maximum(rem_a + rem_b, 1)
        take = (jax.random.uniform(sub, shape) < p) & (i < n)
        drawn = drawn + take.astype(drawn.dtype)
        rem_a = rem_a - take.astype(rem_a.dtype)
        rem_b = rem_b - (~take & (i < n)).astype(rem_b.dtype)
        return key, drawn, rem_a, rem_b

    _, drawn, _, _ = jax.lax.fori_loop(
        0, max_n, body, (key, jnp.zeros(shape, jnp.int32), a, b)
    )
    return drawn


# --- categorical / ordered (ref: prim/mat/prob/categorical*,ordered*) -------


def categorical_lpmf(y, theta, *, propto=False):
    """y in 1..K (Stan 1-based); theta simplex over last axis."""
    theta = jnp.asarray(theta, dtype=fdtype(theta))
    yi = jnp.asarray(y, dtype=jnp.int32) - 1
    k = theta.shape[-1]
    ok = (yi >= 0) & (yi < k) & jnp.all(ok_simplex(theta))
    lp = jnp.log(jnp.take_along_axis(
        jnp.broadcast_to(theta, jnp.shape(yi) + (k,)),
        jnp.clip(yi, 0, k - 1)[..., None],
        axis=-1,
    ))[..., 0]
    return finish(lp, ok)


def categorical_logit_lpmf(y, beta, *, propto=False):
    """Fused log-softmax lookup (ref: categorical_logit_lpmf.hpp)."""
    beta = jnp.asarray(beta, dtype=fdtype(beta))
    yi = jnp.asarray(y, dtype=jnp.int32) - 1
    k = beta.shape[-1]
    ok = (yi >= 0) & (yi < k)
    logsm = jax.nn.log_softmax(beta, axis=-1)
    lp = jnp.take_along_axis(
        jnp.broadcast_to(logsm, jnp.shape(yi) + (k,)),
        jnp.clip(yi, 0, k - 1)[..., None],
        axis=-1,
    )[..., 0]
    return finish(lp, ok)


def categorical_rng(key, theta, shape=None):
    theta = jnp.asarray(theta)
    shape = shape if shape is not None else theta.shape[:-1]
    return (
        jax.random.categorical(key, jnp.log(theta), shape=shape) + 1
    ).astype(jnp.int32)


def categorical_logit_rng(key, beta, shape=None):
    beta = jnp.asarray(beta)
    shape = shape if shape is not None else beta.shape[:-1]
    return (jax.random.categorical(key, beta, shape=shape) + 1).astype(jnp.int32)


def _log_sigmoid_diff(a, b):
    """log(sigmoid(a) - sigmoid(b)) for a > b, stable."""
    return (
        -jax.nn.softplus(-a) - jax.nn.softplus(b) + log1m_exp(jnp.minimum(b - a, -1e-12))
    )


def ordered_logistic_lpmf(y, eta, c, *, propto=False):
    """y in 1..K, cutpoints c ordered length K-1 (ref: ordered_logistic_lpmf.hpp)."""
    eta = jnp.asarray(eta, dtype=fdtype(eta, c))
    c = jnp.asarray(c, dtype=eta.dtype)
    yi = jnp.asarray(y, dtype=jnp.int32) - 1
    km1 = c.shape[-1]
    k = km1 + 1
    ok = (yi >= 0) & (yi < k) & jnp.all(ok_ordered(c))
    yc = jnp.clip(yi, 0, k - 1)
    big = jnp.asarray(1e30, dtype=eta.dtype)
    cpad = jnp.concatenate(
        [jnp.full(c.shape[:-1] + (1,), -big), c, jnp.full(c.shape[:-1] + (1,), big)],
        axis=-1,
    )
    c_lo = jnp.take_along_axis(
        jnp.broadcast_to(cpad, jnp.shape(yc) + (k + 1,)), yc[..., None], axis=-1
    )[..., 0]
    c_hi = jnp.take_along_axis(
        jnp.broadcast_to(cpad, jnp.shape(yc) + (k + 1,)), yc[..., None] + 1, axis=-1
    )[..., 0]
    # P(y=k) = sigmoid(eta - c_{k-1}) - sigmoid(eta - c_k)
    a = eta - c_lo  # larger
    b = eta - c_hi
    lp = jnp.where(
        yc == 0,
        -jax.nn.softplus(eta - c_hi),  # 1 - sigmoid(eta - c_1)
        jnp.where(
            yc == k - 1,
            -jax.nn.softplus(-(eta - c_lo)),
            _log_sigmoid_diff(jnp.maximum(a, b), jnp.minimum(a, b)),
        ),
    )
    return finish(lp, ok)


def ordered_logistic_rng(key, eta, c, shape=None):
    eta = jnp.asarray(eta)
    c = jnp.asarray(c)
    shape = shape if shape is not None else jnp.shape(eta)
    u = jax.random.logistic(key, shape)
    return (1 + jnp.sum((eta + u)[..., None] > c, axis=-1)).astype(jnp.int32)


def ordered_probit_lpmf(y, eta, c, *, propto=False):
    """Ref: ordered_probit_lpmf.hpp; stable via log_ndtr + log_diff_exp."""
    eta = jnp.asarray(eta, dtype=fdtype(eta, c))
    c = jnp.asarray(c, dtype=eta.dtype)
    yi = jnp.asarray(y, dtype=jnp.int32) - 1
    km1 = c.shape[-1]
    k = km1 + 1
    ok = (yi >= 0) & (yi < k) & jnp.all(ok_ordered(c))
    yc = jnp.clip(yi, 0, k - 1)
    big = jnp.asarray(1e30, dtype=eta.dtype)
    cpad = jnp.concatenate(
        [jnp.full(c.shape[:-1] + (1,), -big), c, jnp.full(c.shape[:-1] + (1,), big)],
        axis=-1,
    )
    c_lo = jnp.take_along_axis(
        jnp.broadcast_to(cpad, jnp.shape(yc) + (k + 1,)), yc[..., None], axis=-1
    )[..., 0]
    c_hi = jnp.take_along_axis(
        jnp.broadcast_to(cpad, jnp.shape(yc) + (k + 1,)), yc[..., None] + 1, axis=-1
    )[..., 0]
    la = jsp.log_ndtr(eta - c_lo)  # larger
    lb = jsp.log_ndtr(eta - c_hi)
    lp = jnp.where(
        yc == 0,
        jsp.log_ndtr(c_hi - eta),
        jnp.where(
            yc == k - 1,
            jsp.log_ndtr(eta - c_lo),
            la + log1m_exp(jnp.minimum(lb - la, -1e-300)),
        ),
    )
    return finish(lp, ok)


def ordered_probit_rng(key, eta, c, shape=None):
    eta = jnp.asarray(eta)
    c = jnp.asarray(c)
    shape = shape if shape is not None else jnp.shape(eta)
    u = jax.random.normal(key, shape)
    return (1 + jnp.sum((eta + u)[..., None] > c, axis=-1)).astype(jnp.int32)
