"""Continuous univariate distributions.

Reference: ``stan/math/prim/scal/prob/*_{lpdf,cdf,lcdf,lccdf,rng}.hpp``
(27 continuous families).  Semantics preserved:

- ``*_lpdf(y, ...)`` returns the SUM of elementwise log densities;
  ``propto=True`` drops summands via trace-time ``include_summand``
  (ref: ``prim/scal/meta/include_summand.hpp``).
- ``*_cdf`` returns the product of elementwise cdfs; ``*_lcdf``/``*_lccdf``
  the sum of elementwise log-(c)cdfs (Stan's vectorized cdf semantics).
- ``*_rng(key, ..., shape)`` uses counter-based ``jax.random`` in place of
  ``boost::random`` (ref: ``prim/scal/prob/*_rng.hpp``).

Invalid parameters yield ``-inf`` (see ``_util`` module docstring for the
deviation rationale), with double-where sanitization for nan-free grads.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp
from math_tpu.special.incbeta import inc_beta  # differentiable in (a, b, x)

from math_tpu.special import (
    LOG_TWO,
    LOG_TWO_PI,
    LOG_SQRT_TWO_PI,
    lbeta,
    log_diff_exp,
    log_i0,
    log1m,
    log1m_exp,
    owens_t,
)
from math_tpu.utils.propto import include_summand
from math_tpu.dists._util import bcast, finish, finish_prod, ok_pos, safe


def _rng_shape(shape, *params):
    if shape is not None:
        return shape
    return jnp.broadcast_shapes(*(jnp.shape(p) for p in params))


# ---------------------------------------------------------------------------
# normal family (ref: normal_lpdf.hpp:36-112, std_normal_lpdf.hpp,
# lognormal_lpdf.hpp, normal_sufficient_lpdf.hpp)
# ---------------------------------------------------------------------------


def normal_lpdf(y, mu, sigma, *, propto=False):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & ok_pos(sb)
    s = safe(sb, ok)
    z = (yb - safe(mub, ok, 0.0)) / s
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, mu, sigma):
        lp = lp - 0.5 * jnp.square(z)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    if include_summand(propto):
        lp = lp - LOG_SQRT_TWO_PI
    return finish(lp, ok)


def normal_cdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    return finish_prod(jsp.ndtr((yb - mub) / safe(sb, ok)), ok)


def normal_lcdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    return finish(jsp.log_ndtr((yb - mub) / safe(sb, ok)), ok)


def normal_lccdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    return finish(jsp.log_ndtr(-(yb - mub) / safe(sb, ok)), ok)


def normal_rng(key, mu, sigma, shape=None):
    shape = _rng_shape(shape, mu, sigma)
    return mu + sigma * jax.random.normal(shape=shape, key=key)


def std_normal_lpdf(y, *, propto=False):
    (yb,) = bcast(y)
    ok = jnp.isfinite(yb)
    lp = -0.5 * jnp.square(safe(yb, ok, 0.0))
    if include_summand(propto):
        lp = lp - LOG_SQRT_TWO_PI
    return finish(lp, ok)


def std_normal_rng(key, shape=()):
    return jax.random.normal(key, shape)


def normal_sufficient_lpdf(y_bar, s_squared, n_obs, mu, sigma, *, propto=False):
    """Ref: normal_sufficient_lpdf.hpp — s_squared is the summed squared dev."""
    yb, ss, nb, mub, sb = bcast(y_bar, s_squared, n_obs, mu, sigma)
    ok = jnp.isfinite(yb) & (ss >= 0) & (nb > 0) & jnp.isfinite(mub) & ok_pos(sb)
    s = safe(sb, ok)
    lp = -(ss + nb * jnp.square(yb - safe(mub, ok, 0.0))) / (2.0 * jnp.square(s))
    if include_summand(propto, sigma):
        lp = lp - nb * jnp.log(s)
    if include_summand(propto):
        lp = lp - nb * LOG_SQRT_TWO_PI
    return finish(lp, ok)


def lognormal_lpdf(y, mu, sigma, *, propto=False):
    yb, mub, sb = bcast(y, mu, sigma)
    okp = jnp.isfinite(mub) & ok_pos(sb)
    sup = yb > 0
    ok = okp & jnp.isfinite(yb)
    ys = safe(yb, sup)
    s = safe(sb, okp)
    z = (jnp.log(ys) - safe(mub, okp, 0.0)) / s
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, mu, sigma):
        lp = lp - 0.5 * jnp.square(z)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    if include_summand(propto, y):
        lp = lp - jnp.log(ys)
    if include_summand(propto):
        lp = lp - LOG_SQRT_TWO_PI
    return finish(jnp.where(sup, lp, -jnp.inf), ok)


def lognormal_cdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    ys = safe(yb, yb > 0)
    p = jnp.where(yb > 0, jsp.ndtr((jnp.log(ys) - mub) / safe(sb, ok)), 0.0)
    return finish_prod(p, ok)


def lognormal_lcdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    ys = safe(yb, yb > 0)
    lp = jnp.where(
        yb > 0, jsp.log_ndtr((jnp.log(ys) - mub) / safe(sb, ok)), -jnp.inf
    )
    return finish(lp, ok)


def lognormal_lccdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    ys = safe(yb, yb > 0)
    lp = jnp.where(yb > 0, jsp.log_ndtr(-(jnp.log(ys) - mub) / safe(sb, ok)), 0.0)
    return finish(lp, ok)


def lognormal_rng(key, mu, sigma, shape=None):
    shape = _rng_shape(shape, mu, sigma)
    return jnp.exp(mu + sigma * jax.random.normal(key, shape))


# ---------------------------------------------------------------------------
# heavy tails: cauchy, student_t (ref: cauchy_lpdf.hpp, student_t_lpdf.hpp)
# ---------------------------------------------------------------------------


def cauchy_lpdf(y, mu, sigma, *, propto=False):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & ok_pos(sb)
    s = safe(sb, ok)
    z = (yb - safe(mub, ok, 0.0)) / s
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, mu, sigma):
        lp = lp - jnp.log1p(jnp.square(z))
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    if include_summand(propto):
        lp = lp - math.log(math.pi)
    return finish(lp, ok)


def cauchy_cdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    return finish_prod(jnp.arctan(z) / jnp.pi + 0.5, ok)


def cauchy_lcdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    return finish(jnp.log(jnp.arctan(z) / jnp.pi + 0.5), ok)


def cauchy_lccdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    return finish(jnp.log(0.5 - jnp.arctan(z) / jnp.pi), ok)


def cauchy_rng(key, mu, sigma, shape=None):
    shape = _rng_shape(shape, mu, sigma)
    return mu + sigma * jax.random.cauchy(key, shape)


def student_t_lpdf(y, nu, mu, sigma, *, propto=False):
    yb, nub, mub, sb = bcast(y, nu, mu, sigma)
    ok = jnp.isfinite(yb) & ok_pos(nub) & jnp.isfinite(mub) & ok_pos(sb)
    n = safe(nub, ok)
    s = safe(sb, ok)
    z = (yb - safe(mub, ok, 0.0)) / s
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, nu, mu, sigma):
        lp = lp - 0.5 * (n + 1.0) * jnp.log1p(jnp.square(z) / n)
    if include_summand(propto, nu):
        lp = lp + jsp.gammaln(0.5 * (n + 1.0)) - jsp.gammaln(0.5 * n)
        lp = lp - 0.5 * jnp.log(n)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    if include_summand(propto):
        lp = lp - 0.5 * math.log(math.pi)
    return finish(lp, ok)


def _student_t_cdf_elem(z, nu):
    """CDF of standard t via the regularized incomplete beta (the
    differentiable ``special.inc_beta``, so gradients wrt nu work —
    ref: inc_beta_dda/ddb powering student_t_cdf derivatives)."""
    from math_tpu.special import inc_beta

    q = nu / (nu + jnp.square(z))
    ib = inc_beta(0.5 * nu, 0.5 * jnp.ones_like(nu), q)
    return jnp.where(z > 0, 1.0 - 0.5 * ib, 0.5 * ib)


def student_t_cdf(y, nu, mu, sigma):
    yb, nub, mub, sb = bcast(y, nu, mu, sigma)
    ok = ok_pos(nub) & ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    return finish_prod(_student_t_cdf_elem(z, safe(nub, ok)), ok)


def student_t_lcdf(y, nu, mu, sigma):
    yb, nub, mub, sb = bcast(y, nu, mu, sigma)
    ok = ok_pos(nub) & ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    return finish(jnp.log(_student_t_cdf_elem(z, safe(nub, ok))), ok)


def student_t_lccdf(y, nu, mu, sigma):
    yb, nub, mub, sb = bcast(y, nu, mu, sigma)
    ok = ok_pos(nub) & ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    return finish(jnp.log(_student_t_cdf_elem(-z, safe(nub, ok))), ok)


def student_t_rng(key, nu, mu, sigma, shape=None):
    shape = _rng_shape(shape, nu, mu, sigma)
    return mu + sigma * jax.random.t(key, nu, shape)


# ---------------------------------------------------------------------------
# double_exponential, logistic, gumbel (ref: same-named *_lpdf.hpp)
# ---------------------------------------------------------------------------


def double_exponential_lpdf(y, mu, sigma, *, propto=False):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & ok_pos(sb)
    s = safe(sb, ok)
    z = (yb - safe(mub, ok, 0.0)) / s
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, mu, sigma):
        lp = lp - jnp.abs(z)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    if include_summand(propto):
        lp = lp - LOG_TWO
    return finish(lp, ok)


def double_exponential_cdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    p = jnp.where(
        z < 0, 0.5 * jnp.exp(jnp.minimum(z, 0.0)), 1.0 - 0.5 * jnp.exp(-jnp.maximum(z, 0.0))
    )
    return finish_prod(p, ok)


def double_exponential_lcdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    lp = jnp.where(
        z < 0,
        jnp.minimum(z, 0.0) - LOG_TWO,
        jnp.log1p(-0.5 * jnp.exp(-jnp.maximum(z, 0.0))),
    )
    return finish(lp, ok)


def double_exponential_lccdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    z = (yb - mub) / safe(sb, ok)
    lp = jnp.where(
        z > 0,
        -jnp.maximum(z, 0.0) - LOG_TWO,
        jnp.log1p(-0.5 * jnp.exp(jnp.minimum(z, 0.0))),
    )
    return finish(lp, ok)


def double_exponential_rng(key, mu, sigma, shape=None):
    shape = _rng_shape(shape, mu, sigma)
    return mu + sigma * jax.random.laplace(key, shape)


def logistic_lpdf(y, mu, sigma, *, propto=False):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & ok_pos(sb)
    s = safe(sb, ok)
    z = (yb - safe(mub, ok, 0.0)) / s
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, mu, sigma):
        lp = lp - z - 2.0 * jax.nn.softplus(-z)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    return finish(lp, ok)


def logistic_cdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    return finish_prod(jax.nn.sigmoid((yb - mub) / safe(sb, ok)), ok)


def logistic_lcdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    return finish(-jax.nn.softplus(-(yb - mub) / safe(sb, ok)), ok)


def logistic_lccdf(y, mu, sigma):
    yb, mub, sb = bcast(y, mu, sigma)
    ok = ok_pos(sb)
    return finish(-jax.nn.softplus((yb - mub) / safe(sb, ok)), ok)


def logistic_rng(key, mu, sigma, shape=None):
    shape = _rng_shape(shape, mu, sigma)
    return mu + sigma * jax.random.logistic(key, shape)


def gumbel_lpdf(y, mu, beta, *, propto=False):
    yb, mub, bb = bcast(y, mu, beta)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & ok_pos(bb)
    b = safe(bb, ok)
    z = (yb - safe(mub, ok, 0.0)) / b
    lp = jnp.zeros_like(z)
    if include_summand(propto, y, mu, beta):
        lp = lp - z - jnp.exp(-z)
    if include_summand(propto, beta):
        lp = lp - jnp.log(b)
    return finish(lp, ok)


def gumbel_cdf(y, mu, beta):
    yb, mub, bb = bcast(y, mu, beta)
    ok = ok_pos(bb)
    z = (yb - mub) / safe(bb, ok)
    return finish_prod(jnp.exp(-jnp.exp(-z)), ok)


def gumbel_lcdf(y, mu, beta):
    yb, mub, bb = bcast(y, mu, beta)
    ok = ok_pos(bb)
    z = (yb - mub) / safe(bb, ok)
    return finish(-jnp.exp(-z), ok)


def gumbel_lccdf(y, mu, beta):
    yb, mub, bb = bcast(y, mu, beta)
    ok = ok_pos(bb)
    z = (yb - mub) / safe(bb, ok)
    return finish(log1m_exp(-jnp.exp(-z)), ok)


def gumbel_rng(key, mu, beta, shape=None):
    shape = _rng_shape(shape, mu, beta)
    return mu + beta * jax.random.gumbel(key, shape)


# ---------------------------------------------------------------------------
# positive support: exponential, gamma, inv_gamma, chi_square,
# inv_chi_square, scaled_inv_chi_square, weibull, frechet, rayleigh
# ---------------------------------------------------------------------------


def exponential_lpdf(y, beta, *, propto=False):
    """Rate parameterization (ref: exponential_lpdf.hpp)."""
    yb, bb = bcast(y, beta)
    okp = ok_pos(bb)
    sup = yb >= 0
    ok = okp & sup & jnp.isfinite(yb)
    b = safe(bb, okp)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, beta):
        lp = lp + jnp.log(b)
    if include_summand(propto, y, beta):
        lp = lp - b * safe(yb, sup, 0.0)
    return finish(lp, ok)


def exponential_cdf(y, beta):
    yb, bb = bcast(y, beta)
    ok = ok_pos(bb)
    p = jnp.where(yb > 0, -jnp.expm1(-safe(bb, ok) * jnp.maximum(yb, 0.0)), 0.0)
    return finish_prod(p, ok)


def exponential_lcdf(y, beta):
    yb, bb = bcast(y, beta)
    ok = ok_pos(bb)
    lp = jnp.where(
        yb > 0, log1m_exp(-safe(bb, ok) * jnp.maximum(yb, 1e-300)), -jnp.inf
    )
    return finish(lp, ok)


def exponential_lccdf(y, beta):
    yb, bb = bcast(y, beta)
    ok = ok_pos(bb)
    return finish(jnp.where(yb > 0, -safe(bb, ok) * jnp.maximum(yb, 0.0), 0.0), ok)


def exponential_rng(key, beta, shape=None):
    shape = _rng_shape(shape, beta)
    return jax.random.exponential(key, shape) / beta


def gamma_lpdf(y, alpha, beta, *, propto=False):
    """Shape/rate (ref: gamma_lpdf.hpp)."""
    yb, ab, bb = bcast(y, alpha, beta)
    okp = ok_pos(ab) & ok_pos(bb)
    sup = yb > 0
    ok = okp & sup
    a, b, ys = safe(ab, okp), safe(bb, okp), safe(yb, sup)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha):
        lp = lp - jsp.gammaln(a)
    if include_summand(propto, alpha, beta):
        lp = lp + a * jnp.log(b)
    if include_summand(propto, y, alpha):
        lp = lp + (a - 1.0) * jnp.log(ys)
    if include_summand(propto, y, beta):
        lp = lp - b * ys
    return finish(lp, ok)


def gamma_cdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(yb > 0, jsp.gammainc(safe(ab, ok), safe(bb, ok) * jnp.maximum(yb, 0.0)), 0.0)
    return finish_prod(p, ok)


def gamma_lcdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb > 0,
        jsp.gammainc(safe(ab, ok), safe(bb, ok) * jnp.maximum(yb, 1e-300)),
        0.0,
    )
    return finish(jnp.log(p), ok)


def gamma_lccdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb > 0,
        jsp.gammaincc(safe(ab, ok), safe(bb, ok) * jnp.maximum(yb, 0.0)),
        1.0,
    )
    return finish(jnp.log(p), ok)


def gamma_rng(key, alpha, beta, shape=None):
    shape = _rng_shape(shape, alpha, beta)
    return jax.random.gamma(key, alpha, shape) / beta


def inv_gamma_lpdf(y, alpha, beta, *, propto=False):
    yb, ab, bb = bcast(y, alpha, beta)
    okp = ok_pos(ab) & ok_pos(bb)
    sup = yb > 0
    ok = okp & sup
    a, b, ys = safe(ab, okp), safe(bb, okp), safe(yb, sup)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha):
        lp = lp - jsp.gammaln(a)
    if include_summand(propto, alpha, beta):
        lp = lp + a * jnp.log(b)
    if include_summand(propto, y, alpha):
        lp = lp - (a + 1.0) * jnp.log(ys)
    if include_summand(propto, y, beta):
        lp = lp - b / ys
    return finish(lp, ok)


def inv_gamma_cdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb > 0, jsp.gammaincc(safe(ab, ok), safe(bb, ok) / jnp.maximum(yb, 1e-300)), 0.0
    )
    return finish_prod(p, ok)


def inv_gamma_lcdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb > 0, jsp.gammaincc(safe(ab, ok), safe(bb, ok) / jnp.maximum(yb, 1e-300)), 0.0
    )
    return finish(jnp.log(p), ok)


def inv_gamma_lccdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    p = jnp.where(
        yb > 0, jsp.gammainc(safe(ab, ok), safe(bb, ok) / jnp.maximum(yb, 1e-300)), 1.0
    )
    return finish(jnp.log(p), ok)


def inv_gamma_rng(key, alpha, beta, shape=None):
    shape = _rng_shape(shape, alpha, beta)
    return beta / jax.random.gamma(key, alpha, shape)


def chi_square_lpdf(y, nu, *, propto=False):
    yb, nb = bcast(y, nu)
    okp = ok_pos(nb)
    sup = yb > 0
    ok = okp & sup
    n, ys = safe(nb, okp), safe(yb, sup)
    half_n = 0.5 * n
    lp = jnp.zeros_like(yb)
    if include_summand(propto, nu):
        lp = lp - jsp.gammaln(half_n) - half_n * LOG_TWO
    if include_summand(propto, y, nu):
        lp = lp + (half_n - 1.0) * jnp.log(ys)
    if include_summand(propto, y):
        lp = lp - 0.5 * ys
    return finish(lp, ok)


def chi_square_cdf(y, nu):
    yb, nb = bcast(y, nu)
    ok = ok_pos(nb)
    p = jnp.where(yb > 0, jsp.gammainc(0.5 * safe(nb, ok), 0.5 * jnp.maximum(yb, 0.0)), 0.0)
    return finish_prod(p, ok)


def chi_square_lcdf(y, nu):
    yb, nb = bcast(y, nu)
    ok = ok_pos(nb)
    p = jnp.where(yb > 0, jsp.gammainc(0.5 * safe(nb, ok), 0.5 * jnp.maximum(yb, 1e-300)), 0.0)
    return finish(jnp.log(p), ok)


def chi_square_lccdf(y, nu):
    yb, nb = bcast(y, nu)
    ok = ok_pos(nb)
    p = jnp.where(yb > 0, jsp.gammaincc(0.5 * safe(nb, ok), 0.5 * jnp.maximum(yb, 0.0)), 1.0)
    return finish(jnp.log(p), ok)


def chi_square_rng(key, nu, shape=None):
    shape = _rng_shape(shape, nu)
    return 2.0 * jax.random.gamma(key, 0.5 * jnp.asarray(nu), shape)


def inv_chi_square_lpdf(y, nu, *, propto=False):
    yb, nb = bcast(y, nu)
    okp = ok_pos(nb)
    sup = yb > 0
    ok = okp & sup
    n, ys = safe(nb, okp), safe(yb, sup)
    half_n = 0.5 * n
    lp = jnp.zeros_like(yb)
    if include_summand(propto, nu):
        lp = lp - jsp.gammaln(half_n) - half_n * LOG_TWO
    if include_summand(propto, y, nu):
        lp = lp - (half_n + 1.0) * jnp.log(ys)
    if include_summand(propto, y):
        lp = lp - 0.5 / ys
    return finish(lp, ok)


def inv_chi_square_cdf(y, nu):
    yb, nb = bcast(y, nu)
    ok = ok_pos(nb)
    p = jnp.where(
        yb > 0, jsp.gammaincc(0.5 * safe(nb, ok), 0.5 / jnp.maximum(yb, 1e-300)), 0.0
    )
    return finish_prod(p, ok)


def inv_chi_square_lcdf(y, nu):
    yb, nb = bcast(y, nu)
    ok = ok_pos(nb)
    p = jnp.where(
        yb > 0, jsp.gammaincc(0.5 * safe(nb, ok), 0.5 / jnp.maximum(yb, 1e-300)), 0.0
    )
    return finish(jnp.log(p), ok)


def inv_chi_square_lccdf(y, nu):
    yb, nb = bcast(y, nu)
    ok = ok_pos(nb)
    p = jnp.where(
        yb > 0, jsp.gammainc(0.5 * safe(nb, ok), 0.5 / jnp.maximum(yb, 1e-300)), 1.0
    )
    return finish(jnp.log(p), ok)


def inv_chi_square_rng(key, nu, shape=None):
    shape = _rng_shape(shape, nu)
    return 0.5 / jax.random.gamma(key, 0.5 * jnp.asarray(nu), shape)


def scaled_inv_chi_square_lpdf(y, nu, s, *, propto=False):
    yb, nb, sb = bcast(y, nu, s)
    okp = ok_pos(nb) & ok_pos(sb)
    sup = yb > 0
    ok = okp & sup
    n, sc, ys = safe(nb, okp), safe(sb, okp), safe(yb, sup)
    half_n = 0.5 * n
    lp = jnp.zeros_like(yb)
    if include_summand(propto, nu):
        lp = lp + half_n * jnp.log(half_n) - jsp.gammaln(half_n)
    if include_summand(propto, nu, s):
        lp = lp + n * jnp.log(sc)
    if include_summand(propto, y, nu):
        lp = lp - (half_n + 1.0) * jnp.log(ys)
    if include_summand(propto, y, nu, s):
        lp = lp - half_n * jnp.square(sc) / ys  # nu*s^2/(2y)
    return finish(lp, ok)


def scaled_inv_chi_square_cdf(y, nu, s):
    yb, nb, sb = bcast(y, nu, s)
    ok = ok_pos(nb) & ok_pos(sb)
    arg = 0.5 * safe(nb, ok) * jnp.square(safe(sb, ok)) / jnp.maximum(yb, 1e-300)
    p = jnp.where(yb > 0, jsp.gammaincc(0.5 * safe(nb, ok), arg), 0.0)
    return finish_prod(p, ok)


def scaled_inv_chi_square_lcdf(y, nu, s):
    yb, nb, sb = bcast(y, nu, s)
    ok = ok_pos(nb) & ok_pos(sb)
    arg = 0.5 * safe(nb, ok) * jnp.square(safe(sb, ok)) / jnp.maximum(yb, 1e-300)
    p = jnp.where(yb > 0, jsp.gammaincc(0.5 * safe(nb, ok), arg), 0.0)
    return finish(jnp.log(p), ok)


def scaled_inv_chi_square_lccdf(y, nu, s):
    yb, nb, sb = bcast(y, nu, s)
    ok = ok_pos(nb) & ok_pos(sb)
    arg = 0.5 * safe(nb, ok) * jnp.square(safe(sb, ok)) / jnp.maximum(yb, 1e-300)
    p = jnp.where(yb > 0, jsp.gammainc(0.5 * safe(nb, ok), arg), 1.0)
    return finish(jnp.log(p), ok)


def scaled_inv_chi_square_rng(key, nu, s, shape=None):
    shape = _rng_shape(shape, nu, s)
    nu = jnp.asarray(nu)
    return 0.5 * nu * jnp.square(s) / jax.random.gamma(key, 0.5 * nu, shape)


def weibull_lpdf(y, alpha, sigma, *, propto=False):
    """Shape alpha, scale sigma (ref: weibull_lpdf.hpp)."""
    yb, ab, sb = bcast(y, alpha, sigma)
    okp = ok_pos(ab) & ok_pos(sb)
    sup = yb >= 0
    ok = okp & sup & jnp.isfinite(yb)
    a, s, ys = safe(ab, okp), safe(sb, okp), safe(yb, yb > 0)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha):
        lp = lp + jnp.log(a)
    if include_summand(propto, y, alpha, sigma):
        lp = lp + (a - 1.0) * (jnp.log(ys) - jnp.log(s)) - jnp.power(ys / s, a)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    return finish(lp, ok)


def weibull_cdf(y, alpha, sigma):
    yb, ab, sb = bcast(y, alpha, sigma)
    ok = ok_pos(ab) & ok_pos(sb)
    p = jnp.where(
        yb > 0,
        -jnp.expm1(-jnp.power(jnp.maximum(yb, 0.0) / safe(sb, ok), safe(ab, ok))),
        0.0,
    )
    return finish_prod(p, ok)


def weibull_lcdf(y, alpha, sigma):
    yb, ab, sb = bcast(y, alpha, sigma)
    ok = ok_pos(ab) & ok_pos(sb)
    lp = jnp.where(
        yb > 0,
        log1m_exp(-jnp.power(jnp.maximum(yb, 1e-300) / safe(sb, ok), safe(ab, ok))),
        -jnp.inf,
    )
    return finish(lp, ok)


def weibull_lccdf(y, alpha, sigma):
    yb, ab, sb = bcast(y, alpha, sigma)
    ok = ok_pos(ab) & ok_pos(sb)
    lp = jnp.where(
        yb > 0, -jnp.power(jnp.maximum(yb, 0.0) / safe(sb, ok), safe(ab, ok)), 0.0
    )
    return finish(lp, ok)


def weibull_rng(key, alpha, sigma, shape=None):
    shape = _rng_shape(shape, alpha, sigma)
    e = jax.random.exponential(key, shape)
    return sigma * jnp.power(e, 1.0 / jnp.asarray(alpha, dtype=e.dtype))


def frechet_lpdf(y, alpha, sigma, *, propto=False):
    yb, ab, sb = bcast(y, alpha, sigma)
    okp = ok_pos(ab) & ok_pos(sb)
    sup = yb > 0
    ok = okp & sup
    a, s, ys = safe(ab, okp), safe(sb, okp), safe(yb, sup)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha):
        lp = lp + jnp.log(a)
    if include_summand(propto, y, alpha, sigma):
        lp = lp + (a + 1.0) * (jnp.log(s) - jnp.log(ys)) - jnp.power(s / ys, a)
    if include_summand(propto, sigma):
        lp = lp - jnp.log(s)
    return finish(lp, ok)


def frechet_cdf(y, alpha, sigma):
    yb, ab, sb = bcast(y, alpha, sigma)
    ok = ok_pos(ab) & ok_pos(sb)
    p = jnp.where(
        yb > 0,
        jnp.exp(-jnp.power(safe(sb, ok) / jnp.maximum(yb, 1e-300), safe(ab, ok))),
        0.0,
    )
    return finish_prod(p, ok)


def frechet_lcdf(y, alpha, sigma):
    yb, ab, sb = bcast(y, alpha, sigma)
    ok = ok_pos(ab) & ok_pos(sb)
    lp = jnp.where(
        yb > 0,
        -jnp.power(safe(sb, ok) / jnp.maximum(yb, 1e-300), safe(ab, ok)),
        -jnp.inf,
    )
    return finish(lp, ok)


def frechet_lccdf(y, alpha, sigma):
    yb, ab, sb = bcast(y, alpha, sigma)
    ok = ok_pos(ab) & ok_pos(sb)
    lp = jnp.where(
        yb > 0,
        log1m_exp(-jnp.power(safe(sb, ok) / jnp.maximum(yb, 1e-300), safe(ab, ok))),
        0.0,
    )
    return finish(lp, ok)


def frechet_rng(key, alpha, sigma, shape=None):
    shape = _rng_shape(shape, alpha, sigma)
    e = jax.random.exponential(key, shape)
    return sigma * jnp.power(e, -1.0 / jnp.asarray(alpha, dtype=e.dtype))


def rayleigh_lpdf(y, sigma, *, propto=False):
    yb, sb = bcast(y, sigma)
    okp = ok_pos(sb)
    sup = yb >= 0
    ok = okp & sup & jnp.isfinite(yb)
    s, ys = safe(sb, okp), safe(yb, yb > 0)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, y):
        lp = lp + jnp.log(ys)
    if include_summand(propto, sigma):
        lp = lp - 2.0 * jnp.log(s)
    if include_summand(propto, y, sigma):
        lp = lp - 0.5 * jnp.square(ys / s)
    return finish(lp, ok)


def rayleigh_cdf(y, sigma):
    yb, sb = bcast(y, sigma)
    ok = ok_pos(sb)
    p = jnp.where(yb > 0, -jnp.expm1(-0.5 * jnp.square(jnp.maximum(yb, 0.0) / safe(sb, ok))), 0.0)
    return finish_prod(p, ok)


def rayleigh_lcdf(y, sigma):
    yb, sb = bcast(y, sigma)
    ok = ok_pos(sb)
    lp = jnp.where(
        yb > 0,
        log1m_exp(-0.5 * jnp.square(jnp.maximum(yb, 1e-300) / safe(sb, ok))),
        -jnp.inf,
    )
    return finish(lp, ok)


def rayleigh_lccdf(y, sigma):
    yb, sb = bcast(y, sigma)
    ok = ok_pos(sb)
    return finish(
        jnp.where(yb > 0, -0.5 * jnp.square(jnp.maximum(yb, 0.0) / safe(sb, ok)), 0.0),
        ok,
    )


def rayleigh_rng(key, sigma, shape=None):
    shape = _rng_shape(shape, sigma)
    return sigma * jnp.sqrt(2.0 * jax.random.exponential(key, shape))


# ---------------------------------------------------------------------------
# pareto family (ref: pareto_lpdf.hpp, pareto_type_2_lpdf.hpp)
# ---------------------------------------------------------------------------


def pareto_lpdf(y, y_min, alpha, *, propto=False):
    yb, mb, ab = bcast(y, y_min, alpha)
    okp = ok_pos(mb) & ok_pos(ab)
    sup = yb >= mb
    ok = okp & sup & jnp.isfinite(yb)
    m, a, ys = safe(mb, okp), safe(ab, okp), safe(yb, yb > 0)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha):
        lp = lp + jnp.log(a)
    if include_summand(propto, y_min, alpha):
        lp = lp + a * jnp.log(m)
    if include_summand(propto, y, alpha):
        lp = lp - (a + 1.0) * jnp.log(ys)
    return finish(lp, ok)


def pareto_cdf(y, y_min, alpha):
    yb, mb, ab = bcast(y, y_min, alpha)
    ok = ok_pos(mb) & ok_pos(ab)
    p = jnp.where(
        yb >= mb,
        -jnp.expm1(safe(ab, ok) * (jnp.log(safe(mb, ok)) - jnp.log(jnp.maximum(yb, 1e-300)))),
        0.0,
    )
    return finish_prod(p, ok)


def pareto_lcdf(y, y_min, alpha):
    yb, mb, ab = bcast(y, y_min, alpha)
    ok = ok_pos(mb) & ok_pos(ab)
    r = safe(ab, ok) * (jnp.log(safe(mb, ok)) - jnp.log(jnp.maximum(yb, 1e-300)))
    lp = jnp.where(yb > mb, log1m_exp(jnp.minimum(r, -1e-300)), -jnp.inf)
    return finish(lp, ok)


def pareto_lccdf(y, y_min, alpha):
    yb, mb, ab = bcast(y, y_min, alpha)
    ok = ok_pos(mb) & ok_pos(ab)
    r = safe(ab, ok) * (jnp.log(safe(mb, ok)) - jnp.log(jnp.maximum(yb, 1e-300)))
    return finish(jnp.where(yb >= mb, r, 0.0), ok)


def pareto_rng(key, y_min, alpha, shape=None):
    shape = _rng_shape(shape, y_min, alpha)
    e = jax.random.exponential(key, shape)
    return y_min * jnp.exp(e / jnp.asarray(alpha, dtype=e.dtype))


def pareto_type_2_lpdf(y, mu, lam, alpha, *, propto=False):
    yb, mub, lb, ab = bcast(y, mu, lam, alpha)
    okp = jnp.isfinite(mub) & ok_pos(lb) & ok_pos(ab)
    sup = yb >= mub
    ok = okp & sup & jnp.isfinite(yb)
    l, a = safe(lb, okp), safe(ab, okp)
    z = (yb - safe(mub, okp, 0.0)) / l
    z = jnp.maximum(z, 0.0)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha):
        lp = lp + jnp.log(a)
    if include_summand(propto, lam):
        lp = lp - jnp.log(l)
    if include_summand(propto, y, mu, lam, alpha):
        lp = lp - (a + 1.0) * jnp.log1p(z)
    return finish(lp, ok)


def pareto_type_2_cdf(y, mu, lam, alpha):
    yb, mub, lb, ab = bcast(y, mu, lam, alpha)
    ok = ok_pos(lb) & ok_pos(ab)
    z = jnp.maximum((yb - mub) / safe(lb, ok), 0.0)
    p = -jnp.expm1(-safe(ab, ok) * jnp.log1p(z))
    return finish_prod(p, ok)


def pareto_type_2_lcdf(y, mu, lam, alpha):
    yb, mub, lb, ab = bcast(y, mu, lam, alpha)
    ok = ok_pos(lb) & ok_pos(ab)
    z = jnp.maximum((yb - mub) / safe(lb, ok), 0.0)
    r = -safe(ab, ok) * jnp.log1p(z)
    lp = jnp.where(yb > mub, log1m_exp(jnp.minimum(r, -1e-300)), -jnp.inf)
    return finish(lp, ok)


def pareto_type_2_lccdf(y, mu, lam, alpha):
    yb, mub, lb, ab = bcast(y, mu, lam, alpha)
    ok = ok_pos(lb) & ok_pos(ab)
    z = jnp.maximum((yb - mub) / safe(lb, ok), 0.0)
    return finish(-safe(ab, ok) * jnp.log1p(z), ok)


def pareto_type_2_rng(key, mu, lam, alpha, shape=None):
    shape = _rng_shape(shape, mu, lam, alpha)
    e = jax.random.exponential(key, shape)
    return mu + lam * jnp.expm1(e / jnp.asarray(alpha, dtype=e.dtype))


# ---------------------------------------------------------------------------
# (0,1) support: beta, beta_proportion, uniform
# ---------------------------------------------------------------------------


def beta_lpdf(y, alpha, beta, *, propto=False):
    yb, ab, bb = bcast(y, alpha, beta)
    okp = ok_pos(ab) & ok_pos(bb)
    sup = (yb > 0) & (yb < 1)
    ok = okp & sup
    a, b, ys = safe(ab, okp), safe(bb, okp), safe(yb, sup, 0.5)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha, beta):
        lp = lp - lbeta(a, b)
    if include_summand(propto, y, alpha):
        lp = lp + (a - 1.0) * jnp.log(ys)
    if include_summand(propto, y, beta):
        lp = lp + (b - 1.0) * jnp.log1p(-ys)
    return finish(lp, ok)


def beta_cdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    yc = jnp.clip(yb, 0.0, 1.0)
    return finish_prod(inc_beta(safe(ab, ok), safe(bb, ok), yc), ok)


def beta_lcdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    yc = jnp.clip(yb, 0.0, 1.0)
    return finish(jnp.log(inc_beta(safe(ab, ok), safe(bb, ok), yc)), ok)


def beta_lccdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ok_pos(ab) & ok_pos(bb)
    yc = jnp.clip(yb, 0.0, 1.0)
    return finish(jnp.log(inc_beta(safe(bb, ok), safe(ab, ok), 1.0 - yc)), ok)


def beta_rng(key, alpha, beta, shape=None):
    shape = _rng_shape(shape, alpha, beta)
    return jax.random.beta(key, alpha, beta, shape)


def beta_proportion_lpdf(y, mu, kappa, *, propto=False):
    """mu in (0,1) mean, kappa > 0 precision (ref: beta_proportion_lpdf.hpp)."""
    yb, mub, kb = bcast(y, mu, kappa)
    okp = jnp.isfinite(mub) & (mub > 0) & (mub < 1) & ok_pos(kb)
    sup = (yb > 0) & (yb < 1)
    ok = okp & sup
    m, k, ys = safe(mub, okp, 0.5), safe(kb, okp), safe(yb, sup, 0.5)
    a = m * k
    b = (1.0 - m) * k
    lp = jnp.zeros_like(yb)
    if include_summand(propto, mu, kappa):
        lp = lp - lbeta(a, b)
    if include_summand(propto, y, mu, kappa):
        lp = lp + (a - 1.0) * jnp.log(ys) + (b - 1.0) * jnp.log1p(-ys)
    return finish(lp, ok)


def beta_proportion_lcdf(y, mu, kappa):
    yb, mub, kb = bcast(y, mu, kappa)
    ok = (mub > 0) & (mub < 1) & ok_pos(kb)
    m, k = safe(mub, ok, 0.5), safe(kb, ok)
    yc = jnp.clip(yb, 0.0, 1.0)
    return finish(jnp.log(inc_beta(m * k, (1.0 - m) * k, yc)), ok)


def beta_proportion_lccdf(y, mu, kappa):
    yb, mub, kb = bcast(y, mu, kappa)
    ok = (mub > 0) & (mub < 1) & ok_pos(kb)
    m, k = safe(mub, ok, 0.5), safe(kb, ok)
    yc = jnp.clip(yb, 0.0, 1.0)
    return finish(jnp.log(inc_beta((1.0 - m) * k, m * k, 1.0 - yc)), ok)


def beta_proportion_rng(key, mu, kappa, shape=None):
    shape = _rng_shape(shape, mu, kappa)
    mu = jnp.asarray(mu)
    return jax.random.beta(key, mu * kappa, (1.0 - mu) * kappa, shape)


def uniform_lpdf(y, alpha, beta, *, propto=False):
    yb, ab, bb = bcast(y, alpha, beta)
    okp = jnp.isfinite(ab) & jnp.isfinite(bb) & (ab < bb)
    sup = (yb >= ab) & (yb <= bb)
    ok = okp & sup
    lp = jnp.zeros_like(yb)
    if include_summand(propto, alpha, beta):
        lp = lp - jnp.log(safe(bb - ab, okp))
    return finish(lp, ok)


def uniform_cdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ab < bb
    p = jnp.clip((yb - ab) / safe(bb - ab, ok), 0.0, 1.0)
    return finish_prod(p, ok)


def uniform_lcdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ab < bb
    p = jnp.clip((yb - ab) / safe(bb - ab, ok), 0.0, 1.0)
    return finish(jnp.log(p), ok)


def uniform_lccdf(y, alpha, beta):
    yb, ab, bb = bcast(y, alpha, beta)
    ok = ab < bb
    p = jnp.clip((yb - ab) / safe(bb - ab, ok), 0.0, 1.0)
    return finish(jnp.log1p(-p), ok)


def uniform_rng(key, alpha, beta, shape=None):
    shape = _rng_shape(shape, alpha, beta)
    return alpha + (beta - alpha) * jax.random.uniform(key, shape)


# ---------------------------------------------------------------------------
# circular / skewed: von_mises, skew_normal, exp_mod_normal
# ---------------------------------------------------------------------------


def von_mises_lpdf(y, mu, kappa, *, propto=False):
    yb, mub, kb = bcast(y, mu, kappa)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & jnp.isfinite(kb) & (kb >= 0)
    k = safe(kb, ok)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, y, mu, kappa):
        lp = lp + k * jnp.cos(yb - safe(mub, ok, 0.0))
    if include_summand(propto, kappa):
        lp = lp - log_i0(k)
    if include_summand(propto):
        lp = lp - LOG_TWO_PI
    return finish(lp, ok)


def von_mises_rng(key, mu, kappa, shape=None):
    """Best-Fisher rejection-free approximation via wrapped inversion.

    Uses the standard Best & Fisher (1979) envelope with a fixed number of
    proposal rounds (vectorized acceptance), adequate for kappa <~ 100.
    """
    shape = _rng_shape(shape, mu, kappa)
    dt = jnp.result_type(mu, kappa, 1.0)
    kap = jnp.broadcast_to(jnp.asarray(kappa, dt), shape)
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kap * kap)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * jnp.maximum(kap, 1e-10))
    r = (1.0 + rho * rho) / (2.0 * rho)
    ROUNDS = 16
    keys = jax.random.split(key, ROUNDS)
    theta = jnp.zeros(shape, dtype=dt)
    accepted = jnp.zeros(shape, dtype=bool)
    for i in range(ROUNDS):
        k1, k2, k3 = jax.random.split(keys[i], 3)
        u1 = jax.random.uniform(k1, shape, dtype=dt)
        u2 = jax.random.uniform(k2, shape, dtype=dt)
        u3 = jax.random.uniform(k3, shape, dtype=dt)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kap * (r - f)
        accept = (c * (2.0 - c) - u2 > 0) | (jnp.log(c / jnp.maximum(u2, 1e-30)) + 1.0 - c >= 0)
        cand = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        theta = jnp.where(accepted, theta, jnp.where(accept, cand, theta))
        accepted = accepted | accept
    out = mu + theta
    return jnp.mod(out + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def skew_normal_lpdf(y, xi, omega, alpha, *, propto=False):
    yb, xb, ob, ab = bcast(y, xi, omega, alpha)
    ok = jnp.isfinite(yb) & jnp.isfinite(xb) & ok_pos(ob) & jnp.isfinite(ab)
    o = safe(ob, ok)
    z = (yb - safe(xb, ok, 0.0)) / o
    lp = jnp.zeros_like(yb)
    if include_summand(propto, y, xi, omega, alpha):
        lp = lp - 0.5 * jnp.square(z) + LOG_TWO + jsp.log_ndtr(safe(ab, ok, 0.0) * z)
    if include_summand(propto, omega):
        lp = lp - jnp.log(o)
    if include_summand(propto):
        lp = lp - LOG_SQRT_TWO_PI
    return finish(lp, ok)


def skew_normal_cdf(y, xi, omega, alpha):
    """Phi(z) - 2*OwensT(z, alpha) (ref: skew_normal_cdf.hpp via Owen's T)."""
    yb, xb, ob, ab = bcast(y, xi, omega, alpha)
    ok = ok_pos(ob)
    z = (yb - xb) / safe(ob, ok)
    p = jsp.ndtr(z) - 2.0 * owens_t(z, ab)
    return finish_prod(p, ok)


def skew_normal_lcdf(y, xi, omega, alpha):
    yb, xb, ob, ab = bcast(y, xi, omega, alpha)
    ok = ok_pos(ob)
    z = (yb - xb) / safe(ob, ok)
    p = jsp.ndtr(z) - 2.0 * owens_t(z, ab)
    return finish(jnp.log(jnp.maximum(p, 1e-300)), ok)


def skew_normal_lccdf(y, xi, omega, alpha):
    yb, xb, ob, ab = bcast(y, xi, omega, alpha)
    ok = ok_pos(ob)
    z = (yb - xb) / safe(ob, ok)
    p = jsp.ndtr(z) - 2.0 * owens_t(z, ab)
    return finish(jnp.log1p(-jnp.minimum(p, 1.0 - 1e-16)), ok)


def skew_normal_rng(key, xi, omega, alpha, shape=None):
    """Conditioning representation: |correlated normal pair| (Azzalini)."""
    shape = _rng_shape(shape, xi, omega, alpha)
    k1, k2 = jax.random.split(key)
    alpha = jnp.asarray(alpha, dtype=jnp.result_type(alpha, 1.0))
    delta = alpha / jnp.sqrt(1.0 + jnp.square(alpha))
    u0 = jax.random.normal(k1, shape)
    v = jax.random.normal(k2, shape)
    u1 = delta * u0 + jnp.sqrt(1.0 - jnp.square(delta)) * v
    return xi + omega * jnp.where(u0 >= 0, u1, -u1)


def exp_mod_normal_lpdf(y, mu, sigma, lam, *, propto=False):
    yb, mub, sb, lb = bcast(y, mu, sigma, lam)
    ok = jnp.isfinite(yb) & jnp.isfinite(mub) & ok_pos(sb) & ok_pos(lb)
    s, l = safe(sb, ok), safe(lb, ok)
    m = safe(mub, ok, 0.0)
    lp = jnp.zeros_like(yb)
    if include_summand(propto, lam):
        lp = lp + jnp.log(l)
    if include_summand(propto, y, mu, sigma, lam):
        lp = lp + 0.5 * l * (2.0 * m + l * jnp.square(s) - 2.0 * yb)
        lp = lp + jsp.log_ndtr((yb - m - l * jnp.square(s)) / s)
    return finish(lp, ok)


def exp_mod_normal_cdf(y, mu, sigma, lam):
    yb, mub, sb, lb = bcast(y, mu, sigma, lam)
    ok = ok_pos(sb) & ok_pos(lb)
    s, l = safe(sb, ok), safe(lb, ok)
    u = (yb - mub) / s
    p = jsp.ndtr(u) - jnp.exp(
        jnp.minimum(-l * (yb - mub) + 0.5 * jnp.square(l * s), 30.0)
        + jsp.log_ndtr(u - l * s)
    )
    return finish_prod(jnp.clip(p, 0.0, 1.0), ok)


def exp_mod_normal_lcdf(y, mu, sigma, lam):
    yb, mub, sb, lb = bcast(y, mu, sigma, lam)
    ok = ok_pos(sb) & ok_pos(lb)
    s, l = safe(sb, ok), safe(lb, ok)
    u = (yb - mub) / s
    p = jsp.ndtr(u) - jnp.exp(
        jnp.minimum(-l * (yb - mub) + 0.5 * jnp.square(l * s), 30.0)
        + jsp.log_ndtr(u - l * s)
    )
    return finish(jnp.log(jnp.maximum(p, 1e-300)), ok)


def exp_mod_normal_lccdf(y, mu, sigma, lam):
    yb, mub, sb, lb = bcast(y, mu, sigma, lam)
    ok = ok_pos(sb) & ok_pos(lb)
    s, l = safe(sb, ok), safe(lb, ok)
    u = (yb - mub) / s
    p = jsp.ndtr(u) - jnp.exp(
        jnp.minimum(-l * (yb - mub) + 0.5 * jnp.square(l * s), 30.0)
        + jsp.log_ndtr(u - l * s)
    )
    return finish(jnp.log1p(-jnp.clip(p, 0.0, 1.0 - 1e-16)), ok)


def exp_mod_normal_rng(key, mu, sigma, lam, shape=None):
    shape = _rng_shape(shape, mu, sigma, lam)
    k1, k2 = jax.random.split(key)
    return (
        mu
        + sigma * jax.random.normal(k1, shape)
        + jax.random.exponential(k2, shape) / lam
    )
