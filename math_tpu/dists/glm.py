"""Fused GLM likelihoods.

Reference: ``prim/mat/prob/{bernoulli_logit,poisson_log,neg_binomial_2_log,
normal_id,ordered_logistic,categorical_logit}_glm_*.hpp``.  The reference
computes ``eta = x @ beta + alpha`` once and accumulates logp plus
closed-form matrix partials (e.g. ``d/d beta = x^T theta'``,
``bernoulli_logit_glm_lpmf.hpp:112-137``) into a single tape node.

TPU-native: the same fusion falls out of XLA — one MXU matmul for ``eta``,
fused VPU elementwise logp, and the traced VJP of the matmul *is* the
closed-form ``x^T theta'`` partial.  ``propto`` pruning matches the
reference's ``include_summand`` buckets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp

from math_tpu.special import LOG_SQRT_TWO_PI
from math_tpu.utils.propto import include_summand
from math_tpu.dists._util import fdtype
from math_tpu.dists.discrete import (
    neg_binomial_2_log_lpmf,
    ordered_logistic_lpmf,
)


def _eta(x, alpha, beta):
    dt = fdtype(x, alpha, beta)
    x = jnp.asarray(x, dt)
    beta = jnp.asarray(beta, dt)
    return x @ beta + jnp.asarray(alpha, dt)


def bernoulli_logit_glm_lpmf(y, x, alpha, beta, *, propto=False):
    """sum_n log Bernoulli(y_n | logit^-1(x_n . beta + alpha)).

    Ref: bernoulli_logit_glm_lpmf.hpp:50-137.
    """
    eta = _eta(x, alpha, beta)
    y = jnp.asarray(y, eta.dtype)
    ok = jnp.all((y == 0.0) | (y == 1.0))  # ref: check_bounded(y, 0, 1)
    sign = 2.0 * y - 1.0
    lp = jnp.zeros((), eta.dtype)
    if include_summand(propto, x, alpha, beta):
        lp = lp - jnp.sum(jax.nn.softplus(-sign * eta))
    return jnp.where(ok, lp, -jnp.inf)


def poisson_log_glm_lpmf(y, x, alpha, beta, *, propto=False):
    """Ref: poisson_log_glm_lpmf.hpp."""
    eta = _eta(x, alpha, beta)
    y = jnp.asarray(y, eta.dtype)
    lp = jnp.zeros((), eta.dtype)
    if include_summand(propto, x, alpha, beta):
        lp = lp + jnp.sum(y * eta - jnp.exp(eta))
    if include_summand(propto):
        lp = lp - jnp.sum(jsp.gammaln(y + 1.0))
    return lp


def neg_binomial_2_log_glm_lpmf(y, x, alpha, beta, phi, *, propto=False):
    """Ref: neg_binomial_2_log_glm_lpmf.hpp."""
    eta = _eta(x, alpha, beta)
    return neg_binomial_2_log_lpmf(y, eta, phi, propto=propto)


def normal_id_glm_lpdf(y, x, alpha, beta, sigma, *, propto=False):
    """Ref: normal_id_glm_lpdf.hpp."""
    eta = _eta(x, alpha, beta)
    dt = eta.dtype
    y = jnp.asarray(y, dt)
    sigma = jnp.asarray(sigma, dt)
    n = y.shape[0] if y.ndim else 1
    z = (y - eta) / sigma
    lp = jnp.zeros((), dt)
    if include_summand(propto, y, x, alpha, beta, sigma):
        lp = lp - 0.5 * jnp.sum(jnp.square(z))
    if include_summand(propto, sigma):
        lp = lp - jnp.sum(jnp.broadcast_to(jnp.log(sigma), (n,)))
    if include_summand(propto):
        lp = lp - n * LOG_SQRT_TWO_PI
    return lp


def ordered_logistic_glm_lpmf(y, x, beta, cuts, *, propto=False):
    """Ref: ordered_logistic_glm_lpmf.hpp (eta = x beta, no intercept)."""
    dt = fdtype(x, beta, cuts)
    eta = jnp.asarray(x, dt) @ jnp.asarray(beta, dt)
    return ordered_logistic_lpmf(y, eta, jnp.asarray(cuts, dt), propto=propto)


def categorical_logit_glm_lpmf(y, x, alpha, beta, *, propto=False):
    """Ref: categorical_logit_glm_lpmf.hpp (beta is D x K, alpha K).

    Every summand depends on (x, alpha, beta), so propto=True with
    all-constant operands prunes the whole density (the reference's
    ``include_summand<propto, T_x, T_alpha, T_beta>`` gate); invalid y
    follows the -inf / nan-free-gradient convention of the other families.
    """
    dt = fdtype(x, alpha, beta)
    eta = jnp.asarray(x, dt) @ jnp.asarray(beta, dt) + jnp.asarray(alpha, dt)
    yi = jnp.asarray(y, jnp.int32) - 1
    k = eta.shape[-1]
    ok = (yi >= 0) & (yi < k)
    lp = jnp.zeros((), dt)
    if include_summand(propto, x, alpha, beta):
        logsm = jax.nn.log_softmax(eta, axis=-1)
        picked = jnp.take_along_axis(
            logsm, jnp.clip(yi, 0, k - 1)[..., None], axis=-1
        )[..., 0]
        lp = lp + jnp.sum(jnp.where(ok, picked, 0.0))
    neg_inf = jnp.asarray(-jnp.inf, dt)
    return jnp.where(jnp.all(ok), lp, neg_inf)
