"""Scalar (elementwise) constraint transforms.

Reference: ``prim/scal/fun/*_constrain.hpp`` / ``*_free.hpp``.  All functions
broadcast elementwise; the ``_lp`` variants return the *summed* log absolute
Jacobian determinant over all elements, matching how the reference
accumulates into a scalar ``lp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from math_tpu.special import log1m


def _sum(x):
    return jnp.sum(jnp.asarray(x))


def identity_constrain(x):
    return x


def identity_free(y):
    return y


# --- lower bound: y = exp(x) + lb (ref: lb_constrain.hpp) -------------------


def lb_constrain(x, lb):
    return jnp.exp(x) + lb


def lb_constrain_lp(x, lb):
    return jnp.exp(x) + lb, _sum(x)


def lb_free(y, lb):
    return jnp.log(y - lb)


# --- upper bound: y = ub - exp(x) (ref: ub_constrain.hpp) -------------------


def ub_constrain(x, ub):
    return ub - jnp.exp(x)


def ub_constrain_lp(x, ub):
    return ub - jnp.exp(x), _sum(x)


def ub_free(y, ub):
    return jnp.log(ub - y)


# --- lower+upper: y = lb + (ub-lb)*sigmoid(x) (ref: lub_constrain.hpp) ------


def lub_constrain(x, lb, ub):
    return lb + (ub - lb) * jax.nn.sigmoid(x)


def lub_constrain_lp(x, lb, ub):
    y = lub_constrain(x, lb, ub)
    # lp += log(ub-lb) + log inv_logit(x) + log1m inv_logit(x)
    lp = _sum(
        jnp.broadcast_to(
            jnp.log(ub - lb) - jax.nn.softplus(-x) - jax.nn.softplus(x),
            jnp.shape(x),
        )
    )
    return y, lp


def lub_free(y, lb, ub):
    u = (y - lb) / (ub - lb)
    return jnp.log(u) - jnp.log1p(-u)


# --- offset/multiplier: y = mu + sigma*x (ref: offset_multiplier_constrain) -


def offset_multiplier_constrain(x, mu, sigma):
    return mu + sigma * x


def offset_multiplier_constrain_lp(x, mu, sigma):
    y = mu + sigma * x
    lp = _sum(jnp.broadcast_to(jnp.log(sigma), jnp.shape(y)))
    return y, lp


def offset_multiplier_free(y, mu, sigma):
    return (y - mu) / sigma


# --- positive: y = exp(x) (ref: positive_constrain.hpp) ---------------------


def positive_constrain(x):
    return jnp.exp(x)


def positive_constrain_lp(x):
    return jnp.exp(x), _sum(x)


def positive_free(y):
    return jnp.log(y)


# --- probability: y = sigmoid(x) (ref: prob_constrain.hpp) ------------------


def prob_constrain(x):
    return jax.nn.sigmoid(x)


def prob_constrain_lp(x):
    y = jax.nn.sigmoid(x)
    lp = _sum(-jax.nn.softplus(-x) - jax.nn.softplus(x))
    return y, lp


def prob_free(y):
    return jnp.log(y) - jnp.log1p(-y)


# --- correlation in (-1,1): y = tanh(x) (ref: corr_constrain.hpp) -----------


def corr_constrain(x):
    return jnp.tanh(x)


def corr_constrain_lp(x):
    y = jnp.tanh(x)
    return y, _sum(log1m(jnp.square(y)))


def corr_free(y):
    return jnp.arctanh(y)
