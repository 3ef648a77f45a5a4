"""Vector-valued constraint transforms (ordered, simplex, unit vector).

Reference: ``prim/mat/fun/{ordered,positive_ordered,simplex,unit_vector}_constrain.hpp``.
Sequential stick-breaking loops are re-expressed as cumsum/cumprod so they
vectorize on the VPU and batch cleanly under ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --- ordered: y1 = x1, y_k = y_{k-1} + exp(x_k) (ref: ordered_constrain) ----


def ordered_constrain(x):
    x = jnp.asarray(x)
    head = x[..., :1]
    tail = jnp.exp(x[..., 1:])
    return jnp.concatenate([head, head + jnp.cumsum(tail, axis=-1)], axis=-1)


def ordered_constrain_lp(x):
    return ordered_constrain(x), jnp.sum(x[..., 1:])


def ordered_free(y):
    y = jnp.asarray(y)
    return jnp.concatenate([y[..., :1], jnp.log(jnp.diff(y, axis=-1))], axis=-1)


# --- positive_ordered: y_k = sum_{i<=k} exp(x_i) (ref: positive_ordered_*) --


def positive_ordered_constrain(x):
    return jnp.cumsum(jnp.exp(x), axis=-1)


def positive_ordered_constrain_lp(x):
    return positive_ordered_constrain(x), jnp.sum(x)


def positive_ordered_free(y):
    y = jnp.asarray(y)
    first = jnp.log(y[..., :1])
    return jnp.concatenate([first, jnp.log(jnp.diff(y, axis=-1))], axis=-1)


# --- simplex: centered stick-breaking (ref: simplex_constrain.hpp) ----------


def _simplex_parts(x):
    """Shared pieces: z_k = sigmoid(x_k - log(Km1 - k)), sticks via cumprod."""
    x = jnp.asarray(x)
    km1 = x.shape[-1]
    k = jnp.arange(km1, dtype=x.dtype)
    adj = x - jnp.log(km1 - k)  # x_k + eq_share, eq_share = -log(Km1 - k)
    z = jax.nn.sigmoid(adj)
    # stick_len before breaking piece k = prod_{i<k} (1 - z_i)
    one_m_z = 1.0 - z
    stick = jnp.concatenate(
        [jnp.ones_like(z[..., :1]), jnp.cumprod(one_m_z[..., :-1], axis=-1)],
        axis=-1,
    )
    y_head = stick * z
    y_last = stick[..., -1:] * one_m_z[..., -1:]
    y = jnp.concatenate([y_head, y_last], axis=-1)
    return y, adj, stick


def simplex_constrain(x):
    return _simplex_parts(x)[0]


def simplex_constrain_lp(x):
    """lp += sum_k [ log(stick_k) - log1p_exp(-adj_k) - log1p_exp(adj_k) ].

    Matches ``simplex_constrain(y, lp)`` (ref: simplex_constrain.hpp:62-85).
    """
    y, adj, stick = _simplex_parts(x)
    lp = jnp.sum(
        jnp.log(stick) - jax.nn.softplus(-adj) - jax.nn.softplus(adj)
    )
    return y, lp


def simplex_free(y):
    """Inverse stick-breaking (ref: ``simplex_free.hpp``)."""
    y = jnp.asarray(y)
    km1 = y.shape[-1] - 1
    k = jnp.arange(km1, dtype=y.dtype)
    # stick remaining before piece k: 1 - sum_{i<k} y_i
    stick = 1.0 - jnp.concatenate(
        [jnp.zeros_like(y[..., :1]), jnp.cumsum(y[..., :-2], axis=-1)], axis=-1
    )
    z = y[..., :-1] / stick
    return jnp.log(z) - jnp.log1p(-z) + jnp.log(km1 - k)


# --- unit_vector: y = x/||x||, lp -= ||x||^2/2 (ref: unit_vector_constrain) -


def unit_vector_constrain(x):
    x = jnp.asarray(x)
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


def unit_vector_constrain_lp(x):
    sn = jnp.sum(jnp.square(x))
    return jnp.asarray(x) / jnp.sqrt(sn), -0.5 * sn


def unit_vector_free(y):
    # Any point on the ray maps to y; the reference uses y itself.
    return jnp.asarray(y)
