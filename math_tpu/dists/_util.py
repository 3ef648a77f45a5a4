"""Shared machinery for the distribution modules.

The reference's per-family pattern (see ``prim/scal/prob/normal_lpdf.hpp``,
SURVEY.md §3.2) is: validate -> prune constant summands -> fused loop over a
scalar sequence view accumulating log-prob and manual partials -> emit one
tape node.  The TPU-native pattern: broadcast -> prune via
``include_summand`` at trace time -> vectorized elementwise log-prob -> sum;
XLA fuses the whole thing and ``jax.vjp`` supplies the partials.

Error-handling contract (deviation from the reference, by design): Stan
throws ``domain_error`` on invalid parameters, which its samplers treat as a
rejected proposal.  XLA cannot throw, so invalid parameters and off-support
outcomes both yield ``-inf`` log-prob (an always-rejected state), with input
sanitization so gradients stay nan-free at valid points.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "fdtype",
    "bcast",
    "finish",
    "finish_prod",
    "safe",
    "ok_pos",
    "ok_prob",
    "ok_simplex",
    "ok_ordered",
]


def fdtype(*args):
    """Floating result dtype for a set of (possibly int) arguments."""
    return jnp.result_type(*args, 1.0)


def bcast(*args):
    """Broadcast all args to a common shape as float arrays."""
    dt = fdtype(*args)
    arrs = [jnp.asarray(a, dtype=dt) for a in args]
    return jnp.broadcast_arrays(*arrs) if len(arrs) > 1 else arrs


def safe(x, ok, fill=1.0):
    """Replace invalid entries so math on them cannot produce nan.

    The "double-where" trick: downstream ``where(ok, lp, -inf)`` discards
    these lanes, and sanitizing first keeps reverse-mode gradients finite.
    """
    return jnp.where(ok, x, jnp.asarray(fill, dtype=x.dtype))


def finish(lp, ok):
    """Sum elementwise log-prob, sending invalid lanes to -inf."""
    neg_inf = jnp.array(-jnp.inf, dtype=lp.dtype)
    return jnp.sum(jnp.where(ok, lp, neg_inf))


def finish_prod(p, ok):
    """Product form for plain cdfs (Stan's vectorized cdf semantics)."""
    return jnp.prod(jnp.where(ok, p, jnp.nan))


def ok_pos(x):
    return jnp.isfinite(x) & (x > 0)


def ok_prob(x):
    return jnp.isfinite(x) & (x >= 0) & (x <= 1)


def ok_simplex(x, axis=-1):
    """Valid simplex along ``axis`` (ref: ``check_simplex.hpp``).

    Tolerance scales with dtype epsilon and length so float32 simplexes
    produced by softmax-style transforms pass (the reference's fixed
    CONSTRAINT_TOLERANCE=1e-8 assumes double).
    """
    x = jnp.asarray(x)
    k = x.shape[axis]
    tol = jnp.maximum(1e-8, 16.0 * k * jnp.finfo(x.dtype).eps)
    fin = jnp.all(jnp.isfinite(x) & (x >= 0) & (x <= 1), axis=axis)
    return fin & (jnp.abs(jnp.sum(x, axis=axis) - 1.0) <= tol)


def ok_ordered(x, axis=-1):
    """Finite and strictly increasing along ``axis`` (ref: ``check_ordered.hpp``)."""
    x = jnp.asarray(x)
    fin = jnp.all(jnp.isfinite(x), axis=axis)
    inc = jnp.all(jnp.diff(x, axis=axis) > 0, axis=axis)
    return fin & inc
