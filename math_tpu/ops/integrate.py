"""1-D quadrature with parameter gradients.

Reference: ``integrate_1d`` (Boost double-exponential quadrature picked by
endpoint finiteness, ``prim/arr/functor/integrate_1d.hpp:64-111``; gradient
computed as the quadrature of d f / d theta via nested AD,
``rev/arr/functor/integrate_1d.hpp:31-50``).

TPU-native: fixed-order tanh-sinh (finite intervals) / exp-sinh (half-
infinite) / sinh-sinh (doubly-infinite) nodes precomputed at trace time.
Because the integral is a fixed weighted sum of integrand evaluations,
``jax.grad`` differentiates straight through it — "gradient of the
quadrature" and "quadrature of the gradient" coincide, which is exactly
the identity the reference implements by hand.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _tanh_sinh_nodes(levels=7, dtype=np.float64):
    """Nodes/weights for int_{-1}^{1} g(x) dx."""
    h = 0.5 ** np.arange(1, levels + 1).max()
    kmax = int(np.ceil(6.0 / h))
    k = np.arange(-kmax, kmax + 1)
    t = k * h
    u = 0.5 * np.pi * np.sinh(t)
    x = np.tanh(u)
    w = h * 0.5 * np.pi * np.cosh(t) / np.square(np.cosh(u))
    keep = (np.abs(x) < 1.0) & (w > 1e-300)
    return x[keep].astype(dtype), w[keep].astype(dtype)


def _exp_sinh_nodes(levels=7, dtype=np.float64):
    """Nodes/weights for int_0^inf g(x) dx."""
    h = 0.5 ** np.arange(1, levels + 1).max()
    kmax = int(np.ceil(6.0 / h))
    k = np.arange(-kmax, kmax + 1)
    t = k * h
    x = np.exp(0.5 * np.pi * np.sinh(t))
    w = h * x * 0.5 * np.pi * np.cosh(t)
    keep = np.isfinite(x) & np.isfinite(w) & (x > 0) & (w > 1e-300) & (x < 1e300)
    return x[keep].astype(dtype), w[keep].astype(dtype)


def _sinh_sinh_nodes(levels=7, dtype=np.float64):
    """Nodes/weights for int_{-inf}^{inf} g(x) dx."""
    h = 0.5 ** np.arange(1, levels + 1).max()
    kmax = int(np.ceil(6.0 / h))
    k = np.arange(-kmax, kmax + 1)
    t = k * h
    x = np.sinh(0.5 * np.pi * np.sinh(t))
    w = h * 0.5 * np.pi * np.cosh(t) * np.cosh(0.5 * np.pi * np.sinh(t))
    keep = np.isfinite(x) & np.isfinite(w) & (np.abs(x) < 1e300) & (w < 1e300)
    return x[keep].astype(dtype), w[keep].astype(dtype)


_TS_X, _TS_W = _tanh_sinh_nodes()
_ES_X, _ES_W = _exp_sinh_nodes()
_SS_X, _SS_W = _sinh_sinh_nodes()


def integrate_1d(f, a, b, theta):
    """integral_a^b f(x, theta) dx; a/b may be +-inf (Python floats).

    Endpoint-finiteness dispatch mirrors integrate_1d.hpp:64-111.
    ``f(x, theta)`` must accept vectorized x.
    """
    a_inf = np.isneginf(a)
    b_inf = np.isposinf(b)
    if a_inf and b_inf:
        x, w = jnp.asarray(_SS_X), jnp.asarray(_SS_W)
        return jnp.sum(w * f(x, theta))
    if b_inf:
        x, w = jnp.asarray(_ES_X), jnp.asarray(_ES_W)
        return jnp.sum(w * f(a + x, theta))
    if a_inf:
        x, w = jnp.asarray(_ES_X), jnp.asarray(_ES_W)
        return jnp.sum(w * f(b - x, theta))
    x, w = jnp.asarray(_TS_X), jnp.asarray(_TS_W)
    mid = 0.5 * (a + b)
    half = 0.5 * (b - a)
    return half * jnp.sum(w * f(mid + half * x, theta))
