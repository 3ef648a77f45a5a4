"""Integer-order Bessel functions J_n, Y_n, I_n, K_n.

ref: bessel_first_kind.hpp, bessel_second_kind.hpp,
     modified_bessel_first_kind.hpp, modified_bessel_second_kind.hpp
(reference delegates to boost::math::cyl_bessel_j / cyl_neumann /
cyl_bessel_i / cyl_bessel_k with integer order).

TPU-first design: no recurrences, no data-dependent control flow.  Each
function is a *fixed-size vectorized quadrature* over precomputed nodes
(spectrally convergent trapezoid for the periodic-derivative integrands,
Gauss-Legendre for the oscillatory Neumann piece, exp-sinh for the
semi-infinite decaying pieces), combined branchlessly via ``jnp.where``
with a Hankel-type asymptotic expansion for large argument.  Everything
lowers to dense broadcast+reduce that XLA fuses into a handful of
kernels; derivatives in ``z`` come free by differentiating under the
(fixed) quadrature rule, exactly like ``ops.integrate.integrate_1d``.

Accuracy domain (f64): relative error <~1e-10 for integer orders
|n| <= 15 over the full argument range, degrading gracefully for larger
orders (quadrature phase budget covers n + |z| <~ 600; asymptotic branch
takes over at |z| > max(500, 2 n^2) for J/Y and z > 700 for I).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = [
    "bessel_first_kind",
    "bessel_second_kind",
    "modified_bessel_first_kind",
    "modified_bessel_second_kind",
]

_NTRAP = 2048  # trapezoid / GL points for the [0, pi] integrals

# trapezoid nodes over [0, pi] (endpoints included, half-weighted)
_TH = np.linspace(0.0, np.pi, _NTRAP + 1)
_TW = np.full(_NTRAP + 1, np.pi / _NTRAP)
_TW[0] *= 0.5
_TW[-1] *= 0.5

# Gauss-Legendre nodes mapped to [0, pi] (for the non-periodic Neumann
# oscillatory integrand, where trapezoid is only O(h^2))
_GLX, _GLW = np.polynomial.legendre.leggauss(_NTRAP)
_GLT = 0.5 * np.pi * (_GLX + 1.0)
_GLW = 0.5 * np.pi * _GLW

# exp-sinh nodes on (0, inf) for the semi-infinite decaying integrals:
# t_k = exp((pi/2) sinh u_k), double-exponential weights
_ES_LEVEL = 8
_ES_H = 2.0**-_ES_LEVEL
_ES_U = np.arange(-6.0 / _ES_H, 6.0 / _ES_H + 1) * _ES_H
_ES_T = np.exp(0.5 * np.pi * np.sinh(_ES_U))
_ES_W = _ES_H * 0.5 * np.pi * np.cosh(_ES_U) * _ES_T
# t capped where sinh(t) stays finite: beyond, e^{-x sinh t} underflows for
# any representable x>0, and an inf node would poison gradients (0*inf)
_keep = np.isfinite(_ES_T) & np.isfinite(_ES_W) & (_ES_T < 705.0)
_ES_T, _ES_W = _ES_T[_keep], _ES_W[_keep]


def _f(x):
    return jnp.asarray(x, dtype=jnp.result_type(float, x))


def _quad(nodes, weights, integrand, dtype):
    """sum_k w_k * integrand(t_k), broadcasting integrand outputs."""
    t = jnp.asarray(nodes, dtype=dtype)
    w = jnp.asarray(weights, dtype=dtype)
    return jnp.sum(integrand(t) * w, axis=-1)


def _hankel_pq(mu, x8, nterms=9):
    """P/Q of the Hankel large-argument expansion (DLMF 10.17.1).

    P ~ sum_k (-1)^k a_{2k} / (8x)^{2k},  Q ~ sum_k (-1)^k a_{2k+1}/(8x)^{2k+1}
    with a_0 = 1, a_{j} = a_{j-1} * (mu - (2j-1)^2) / (8x * j) cumulated here
    directly in 1/(8x) powers.
    """
    term = jnp.ones_like(x8)
    p = jnp.ones_like(x8)
    q = jnp.zeros_like(x8)
    for j in range(1, 2 * nterms):
        term = term * (mu - (2 * j - 1) ** 2) / (j * 8.0 * x8)
        if j % 2 == 1:
            q = q + term * (-1.0) ** ((j - 1) // 2)
        else:
            p = p + term * (-1.0) ** (j // 2)
    return p, q


def _jn_series(n, x, sign):
    """Power series (x/2)^n sum_k sign^k (x^2/4)^k / (k! (n+k)!).

    sign=-1 gives J_n, sign=+1 gives I_n (DLMF 10.2.2 / 10.25.2).  Used
    where x^2 < 4(n+1): terms then decrease from k=0, so the alternating
    J series suffers no cancellation.  Log-space terms keep the unused
    branch finite under the branchless ``where`` combine.
    """
    K = 30
    k = jnp.arange(K, dtype=x.dtype)
    logx2 = jnp.log(jnp.maximum(x, 1e-300) / 2.0)
    lt = (
        (n[..., None] + 2.0 * k) * logx2[..., None]
        - jsp.gammaln(k + 1.0)
        - jsp.gammaln(n[..., None] + k + 1.0)
    )
    s = jnp.asarray(sign, dtype=x.dtype) ** k
    out = jnp.sum(s * jnp.exp(lt), axis=-1)
    return jnp.where(x == 0.0, jnp.where(n == 0, 1.0, 0.0), out)


def _jy_asym(n, x):
    """Large-|x| Hankel asymptotics for (J_n, Y_n)."""
    mu = 4.0 * n * n
    p, q = _hankel_pq(mu, x)
    omega = x - (0.5 * n + 0.25) * jnp.pi
    amp = jnp.sqrt(2.0 / (jnp.pi * x))
    jv = amp * (p * jnp.cos(omega) - q * jnp.sin(omega))
    yv = amp * (p * jnp.sin(omega) + q * jnp.cos(omega))
    return jv, yv


def _j_quad(n, x, dtype):
    # J_n(x) = (1/pi) int_0^pi cos(n t - x sin t) dt   (DLMF 10.9.2);
    # integrand has vanishing odd derivatives at both endpoints =>
    # trapezoid converges spectrally.
    def integrand(t):
        nt = n[..., None] * t
        xs = x[..., None] * jnp.sin(t)
        return jnp.cos(nt - xs)

    return _quad(_TH, _TW, integrand, dtype) / jnp.pi


def _y_quad(n, x, dtype):
    # Y_n(x) = (1/pi) int_0^pi sin(x sin t - n t) dt
    #        - (1/pi) int_0^inf (e^{nt} + (-1)^n e^{-nt}) e^{-x sinh t} dt
    # (DLMF 10.9.7).  Oscillatory part via Gauss-Legendre; decay part via
    # exp-sinh in log space (avoids inf*0 at the far nodes).
    def osc(t):
        return jnp.sin(x[..., None] * jnp.sin(t) - n[..., None] * t)

    o = _quad(_GLT, _GLW, osc, dtype) / jnp.pi

    def decay(t):
        nt = n[..., None] * t
        # log(e^{nt} + (-1)^n e^{-nt}): cosh for even n, sinh for odd
        even = (n[..., None] % 2) == 0
        lcosh = jnp.logaddexp(nt, -nt)
        lsinh = nt + jnp.log1p(-jnp.exp(-2.0 * jnp.maximum(nt, 1e-300)))
        lsum = jnp.where(even, lcosh, lsinh)
        expo = lsum - x[..., None] * jnp.sinh(t)
        return jnp.exp(expo)

    d = _quad(_ES_T, _ES_W, decay, dtype) / jnp.pi
    return o - d


def _i_quad(n, x, dtype):
    # I_n(x) = e^x * (1/pi) int_0^pi e^{x (cos t - 1)} cos(n t) dt
    # (DLMF 10.32.1, exponentially scaled).  Spectral trapezoid.
    def integrand(t):
        return jnp.exp(x[..., None] * (jnp.cos(t) - 1.0)) * jnp.cos(
            n[..., None] * t
        )

    scaled = _quad(_TH, _TW, integrand, dtype) / jnp.pi
    return scaled * jnp.exp(x)


def _i_asym(n, x):
    # I_n(x) ~ e^x / sqrt(2 pi x) * sum_k (-1)^k a_k(mu) / (8x)^k
    mu = 4.0 * n * n
    term = jnp.ones_like(x)
    s = jnp.ones_like(x)
    for j in range(1, 14):
        term = term * (mu - (2 * j - 1) ** 2) / (j * 8.0 * x)
        s = s + (-1.0) ** j * term
    # log-space combine: e^x alone overflows ~40 ulps before I_n itself does
    return jnp.exp(x - 0.5 * jnp.log(2.0 * jnp.pi * x) + jnp.log(jnp.maximum(s, 1e-300)))


def _k_quad(n, x, dtype):
    # K_n(x) = e^{-x} int_0^inf e^{-x (cosh t - 1)} cosh(n t) dt
    # (DLMF 10.32.9, scaled); exp-sinh nodes cluster near 0, matching the
    # 1/sqrt(x)-wide peak at large x; log-space per node avoids inf*0.
    def integrand(t):
        nt = n[..., None] * t
        lcosh = jnp.logaddexp(nt, -nt) - jnp.log(2.0)
        expo = lcosh - x[..., None] * (jnp.cosh(t) - 1.0)
        return jnp.exp(expo)

    return _quad(_ES_T, _ES_W, integrand, dtype) * jnp.exp(-x)


def bessel_first_kind(v, z):
    """Bessel function of the first kind J_v(z), integer order.

    ref: ``bessel_first_kind.hpp`` (boost cyl_bessel_j).
    """
    z = _f(z)
    v = jnp.asarray(v)
    n, z = jnp.broadcast_arrays(jnp.asarray(v, dtype=z.dtype), z)
    na = jnp.abs(n)
    xa = jnp.abs(z)
    # J_{-n}(x) = (-1)^n J_n(x);  J_n(-x) = (-1)^n J_n(x)
    sgn = jnp.where((n < 0) & (na % 2 == 1), -1.0, 1.0)
    sgn = sgn * jnp.where((z < 0) & (na % 2 == 1), -1.0, 1.0)
    xcut = jnp.maximum(500.0, 2.0 * na * na)
    xser = jnp.sqrt(4.0 * (na + 1.0))  # series while terms decrease
    # keep each unused branch's argument in its numerically safe range
    js = _jn_series(na, jnp.minimum(xa, xser), -1.0)
    jq = _j_quad(na, jnp.minimum(xa, xcut), z.dtype)
    ja, _ = _jy_asym(na, jnp.maximum(xa, 1.0))
    out = jnp.where(xa < xser, js, jnp.where(xa > xcut, ja, jq))
    return sgn * out


def bessel_second_kind(v, z):
    """Bessel function of the second kind Y_v(z), integer order; z > 0.

    ref: ``bessel_second_kind.hpp`` (boost cyl_neumann).  Invalid z <= 0
    returns nan (the reference throws; XLA cannot).
    """
    z = _f(z)
    v = jnp.asarray(v)
    n, z = jnp.broadcast_arrays(jnp.asarray(v, dtype=z.dtype), z)
    na = jnp.abs(n)
    sgn = jnp.where((n < 0) & (na % 2 == 1), -1.0, 1.0)
    xcut = jnp.maximum(500.0, 2.0 * na * na)
    xsafe = jnp.maximum(z, 1e-300)
    xq = jnp.minimum(xsafe, xcut)
    yq = _y_quad(na, xq, z.dtype)
    _, ya = _jy_asym(na, jnp.maximum(xsafe, 1.0))
    out = sgn * jnp.where(xsafe > xcut, ya, yq)
    return jnp.where(z > 0, out, jnp.nan)


def modified_bessel_first_kind(v, z):
    """Modified Bessel function I_v(z), integer order.

    ref: ``modified_bessel_first_kind.hpp`` (boost cyl_bessel_i).
    """
    z = _f(z)
    v = jnp.asarray(v)
    n, z = jnp.broadcast_arrays(jnp.asarray(v, dtype=z.dtype), z)
    na = jnp.abs(n)  # I_{-n} = I_n
    xa = jnp.abs(z)
    sgn = jnp.where((z < 0) & (na % 2 == 1), -1.0, 1.0)  # I_n(-x)=(-1)^n I_n
    xcut = 700.0
    xser = jnp.sqrt(4.0 * (na + 1.0))
    iser = _jn_series(na, jnp.minimum(xa, xser), 1.0)
    iq = _i_quad(na, jnp.minimum(xa, xcut), z.dtype)
    ia = _i_asym(na, jnp.maximum(xa, 1.0))
    out = jnp.where(xa < xser, iser, jnp.where(xa > xcut, ia, iq))
    return sgn * out


def modified_bessel_second_kind(v, z):
    """Modified Bessel function K_v(z), integer order; z > 0.

    ref: ``modified_bessel_second_kind.hpp`` (boost cyl_bessel_k).
    """
    z = _f(z)
    v = jnp.asarray(v)
    n, z = jnp.broadcast_arrays(jnp.asarray(v, dtype=z.dtype), z)
    na = jnp.abs(n)  # K_{-n} = K_n
    xsafe = jnp.maximum(z, 1e-300)
    out = _k_quad(na, xsafe, z.dtype)
    return jnp.where(z > 0, out, jnp.nan)
