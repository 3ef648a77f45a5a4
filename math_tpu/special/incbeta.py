"""Regularized incomplete beta with derivatives in ALL arguments.

Reference: ``inc_beta.hpp`` + ``inc_beta_dda/ddb/ddz.hpp`` (hand-derived
hypergeometric series for the a/b partials, on top of ``grad_2F1``).

TPU-native route: the a-partial is

  dI_x/da = [ int_0^x t^{a-1}(1-t)^{b-1} ln t dt  -  I_x B(a,b)(psi(a)-psi(a+b)) ] / B(a,b)

(and symmetrically for b with ln(1-t), psi(b)).  The integral is evaluated
with fixed-order tanh-sinh quadrature mapped to [0, x] — endpoint-singular
integrands (a<1 or b<1) are exactly what double-exponential quadrature
absorbs.  Exposed via ``jax.custom_jvp`` so forward and reverse mode both
work to arbitrary composition.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp


def _ts_nodes(levels=6, dtype=np.float64):
    h = 0.5**levels
    k = np.arange(-int(np.ceil(5.0 / h)), int(np.ceil(5.0 / h)) + 1)
    t = k * h
    u = 0.5 * np.pi * np.sinh(t)
    x = np.tanh(u)  # in (-1, 1)
    w = h * 0.5 * np.pi * np.cosh(t) / np.cosh(u) ** 2
    keep = (np.abs(x) < 1.0) & (w > 1e-300)
    # map to (0,1): s = (x+1)/2, weight/2
    return ((x[keep] + 1.0) / 2.0), (w[keep] / 2.0)


_S, _W = _ts_nodes()


def _beta_integral(a, b, x, logfun):
    """int_0^x t^(a-1) (1-t)^(b-1) * logfun(t) dt via tanh-sinh on [0,x]."""
    a = jnp.asarray(a)[..., None]
    b = jnp.asarray(b)[..., None]
    x = jnp.asarray(x)[..., None]
    t = x * _S  # nodes mapped to [0, x]
    w = x * _W
    # guard endpoints
    t = jnp.clip(t, 1e-300, 1.0 - 1e-16)
    integ = jnp.exp((a - 1.0) * jnp.log(t) + (b - 1.0) * jnp.log1p(-t)) * logfun(t)
    return jnp.sum(w * integ, axis=-1)


@jax.custom_jvp
def inc_beta(a, b, x):
    """I_x(a, b), differentiable in a, b, and x."""
    return jsp.betainc(a, b, x)


def _inc_beta_jvp(primals, tangents):
    a, b, x = primals
    da, db, dx = tangents
    a = jnp.asarray(a, jnp.result_type(a, b, x, 1.0))
    b = jnp.asarray(b, a.dtype)
    x = jnp.asarray(x, a.dtype)
    # self-reference (not jsp.betainc): differentiating this tangent again
    # must reuse the custom rule — jsp.betainc has no (a, b) gradient, and
    # routing through inc_beta makes the function smooth to arbitrary order
    p = inc_beta(a, b, x)

    lbeta = jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)

    def live(t):
        return not isinstance(t, jax.custom_derivatives.SymbolicZero)

    # symbolic-zero gating: the (a, b) partials are tanh-sinh quadratures —
    # skip them entirely on the x-only hot path (e.g. cdf grads in samplers)
    tangent = jnp.zeros_like(p)
    if live(dx):
        xs = jnp.clip(x, 1e-300, 1.0 - 1e-16)
        dp_dx = jnp.exp(
            (a - 1.0) * jnp.log(xs) + (b - 1.0) * jnp.log1p(-xs) - lbeta
        )
        tangent = tangent + dp_dx * dx
    if live(da) or live(db):
        binv = jnp.exp(-lbeta)
        dig_ab = jsp.digamma(a + b)
        if live(da):
            dp_da = binv * _beta_integral(a, b, x, jnp.log) - p * (
                jsp.digamma(a) - dig_ab
            )
            tangent = tangent + dp_da * da
        if live(db):
            dp_db = binv * _beta_integral(
                a, b, x, lambda t: jnp.log1p(-t)
            ) - p * (jsp.digamma(b) - dig_ab)
            tangent = tangent + dp_db * db
    return p, tangent


inc_beta.defjvp(_inc_beta_jvp, symbolic_zeros=True)


def inc_beta_dda(a, b, x):
    """dI_x(a,b)/da (ref: inc_beta_dda.hpp)."""
    return jax.grad(lambda aa: jnp.sum(inc_beta(aa, b, x)))(jnp.asarray(a, jnp.result_type(a, 1.0)))


def inc_beta_ddb(a, b, x):
    """dI_x(a,b)/db (ref: inc_beta_ddb.hpp)."""
    return jax.grad(lambda bb: jnp.sum(inc_beta(a, bb, x)))(jnp.asarray(b, jnp.result_type(b, 1.0)))


def inc_beta_ddz(a, b, x):
    """dI_x(a,b)/dx (ref: inc_beta_ddz.hpp)."""
    return jax.grad(lambda xx: jnp.sum(inc_beta(a, b, xx)))(jnp.asarray(x, jnp.result_type(x, 1.0)))


def grad_2F1(a1, a2, b1, z, max_terms=300):
    """(d/da1, d/db1) of the Gauss hypergeometric 2F1(a1, a2; b1; z).

    Reference: ``grad_2F1.hpp`` (term-by-term differentiated series,
    |z| < 1).  Static-length series with converged-tail masking.
    """
    dt = jnp.result_type(a1, a2, b1, z, 1.0)
    a1 = jnp.asarray(a1, dt)
    a2 = jnp.asarray(a2, dt)
    b1 = jnp.asarray(b1, dt)
    z = jnp.asarray(z, dt)

    def body(carry, k):
        term, g_a1, g_b1, acc_a1, acc_b1 = carry
        kf = k.astype(dt)
        ratio = (a1 + kf) * (a2 + kf) / ((b1 + kf) * (1.0 + kf))
        # d term/d a1 = term * (H_{a1,k}) where H accumulates 1/(a1+j)
        g_a1_new = (g_a1 + term / (a1 + kf)) * ratio * z
        g_b1_new = (g_b1 - term / (b1 + kf)) * ratio * z
        term_new = term * ratio * z
        return (
            term_new,
            g_a1_new,
            g_b1_new,
            acc_a1 + g_a1_new,
            acc_b1 + g_b1_new,
        ), None

    init = (
        jnp.ones_like(z),
        jnp.zeros_like(z),
        jnp.zeros_like(z),
        jnp.zeros_like(z),
        jnp.zeros_like(z),
    )
    (term, _, _, acc_a1, acc_b1), _ = jax.lax.scan(
        body, init, jnp.arange(max_terms)
    )
    return acc_a1, acc_b1


def grad_F32(a1, a2, a3, b1, b2, z, max_terms=300):
    """Gradients of 3F2 wrt all six arguments (ref: grad_F32.hpp)."""
    dt = jnp.result_type(a1, a2, a3, b1, b2, z, 1.0)
    args = [jnp.asarray(v, dt) for v in (a1, a2, a3, b1, b2, z)]
    a1, a2, a3, b1, b2, z = args

    def body(carry, k):
        term, gs, accs = carry
        kf = k.astype(dt)
        ratio = (
            (a1 + kf) * (a2 + kf) * (a3 + kf)
            / ((b1 + kf) * (b2 + kf) * (1.0 + kf))
        )
        new_gs = [
            (gs[0] + term / (a1 + kf)) * ratio * z,
            (gs[1] + term / (a2 + kf)) * ratio * z,
            (gs[2] + term / (a3 + kf)) * ratio * z,
            (gs[3] - term / (b1 + kf)) * ratio * z,
            (gs[4] - term / (b2 + kf)) * ratio * z,
        ]
        term_new = term * ratio * z
        new_accs = [a + g for a, g in zip(accs, new_gs)]
        return (term_new, new_gs, new_accs), None

    zero = jnp.zeros_like(z)
    init = (jnp.ones_like(z), [zero] * 5, [zero] * 5)
    (_, _, accs), _ = jax.lax.scan(body, init, jnp.arange(max_terms))
    # dz gradient: d/dz 3F2 = sum_k c_k k z^{k-1} = (a1 a2 a3)/(b1 b2) 3F2(+1)
    return (*accs,)
