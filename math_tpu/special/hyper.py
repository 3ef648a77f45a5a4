"""Hypergeometric series values and incomplete-function gradients.

ref: F32.hpp, grad_inc_beta.hpp, grad_reg_inc_beta.hpp,
     grad_reg_inc_gamma.hpp, grad_reg_lower_inc_gamma.hpp

TPU-native: every reference while-loop-until-converged becomes a
fixed-length ``lax.scan``/vector sum in log space, branch points become
``jnp.where`` over both (argument-clamped) branches.  Gradients of the
regularized incomplete beta reuse the differentiable ``inc_beta``
(tanh-sinh a/b partials) instead of re-deriving the 2F1 machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp

from math_tpu.special.incbeta import inc_beta, inc_beta_dda, inc_beta_ddb

__all__ = [
    "F32",
    "grad_inc_beta",
    "grad_reg_inc_beta",
    "grad_reg_inc_gamma",
    "grad_reg_lower_inc_gamma",
]


def F32(a1, a2, a3, b1, b2, z, max_terms=300):
    """Generalized hypergeometric 3F2(a1,a2,a3; b1,b2; z) (ref: F32.hpp).

    Converges for |z| < 1 (and z = 1 when the parameter sum condition
    holds, as checked by the reference's check_3F2_converges).
    """
    dt = jnp.result_type(a1, a2, a3, b1, b2, z, 1.0)
    a1, a2, a3, b1, b2, z = (
        jnp.asarray(v, dt) for v in (a1, a2, a3, b1, b2, z)
    )

    def body(carry, k):
        term, acc = carry
        kf = k.astype(dt)
        p = (a1 + kf) * (a2 + kf) * (a3 + kf) / (
            (b1 + kf) * (b2 + kf) * (1.0 + kf)
        )
        term = term * p * z
        return (term, acc + term), None

    init = (jnp.ones_like(z), jnp.ones_like(z))
    (_, acc), _ = jax.lax.scan(body, init, jnp.arange(max_terms))
    return acc


def grad_inc_beta(a, b, z):
    """(d/da, d/db) of the NON-regularized incomplete beta B(z; a, b).

    ref: ``grad_inc_beta.hpp`` (via 2F1); here via the differentiable
    regularized ``inc_beta`` and the product rule on B(a,b) I_z(a,b).
    Returns a tuple (g1, g2) instead of output-reference parameters.
    """
    dt = jnp.result_type(a, b, z, 1.0)
    a, b, z = jnp.asarray(a, dt), jnp.asarray(b, dt), jnp.asarray(z, dt)
    lbeta = jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)
    bab = jnp.exp(lbeta)
    i = inc_beta(a, b, z)
    dab = jsp.digamma(a + b)
    g1 = bab * ((jsp.digamma(a) - dab) * i + inc_beta_dda(a, b, z))
    g2 = bab * ((jsp.digamma(b) - dab) * i + inc_beta_ddb(a, b, z))
    return g1, g2


def grad_reg_inc_beta(a, b, z):
    """(d/da, d/db) of the regularized incomplete beta I_z(a, b).

    ref: ``grad_reg_inc_beta.hpp`` (tuple return instead of the
    reference's output-parameter + precomputed-digamma signature).
    """
    return inc_beta_dda(a, b, z), inc_beta_ddb(a, b, z)


_N_SERIES = 256


def _dP_da_series(a, z):
    """Gautschi series for d/da P(a,z) (ref: grad_reg_lower_inc_gamma.hpp).

    dP/da = sum_n exp((a+n) log z - z - lgamma(a+n+1))
                  * (log z - psi(a+n+1))
    """
    n = jnp.arange(_N_SERIES, dtype=z.dtype)
    apn1 = a[..., None] + n + 1.0
    logz = jnp.log(jnp.maximum(z, 1e-300))
    lt = (a[..., None] + n) * logz[..., None] - z[..., None] - jsp.gammaln(apn1)
    return jnp.sum(jnp.exp(lt) * (logz[..., None] - jsp.digamma(apn1)), axis=-1)


def _dQ_da_asym(a, z):
    """Asymptotic d/da Q(a,z) for z >= max(a, 8) (ref: grad_reg_inc_gamma.hpp,
    DLMF 8.11.2 differentiated in a)."""
    l = jnp.log(z)
    dig = jsp.digamma(a)
    s = jnp.zeros_like(z)
    fac = a - 1.0  # falling_factorial(a-1, k)
    dfac = jnp.ones_like(a)  # d/da falling_factorial(a-1, k)
    zpow = z
    delta = dfac / zpow
    am1k = a - 1.0
    for _ in range(1, 10):
        am1k = am1k - 1.0
        s = s + delta
        zpow = zpow * z
        dfac = am1k * dfac + fac
        fac = fac * am1k
        delta = dfac / zpow
    # route through the custom-rule gamma_q (not jsp.gammaincc): XLA's
    # igamma_grad_a primitive has no derivative rule, so second-order AD of
    # this partial needs the hand-written jvp (one recursion level per order)
    from math_tpu.special.basic import gamma_q

    q = gamma_q(a, z)
    return q * (l - dig) + jnp.exp(-z + (a - 1.0) * l - jsp.gammaln(a)) * s


def grad_reg_inc_gamma(a, z, g=None, dig=None):
    """d/da of the UPPER regularized incomplete gamma Q(a, z).

    ref: ``grad_reg_inc_gamma.hpp``.  The reference's precomputed
    ``g = tgamma(a)`` / ``dig = digamma(a)`` arguments are accepted for
    signature parity but recomputed internally.
    """
    dt = jnp.result_type(a, z, 1.0)
    a, z = jnp.asarray(a, dt), jnp.asarray(z, dt)
    a, z = jnp.broadcast_arrays(a, z)
    # series converges in ~(z - a) + 5 sqrt(z) terms; prefer it whenever the
    # 256-term budget covers that (the 10-term asymptotic is weak near z ~ a)
    use_asym = (z - a) > jnp.minimum(8.0 * jnp.sqrt(a) + 50.0, 150.0)
    use_asym = use_asym & (z >= 8.0)
    z_ser = jnp.minimum(z, a + 160.0)
    out = jnp.where(
        use_asym,
        _dQ_da_asym(a, jnp.maximum(z, 8.0)),
        -_dP_da_series(a, z_ser),
    )
    return jnp.where((a > 0) & (z >= 0), out, jnp.nan)


def grad_reg_lower_inc_gamma(a, z):
    """d/da of the LOWER regularized incomplete gamma P(a, z).

    ref: ``grad_reg_lower_inc_gamma.hpp`` (Gautschi-series region split).
    """
    dt = jnp.result_type(a, z, 1.0)
    a, z = jnp.asarray(a, dt), jnp.asarray(z, dt)
    a, z = jnp.broadcast_arrays(a, z)
    # reference region split: use the (negated) upper gradient for large z
    use_upper = ((z - a) > jnp.minimum(8.0 * jnp.sqrt(a) + 50.0, 150.0)) & (
        z >= 8.0
    )
    z_ser = jnp.minimum(z, a + 160.0)
    out = jnp.where(
        use_upper,
        -_dQ_da_asym(a, jnp.maximum(z, 8.0)),
        _dP_da_series(a, z_ser),
    )
    out = jnp.where(z == 0.0, jnp.zeros_like(out), out)
    return jnp.where((a > 0) & (z >= 0), out, jnp.nan)
