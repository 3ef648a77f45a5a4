"""Core scalar special functions under their Stan Math names.

References cite the files in ``/root/reference/stan/math/prim/scal/fun/``
whose *behavior* each function reproduces; implementations are fresh jnp
code relying on JAX autodiff, not translations of the C++.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp

LOG_TWO = math.log(2.0)
LOG_PI = math.log(math.pi)
LOG_TWO_PI = math.log(2.0 * math.pi)
LOG_SQRT_TWO_PI = 0.5 * math.log(2.0 * math.pi)
SQRT_TWO = math.sqrt(2.0)

# --- simple algebraic helpers (ref: inv.hpp, square.hpp, ...) ---------------


def inv(x):
    return 1.0 / x


def inv_sqrt(x):
    return jax.lax.rsqrt(x)


def inv_square(x):
    return 1.0 / jnp.square(x)


def square(x):
    return jnp.square(x)


def cbrt(x):
    return jnp.cbrt(x)


def hypot(x, y):
    return jnp.hypot(x, y)


def expm1(x):
    return jnp.expm1(x)


def fma(x, y, z):
    return x * y + z


logaddexp = jnp.logaddexp


# --- logit / log1p family (ref: inv_logit.hpp, log1m.hpp, log1p_exp.hpp) ----


def inv_logit(x):
    """Logistic sigmoid (ref: ``prim/scal/fun/inv_logit.hpp``)."""
    return jax.nn.sigmoid(x)


def logit(x):
    return jnp.log(x) - jnp.log1p(-x)


def log_inv_logit(x):
    """log(sigmoid(x)) = -softplus(-x) (ref: ``log_inv_logit.hpp``)."""
    return -jax.nn.softplus(-x)


def log1m_inv_logit(x):
    """log(1 - sigmoid(x)) = -softplus(x) (ref: ``log1m_inv_logit.hpp``)."""
    return -jax.nn.softplus(x)


def log1m(x):
    """log(1 - x) (ref: ``log1m.hpp``)."""
    return jnp.log1p(-x)


def log1p_exp(x):
    """log(1 + exp(x)), stable softplus (ref: ``log1p_exp.hpp``)."""
    return jax.nn.softplus(x)


def log1m_exp(x):
    """log(1 - exp(x)) for x < 0, stable both near 0 and -inf.

    Ref: ``log1m_exp.hpp`` — switchover at -log(2) between
    ``log(-expm1(x))`` and ``log1p(-exp(x))``.
    """
    x = jnp.asarray(x)
    # Clamp the argument fed to each branch so the unselected branch never
    # produces nan (which would poison gradients through jnp.where).
    safe_hi = jnp.where(x > -LOG_TWO, x, -LOG_TWO)  # branch for x in (-log2, 0)
    safe_lo = jnp.where(x > -LOG_TWO, -LOG_TWO, x)
    hi = jnp.log(-jnp.expm1(safe_hi))
    lo = jnp.log1p(-jnp.exp(safe_lo))
    out = jnp.where(x > -LOG_TWO, hi, lo)
    return jnp.where(x < 0, out, jnp.nan)


def log_diff_exp(a, b):
    """log(exp(a) - exp(b)) for a > b (ref: ``log_diff_exp.hpp``)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    return a + log1m_exp(jnp.minimum(b - a, 0.0) + 0.0 * a)


def log_sum_exp(x, y=None, axis=None):
    """Ref: ``log_sum_exp.hpp``; binary or reduction form."""
    if y is not None:
        return jnp.logaddexp(x, y)
    return jsp.logsumexp(x, axis=axis)


def log_mix(theta, lp1, lp2):
    """log(theta*exp(lp1) + (1-theta)*exp(lp2)) (ref: ``log_mix.hpp``)."""
    return jnp.logaddexp(jnp.log(theta) + lp1, jnp.log1p(-theta) + lp2)


def log1m_p(lp):
    """log(1 - exp(lp)) alias used by ccdf code paths."""
    return log1m_exp(lp)


def multiply_log(a, b):
    """a * log(b) with 0*log(0) = 0 (ref: ``multiply_log.hpp``)."""
    return jsp.xlogy(a, b)


lmultiply = multiply_log


def binary_log_loss(y, y_hat):
    """-(y log ŷ + (1-y) log(1-ŷ)) (ref: ``binary_log_loss.hpp``)."""
    return -(jsp.xlogy(y, y_hat) + jsp.xlog1py(1.0 - y, -y_hat))


# --- gamma / beta family ----------------------------------------------------

lgamma = jsp.gammaln
digamma = jsp.digamma


def trigamma(x):
    return jsp.polygamma(1, x)


def lbeta(a, b):
    """log Beta(a, b) (ref: ``lbeta.hpp``).

    Composed from ``gammaln`` directly; ``jax.scipy.special.betaln``'s
    algorithm has ~1e-6 absolute error for moderate arguments.
    """
    return jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)


def lchoose(n, k):
    """log binomial coefficient (ref: ``binomial_coefficient_log.hpp``)."""
    return jsp.gammaln(n + 1.0) - jsp.gammaln(k + 1.0) - jsp.gammaln(n - k + 1.0)


def lmgamma(p, x):
    """log multivariate gamma (ref: ``lmgamma.hpp``)."""
    return jsp.multigammaln(x, p)


def log_falling_factorial(x, n):
    """log(x * (x-1) * ... * (x-n+1)) (ref: ``log_falling_factorial.hpp``)."""
    return jsp.gammaln(x + 1.0) - jsp.gammaln(x - n + 1.0)


def log_rising_factorial(x, n):
    """log(x * (x+1) * ... * (x+n-1)) (ref: ``log_rising_factorial.hpp``)."""
    return jsp.gammaln(x + n) - jsp.gammaln(x)


def inc_beta(a, b, x):
    """Regularized incomplete beta I_x(a, b) (ref: ``inc_beta.hpp``)."""
    return jsp.betainc(a, b, x)


@jax.custom_jvp
def gamma_p(a, z):
    """Regularized lower incomplete gamma P(a, z) (ref: ``gamma_p.hpp``).

    custom_jvp: XLA's igamma ships only first-order rules; expressing the
    partials through ``grad_reg_lower_inc_gamma`` (itself differentiable)
    gives second-order AD — the reference's fvar<fvar<var>> instantiation.
    """
    return jsp.gammainc(a, z)


@gamma_p.defjvp
def _gamma_p_jvp(primals, tangents):
    from math_tpu.special.hyper import grad_reg_lower_inc_gamma

    a, z = primals
    da, dz = tangents
    p = gamma_p(a, z)
    dpda = grad_reg_lower_inc_gamma(a, z)
    dpdz = jnp.exp(-z + (a - 1.0) * jnp.log(z) - jsp.gammaln(a))
    return p, dpda * da + dpdz * dz


@jax.custom_jvp
def gamma_q(a, z):
    """Regularized upper incomplete gamma Q(a, z) (ref: ``gamma_q.hpp``);
    second-order-capable partials via ``grad_reg_inc_gamma`` (see gamma_p)."""
    return jsp.gammaincc(a, z)


@gamma_q.defjvp
def _gamma_q_jvp(primals, tangents):
    from math_tpu.special.hyper import grad_reg_inc_gamma

    a, z = primals
    da, dz = tangents
    q = gamma_q(a, z)
    dqda = grad_reg_inc_gamma(a, z)
    dqdz = -jnp.exp(-z + (a - 1.0) * jnp.log(z) - jsp.gammaln(a))
    return q, dqda * da + dqdz * dz


# --- normal CDF family (ref: Phi.hpp, inv_Phi.hpp, Phi_approx.hpp) ----------


def Phi(x):
    return jsp.ndtr(x)


def log_Phi(x):
    return jsp.log_ndtr(x)


def inv_Phi(p):
    return jsp.ndtri(p)


def Phi_approx(x):
    """Logistic approximation to Phi (ref: ``Phi_approx.hpp``)."""
    return jax.nn.sigmoid(0.07056 * x * x * x + 1.5976 * x)


erf = jsp.erf
erfc = jsp.erfc


def inv_erfc(p):
    return -jsp.ndtri(0.5 * p) / SQRT_TWO


# --- Bessel (ref: log_modified_bessel_first_kind.hpp) -----------------------


def log_i0(z):
    """log I0(z), stable via the exponentially scaled i0e."""
    z = jnp.asarray(z)
    return jnp.log(jsp.i0e(z)) + jnp.abs(z)


def log_i1(z):
    z = jnp.asarray(z)
    return jnp.log(jsp.i1e(z)) + jnp.abs(z)


def log_modified_bessel_first_kind(v, z):
    """log I_v(z) for v in {0, 1} fast paths; general v via series.

    Ref: ``log_modified_bessel_first_kind.hpp``.  The general-v series is
    log I_v(z) = v log(z/2) - lgamma(v+1) + log 1F2-type series; adequate
    for the moderate z used by von Mises-style densities.  Integer fast
    paths use the scaled Bessel functions.
    """
    v = jnp.asarray(v, dtype=jnp.result_type(v, z, 1.0))
    z = jnp.asarray(z, dtype=jnp.result_type(v, z, 1.0))

    def series(v, z):
        # log I_v(z) = v*log(z/2) + log sum_k (z^2/4)^k / (k! Gamma(v+k+1))
        K = 64
        k = jnp.arange(K, dtype=z.dtype)
        logz2 = jnp.log(jnp.maximum(z, 1e-300) / 2.0)
        terms = (
            2.0 * k * jnp.expand_dims(logz2, -1)
            - jsp.gammaln(k + 1.0)
            - jsp.gammaln(jnp.expand_dims(v, -1) + k + 1.0)
        )
        return v * logz2 + jsp.logsumexp(terms, axis=-1)

    return series(v, z)


# --- gamma-ratio / combinatorial values (ref: beta.hpp, choose.hpp,
# --- falling_factorial.hpp, rising_factorial.hpp) ---------------------------


def beta(a, b):
    """Beta function B(a, b) (ref: beta.hpp)."""
    return jnp.exp(lbeta(a, b))


def choose(n, k):
    """Exact binomial coefficient for integer args (ref: choose.hpp)."""
    return jnp.round(jnp.exp(lchoose(n, k)))


def falling_factorial(x, n):
    """x (x-1) ... (x-n+1) = Gamma(x+1)/Gamma(x-n+1) for x > n-1
    (ref: falling_factorial.hpp)."""
    return jnp.exp(log_falling_factorial(x, n))


def rising_factorial(x, n):
    """x (x+1) ... (x+n-1) = Gamma(x+n)/Gamma(x) for x > 0
    (ref: rising_factorial.hpp)."""
    return jnp.exp(log_rising_factorial(x, n))


# --- link-ish scalars (ref: inv_cloglog.hpp, log_inv_logit_diff.hpp,
# --- step.hpp, int_step.hpp, sign.hpp) --------------------------------------


def inv_cloglog(x):
    """1 - exp(-exp(x)) (ref: inv_cloglog.hpp); -expm1 form is stable for
    small exp(x)."""
    return -jnp.expm1(-jnp.exp(x))


def log_inv_logit_diff(x, y):
    """log(inv_logit(x) - inv_logit(y)), x > y (ref: log_inv_logit_diff.hpp:
    x - log1p_exp(x) + log1m_exp(y - x) - log1p_exp(y))."""
    return x - log1p_exp(x) + log1m_exp(y - x) - log1p_exp(y)


def step(y):
    """0 if y < 0 else 1 (ref: step.hpp)."""
    y = jnp.asarray(y)
    return jnp.where(y < 0, 0.0, 1.0).astype(y.dtype)


def int_step(y):
    """1 if y > 0 else 0 (ref: int_step.hpp)."""
    return jnp.where(jnp.asarray(y) > 0, 1, 0)


def sign(x):
    """-1 / 0 / 1 (ref: sign.hpp)."""
    return jnp.sign(x)
