"""Per-family distribution fixture tables.

TPU-native analog of the reference's generated distribution tests
(``test/prob/test_fixture_distr.hpp:24-35`` + ``test/prob/generate_tests.cpp``):
each family declares several VALID parameter rows checked against an
independent oracle (scipy or a hand-derived closed form), every INVALID row
(one per violatable argument, which must yield ``-inf`` under the repo's
no-throw convention), a differentiable view used for first- AND second-order
AD-vs-finite-difference checks, cdf/lcdf/lccdf rows, far-tail assertions for
the log-cdfs, and rng moment checks.

The registry is also the source of truth for ``tests/test_value_backed.py``,
which requires that EVERY reference prob file name (319 across
``prim/{scal,mat,arr}/prob``) is hit by at least one value assertion.
"""

from __future__ import annotations

import numpy as np
import scipy.special as sp
import scipy.stats as st

import jax
import jax.numpy as jnp

import math_tpu.dists as d

RNG = np.random.default_rng(0)

Y = np.array([0.7, 1.3, 2.9])
Y2 = np.array([0.05, 4.2])
YP = np.array([0.1, 0.5, 0.9])
YI = np.array([0, 2, 5])
NAN = float("nan")
INF = float("inf")

K3 = 3
_A = RNG.normal(size=(K3, K3))
SIGMA3 = _A @ _A.T + K3 * np.eye(K3)
L3 = np.linalg.cholesky(SIGMA3)
OMEGA3 = np.linalg.inv(SIGMA3)
MU3 = np.array([0.5, -1.0, 2.0])
YV3 = np.array([0.3, -0.2, 1.5])
BAD_SPD = np.array([[1.0, 2.0, 0.0], [2.0, 1.0, 0.0], [0.0, 0.0, 1.0]])  # not PSD
CORR3 = np.array([[1.0, 0.3, 0.1], [0.3, 1.0, -0.2], [0.1, -0.2, 1.0]])
LCORR3 = np.linalg.cholesky(CORR3)


class Fam:
    """One univariate/multivariate density fixture."""

    def __init__(
        self,
        name,
        args,
        oracle,
        rows=(),
        invalid=(),
        f=None,
        point=None,
        grad_tol=2e-5,
        hess=True,
        hess_tol=1e-4,
        skip_hess=None,
        val_tol=1e-7,
        ad_rows=(),
    ):
        self.name = name
        self.args = args
        self.oracle = oracle          # callable(*args) -> total logp (np float)
        self.rows = list(rows)        # extra args tuples, same oracle
        self.invalid = list(invalid)  # args tuples that must give -inf
        self.f = f                    # callable(*point) for AD checks
        self.point = point
        self.grad_tol = grad_tol
        self.hess = hess
        self.hess_tol = hess_tol
        self.skip_hess = skip_hess    # reason string disables the hessian leg
        self.val_tol = val_tol
        # extra points for f, chosen NEAR SUPPORT BOUNDARIES where the
        # double-where second-derivative hazard fires (generate_tests.cpp
        # sweeps many points; a single interior point cannot see these)
        self.ad_rows = list(ad_rows)

    @property
    def lp(self):
        fn = getattr(d, self.name + "_lpdf", None) or getattr(
            d, self.name + "_lpmf"
        )
        return fn

    def __repr__(self):
        return self.name


def _s(x):
    """Total (summed) oracle from an elementwise scipy logpdf array."""
    return float(np.sum(x))


FAMS = [
    # ------------------------------------------------------------------
    # continuous univariate (ref: prim/scal/prob/*_lpdf.hpp)
    # ------------------------------------------------------------------
    Fam(
        "normal",
        (Y, 0.5, 1.3),
        lambda y, m, s: _s(st.norm.logpdf(y, m, s)),
        rows=[(Y2, -2.0, 0.3), (0.0, 10.0, 25.0), (Y, np.array([0.0, 1.0, -1.0]), np.array([1.0, 2.0, 0.5]))],
        invalid=[(NAN, 0.5, 1.3), (Y, NAN, 1.3), (Y, INF, 1.3), (Y, 0.5, 0.0), (Y, 0.5, -1.0), (Y, 0.5, NAN), (Y, 0.5, INF)],
        f=d.normal_lpdf,
        point=(Y, 0.5, 1.3),
    ),
    Fam(
        "std_normal",
        (Y,),
        lambda y: _s(st.norm.logpdf(y)),
        rows=[(Y2,), (-3.0,)],
        invalid=[(NAN,), (INF,)],
        f=d.std_normal_lpdf,
        point=(Y,),
    ),
    Fam(
        "normal_sufficient",
        # n_obs is an int (Stan's T_s): must stay non-differentiable so the
        # propto-dropped n*log(2*pi) term is a true constant.
        (1.1, 4.2, 10, 0.5, 1.3),
        lambda yb, ss, n, m, s: _s(
            -(ss + n * (yb - m) ** 2) / (2 * s**2)
            - n * np.log(s)
            - n * 0.5 * np.log(2 * np.pi)
        ),
        rows=[(0.0, 1.0, 5, 0.0, 2.0)],
        invalid=[(NAN, 4.2, 10.0, 0.5, 1.3), (1.1, -1.0, 10.0, 0.5, 1.3), (1.1, 4.2, 0.0, 0.5, 1.3), (1.1, 4.2, 10.0, NAN, 1.3), (1.1, 4.2, 10.0, 0.5, -1.0)],
        f=lambda yb, ss, m, s: d.normal_sufficient_lpdf(yb, ss, 10.0, m, s),
        point=(1.1, 4.2, 0.5, 1.3),
    ),
    Fam(
        "lognormal",
        (Y, 0.2, 0.8),
        lambda y, m, s: _s(st.lognorm.logpdf(y, s, scale=np.exp(m))),
        rows=[(Y2, -1.0, 2.0)],
        invalid=[(-1.0, 0.2, 0.8), (0.0, 0.2, 0.8), (Y, NAN, 0.8), (Y, 0.2, 0.0), (Y, 0.2, -2.0)],
        f=d.lognormal_lpdf,
        point=(Y, 0.2, 0.8),
        ad_rows=[(np.array([1e-3, 0.7]), 0.2, 0.8)],
    ),
    Fam(
        "cauchy",
        (Y, 0.5, 2.0),
        lambda y, m, s: _s(st.cauchy.logpdf(y, m, s)),
        rows=[(Y2, -3.0, 0.4)],
        invalid=[(NAN, 0.5, 2.0), (Y, NAN, 2.0), (Y, 0.5, 0.0), (Y, 0.5, -1.0)],
        f=d.cauchy_lpdf,
        point=(Y, 0.5, 2.0),
    ),
    Fam(
        "student_t",
        (Y, 4.0, 0.5, 2.0),
        lambda y, nu, m, s: _s(st.t.logpdf(y, nu, m, s)),
        rows=[(Y2, 1.5, 0.0, 1.0), (Y, 30.0, 0.5, 2.0)],
        invalid=[(NAN, 4.0, 0.5, 2.0), (Y, 0.0, 0.5, 2.0), (Y, -1.0, 0.5, 2.0), (Y, 4.0, NAN, 2.0), (Y, 4.0, 0.5, 0.0)],
        f=d.student_t_lpdf,
        point=(Y, 4.0, 0.5, 2.0),
    ),
    Fam(
        "double_exponential",
        (Y, 0.5, 2.0),
        lambda y, m, s: _s(st.laplace.logpdf(y, m, s)),
        rows=[(Y2, -1.0, 0.7)],
        invalid=[(NAN, 0.5, 2.0), (Y, NAN, 2.0), (Y, 0.5, 0.0), (Y, 0.5, -1.0)],
        f=d.double_exponential_lpdf,
        point=(Y, 0.5, 2.0),
    ),
    Fam(
        "logistic",
        (Y, 0.5, 2.0),
        lambda y, m, s: _s(st.logistic.logpdf(y, m, s)),
        rows=[(Y2, -1.0, 0.7)],
        invalid=[(NAN, 0.5, 2.0), (Y, NAN, 2.0), (Y, 0.5, 0.0)],
        f=d.logistic_lpdf,
        point=(Y, 0.5, 2.0),
    ),
    Fam(
        "gumbel",
        (Y, 0.5, 2.0),
        lambda y, m, b: _s(st.gumbel_r.logpdf(y, m, b)),
        rows=[(Y2, -1.0, 0.7)],
        invalid=[(NAN, 0.5, 2.0), (Y, NAN, 2.0), (Y, 0.5, 0.0)],
        f=d.gumbel_lpdf,
        point=(Y, 0.5, 2.0),
    ),
    Fam(
        "exponential",
        (Y, 1.7),
        lambda y, b: _s(st.expon.logpdf(y, scale=1 / b)),
        rows=[(Y2, 0.2)],
        invalid=[(-1.0, 1.7), (NAN, 1.7), (Y, 0.0), (Y, -2.0), (Y, NAN)],
        f=d.exponential_lpdf,
        point=(Y, 1.7),
        ad_rows=[(np.array([1e-4, 0.7]), 1.7)],
    ),
    Fam(
        "gamma",
        (Y, 2.0, 1.5),
        lambda y, a, b: _s(st.gamma.logpdf(y, a, scale=1 / b)),
        rows=[(Y2, 0.5, 3.0), (Y, 9.0, 0.5)],
        invalid=[(-1.0, 2.0, 1.5), (NAN, 2.0, 1.5), (Y, 0.0, 1.5), (Y, -1.0, 1.5), (Y, 2.0, 0.0), (Y, 2.0, -1.0)],
        f=d.gamma_lpdf,
        point=(Y, 2.0, 1.5),
        ad_rows=[(np.array([1e-3, 0.7]), 2.0, 1.5),
                 (np.array([1e-2, 0.7]), 0.7, 1.5)],
    ),
    Fam(
        "inv_gamma",
        (Y, 2.0, 1.5),
        lambda y, a, b: _s(st.invgamma.logpdf(y, a, scale=b)),
        rows=[(Y2, 0.5, 3.0)],
        invalid=[(-1.0, 2.0, 1.5), (Y, 0.0, 1.5), (Y, 2.0, 0.0)],
        f=d.inv_gamma_lpdf,
        point=(Y, 2.0, 1.5),
        ad_rows=[(np.array([0.05, 0.7]), 2.0, 1.5)],
    ),
    Fam(
        "chi_square",
        (Y, 3.0),
        lambda y, nu: _s(st.chi2.logpdf(y, nu)),
        rows=[(Y2, 0.5)],
        invalid=[(-1.0, 3.0), (Y, 0.0), (Y, -1.0)],
        f=d.chi_square_lpdf,
        point=(Y, 3.0),
    ),
    Fam(
        "inv_chi_square",
        (Y, 3.0),
        lambda y, nu: _s(st.chi2.logpdf(1 / y, nu) - 2 * np.log(y)),
        rows=[(Y2, 1.5)],
        invalid=[(-1.0, 3.0), (Y, 0.0)],
        f=d.inv_chi_square_lpdf,
        point=(Y, 3.0),
    ),
    Fam(
        "scaled_inv_chi_square",
        (Y, 3.0, 1.5),
        lambda y, nu, s: _s(st.invgamma.logpdf(y, nu / 2, scale=nu * s**2 / 2)),
        rows=[(Y2, 1.5, 0.5)],
        invalid=[(-1.0, 3.0, 1.5), (Y, 0.0, 1.5), (Y, 3.0, 0.0)],
        f=d.scaled_inv_chi_square_lpdf,
        point=(Y, 3.0, 1.5),
    ),
    Fam(
        "weibull",
        (Y, 2.0, 1.5),
        lambda y, a, s: _s(st.weibull_min.logpdf(y, a, scale=s)),
        rows=[(Y2, 0.7, 3.0)],
        invalid=[(-1.0, 2.0, 1.5), (Y, 0.0, 1.5), (Y, 2.0, 0.0)],
        f=d.weibull_lpdf,
        point=(Y, 2.0, 1.5),
        ad_rows=[(np.array([1e-3, 0.7]), 2.0, 1.5)],
    ),
    Fam(
        "frechet",
        (Y, 2.0, 1.5),
        lambda y, a, s: _s(st.invweibull.logpdf(y, a, scale=s)),
        rows=[(Y2, 0.7, 3.0)],
        invalid=[(-1.0, 2.0, 1.5), (0.0, 2.0, 1.5), (Y, 0.0, 1.5), (Y, 2.0, 0.0)],
        f=d.frechet_lpdf,
        point=(Y, 2.0, 1.5),
    ),
    Fam(
        "rayleigh",
        (Y, 1.5),
        lambda y, s: _s(st.rayleigh.logpdf(y, scale=s)),
        rows=[(Y2, 0.3)],
        invalid=[(-1.0, 1.5), (Y, 0.0), (Y, -1.0)],
        f=d.rayleigh_lpdf,
        point=(Y, 1.5),
    ),
    Fam(
        "pareto",
        (Y, 0.5, 2.0),
        lambda y, ym, a: _s(st.pareto.logpdf(y, a, scale=ym)),
        rows=[(np.array([2.0, 7.0]), 1.5, 0.7)],
        invalid=[(0.3, 0.5, 2.0), (Y, 0.0, 2.0), (Y, -1.0, 2.0), (Y, 0.5, 0.0)],
        f=d.pareto_lpdf,
        point=(Y, 0.5, 2.0),
        ad_rows=[(np.array([0.5001, 0.7]), 0.5, 2.0)],
    ),
    Fam(
        "pareto_type_2",
        (Y, 0.0, 1.5, 2.0),
        lambda y, m, lam, a: _s(st.lomax.logpdf(y - m, a, scale=lam)),
        rows=[(Y, -1.0, 0.5, 3.0)],
        invalid=[(-1.0, 0.0, 1.5, 2.0), (Y, NAN, 1.5, 2.0), (Y, 0.0, 0.0, 2.0), (Y, 0.0, 1.5, 0.0)],
        f=d.pareto_type_2_lpdf,
        point=(Y, 0.0, 1.5, 2.0),
    ),
    Fam(
        "beta",
        (YP, 2.0, 3.0),
        lambda y, a, b: _s(st.beta.logpdf(y, a, b)),
        rows=[(YP, 0.5, 0.5), (YP, 9.0, 1.5)],
        invalid=[(1.5, 2.0, 3.0), (-0.1, 2.0, 3.0), (YP, 0.0, 3.0), (YP, -1.0, 3.0), (YP, 2.0, 0.0)],
        f=d.beta_lpdf,
        point=(YP, 2.0, 3.0),
        ad_rows=[(np.array([1e-4, 0.5]), 2.0, 3.0),
                 (np.array([0.5, 1.0 - 1e-4]), 2.0, 3.0)],
    ),
    Fam(
        "beta_proportion",
        (YP, 0.4, 5.0),
        lambda y, m, k: _s(st.beta.logpdf(y, m * k, (1 - m) * k)),
        rows=[(YP, 0.9, 2.0)],
        invalid=[(1.5, 0.4, 5.0), (YP, 0.0, 5.0), (YP, 1.0, 5.0), (YP, 1.4, 5.0), (YP, 0.4, 0.0)],
        f=d.beta_proportion_lpdf,
        point=(YP, 0.4, 5.0),
    ),
    Fam(
        "uniform",
        (Y, 0.0, 5.0),
        lambda y, a, b: _s(st.uniform.logpdf(y, a, b - a)),
        rows=[(Y, -10.0, 10.0)],
        invalid=[(7.0, 0.0, 5.0), (-1.0, 0.0, 5.0), (Y, 5.0, 0.0), (Y, NAN, 5.0)],
        f=d.uniform_lpdf,
        point=(Y, 0.0, 5.0),
        ad_rows=[(np.array([1e-5, 5.0 - 1e-5]), 0.0, 5.0)],
    ),
    Fam(
        "von_mises",
        (np.array([-1.0, 0.3, 2.0]), 0.5, 2.0),
        lambda y, m, k: _s(st.vonmises.logpdf(y, k, loc=m)),
        rows=[(np.array([-1.0, 0.3, 2.0]), 0.5, 60.0)],
        invalid=[(NAN, 0.5, 2.0), (np.array([-1.0, 0.3, 2.0]), NAN, 2.0), (np.array([-1.0, 0.3, 2.0]), 0.5, -1.0)],
        f=d.von_mises_lpdf,
        point=(np.array([-1.0, 0.3, 2.0]), 0.5, 2.0),
    ),
    Fam(
        "skew_normal",
        (Y, 0.5, 2.0, 3.0),
        lambda y, xi, om, a: _s(st.skewnorm.logpdf(y, a, xi, om)),
        rows=[(Y2, 0.0, 1.0, -2.0), (Y, 0.5, 2.0, 0.0)],
        invalid=[(NAN, 0.5, 2.0, 3.0), (Y, NAN, 2.0, 3.0), (Y, 0.5, 0.0, 3.0), (Y, 0.5, 2.0, NAN)],
        f=d.skew_normal_lpdf,
        point=(Y, 0.5, 2.0, 3.0),
    ),
    Fam(
        "exp_mod_normal",
        (Y, 0.5, 1.2, 0.7),
        lambda y, m, s, lam: _s(st.exponnorm.logpdf(y, 1 / (lam * s), m, s)),
        rows=[(Y2, -1.0, 0.5, 2.0)],
        invalid=[(NAN, 0.5, 1.2, 0.7), (Y, NAN, 1.2, 0.7), (Y, 0.5, 0.0, 0.7), (Y, 0.5, 1.2, 0.0), (Y, 0.5, 1.2, -1.0)],
        f=d.exp_mod_normal_lpdf,
        point=(Y, 0.5, 1.2, 0.7),
    ),
    Fam(
        "wiener",
        (0.8, 1.5, 0.3, 0.5, 0.5),
        None,  # oracle installed below (Navarro-Fuss series)
        rows=[(1.2, 2.0, 0.2, 0.4, -0.8), (2.5, 1.0, 0.1, 0.6, 1.0)],
        invalid=[(0.2, 1.5, 0.3, 0.5, 0.5), (0.8, -1.0, 0.3, 0.5, 0.5), (0.8, 1.5, -0.1, 0.5, 0.5), (0.8, 1.5, 0.3, 1.5, 0.5)],
        f=d.wiener_lpdf,
        point=(0.8, 1.5, 0.3, 0.5, 0.5),
        grad_tol=1e-4,
        hess_tol=2e-3,
        val_tol=1e-6,
    ),
    # ------------------------------------------------------------------
    # discrete univariate (ref: prim/scal/prob/*_lpmf.hpp)
    # ------------------------------------------------------------------
    Fam(
        "bernoulli",
        (np.array([0, 1, 1]), 0.3),
        lambda y, t: _s(st.bernoulli.logpmf(y, t)),
        rows=[(np.array([0, 1, 1]), 0.999)],
        invalid=[(2, 0.3), (-1, 0.3), (1, 1.3), (1, -0.1), (1, NAN)],
        f=lambda t: d.bernoulli_lpmf(np.array([0, 1, 1]), t),
        point=(0.3,),
    ),
    Fam(
        "bernoulli_logit",
        (np.array([0, 1, 1]), 0.4),
        lambda y, a: _s(st.bernoulli.logpmf(y, sp.expit(a))),
        rows=[(np.array([0, 1, 1]), -20.0), (np.array([0, 1, 1]), 20.0)],
        invalid=[(2, 0.4), (1, NAN)],
        f=lambda a: d.bernoulli_logit_lpmf(np.array([0, 1, 1]), a),
        point=(0.4,),
    ),
    Fam(
        "binomial",
        (YI, 8, 0.3),
        lambda y, n, t: _s(st.binom.logpmf(y, n, t)),
        rows=[(YI, 8, 0.95)],
        invalid=[(9, 8, 0.3), (-1, 8, 0.3), (YI, 8, 1.3), (YI, 8, -0.1)],
        f=lambda t: d.binomial_lpmf(YI, 8, t),
        point=(0.3,),
    ),
    Fam(
        "binomial_logit",
        (YI, 8, -0.4),
        lambda y, n, a: _s(st.binom.logpmf(y, n, sp.expit(a))),
        rows=[(YI, 8, 3.0)],
        invalid=[(9, 8, -0.4), (YI, 8, NAN)],
        f=lambda a: d.binomial_logit_lpmf(YI, 8, a),
        point=(-0.4,),
    ),
    Fam(
        "beta_binomial",
        (YI, 8, 2.0, 3.0),
        lambda y, n, a, b: _s(st.betabinom.logpmf(y, n, a, b)),
        rows=[(YI, 8, 0.5, 0.5)],
        invalid=[(9, 8, 2.0, 3.0), (YI, 8, 0.0, 3.0), (YI, 8, 2.0, -1.0)],
        f=lambda a, b: d.beta_binomial_lpmf(YI, 8, a, b),
        point=(2.0, 3.0),
    ),
    Fam(
        "poisson",
        (YI, 2.5),
        lambda y, lam: _s(st.poisson.logpmf(y, lam)),
        rows=[(YI, 0.02), (np.array([40, 55]), 50.0)],
        invalid=[(-1, 2.5), (YI, -1.0), (YI, NAN)],
        f=lambda lam: d.poisson_lpmf(YI, lam),
        point=(2.5,),
    ),
    Fam(
        "poisson_log",
        (YI, 0.9),
        lambda y, a: _s(st.poisson.logpmf(y, np.exp(a))),
        rows=[(YI, -3.0)],
        invalid=[(-1, 0.9), (YI, NAN)],
        f=lambda a: d.poisson_log_lpmf(YI, a),
        point=(0.9,),
    ),
    Fam(
        "neg_binomial",
        (YI, 3.0, 2.0),
        lambda y, a, b: _s(st.nbinom.logpmf(y, a, b / (b + 1))),
        rows=[(YI, 0.5, 0.5)],
        invalid=[(-1, 3.0, 2.0), (YI, 0.0, 2.0), (YI, 3.0, 0.0)],
        f=lambda a, b: d.neg_binomial_lpmf(YI, a, b),
        point=(3.0, 2.0),
    ),
    Fam(
        "neg_binomial_2",
        (YI, 2.5, 3.0),
        lambda y, m, p: _s(st.nbinom.logpmf(y, p, p / (p + m))),
        rows=[(YI, 0.3, 10.0)],
        invalid=[(-1, 2.5, 3.0), (YI, 0.0, 3.0), (YI, 2.5, 0.0)],
        f=lambda m, p: d.neg_binomial_2_lpmf(YI, m, p),
        point=(2.5, 3.0),
    ),
    Fam(
        "neg_binomial_2_log",
        (YI, np.log(2.5), 3.0),
        lambda y, e, p: _s(st.nbinom.logpmf(y, p, p / (p + np.exp(e)))),
        rows=[(YI, -1.0, 0.5)],
        invalid=[(-1, 0.9, 3.0), (YI, NAN, 3.0), (YI, 0.9, 0.0)],
        f=lambda e, p: d.neg_binomial_2_log_lpmf(YI, e, p),
        point=(0.9, 3.0),
    ),
    Fam(
        "hypergeometric",
        (np.array([1, 2, 3]), 5, 6, 8),
        lambda y, n, a, b: _s(st.hypergeom.logpmf(y, a + b, a, n)),
        rows=[(2, 4, 10, 3)],
        invalid=[(7, 5, 6, 8), (-1, 5, 6, 8)],
        f=None,  # all-integer args: nothing to differentiate
        point=None,
    ),
    Fam(
        "categorical",
        (np.array([1, 3, 2, 3]), np.array([0.2, 0.3, 0.5])),
        lambda y, t: _s(np.log(np.asarray(t)[np.asarray(y) - 1])),
        rows=[(2, np.array([0.2, 0.3, 0.5]))],
        invalid=[(0, np.array([0.2, 0.3, 0.5])), (4, np.array([0.2, 0.3, 0.5])), (1, np.array([0.2, 0.3, 0.6]))],
        # renormalize inside f: finite-difference probes leave the simplex,
        # which the value-level check_simplex mask now (correctly) rejects
        f=lambda t: d.categorical_lpmf(np.array([1, 3, 2, 3]), t / jnp.sum(t)),
        point=(np.array([0.2, 0.3, 0.5]),),
    ),
    Fam(
        "categorical_logit",
        (np.array([1, 3, 2, 3]), np.log(np.array([0.2, 0.3, 0.5]))),
        lambda y, b: _s(np.asarray(b)[np.asarray(y) - 1] - sp.logsumexp(b)),
        rows=[(2, np.array([0.0, 1.0, -1.0]))],
        invalid=[(0, np.array([0.0, 1.0, -1.0])), (4, np.array([0.0, 1.0, -1.0]))],
        f=lambda b: d.categorical_logit_lpmf(np.array([1, 3, 2, 3]), b),
        point=(np.log(np.array([0.2, 0.3, 0.5])),),
    ),
    Fam(
        "ordered_logistic",
        (2, 0.3, np.array([-0.5, 0.8, 2.0])),
        lambda y, e, c: float(
            np.log(
                sp.expit(e - np.concatenate([[-np.inf], c]))[y - 1]
                - sp.expit(e - np.concatenate([c, [np.inf]]))[y - 1]
            )
        ),
        rows=[(1, 0.3, np.array([-0.5, 0.8, 2.0])), (4, 0.3, np.array([-0.5, 0.8, 2.0]))],
        invalid=[(0, 0.3, np.array([-0.5, 0.8, 2.0])), (5, 0.3, np.array([-0.5, 0.8, 2.0])), (2, 0.3, np.array([0.8, -0.5, 2.0]))],
        f=lambda e, c: d.ordered_logistic_lpmf(2, e, c),
        point=(0.3, np.array([-0.5, 0.8, 2.0])),
    ),
    Fam(
        "ordered_probit",
        (2, 0.3, np.array([-0.5, 0.8, 2.0])),
        lambda y, e, c: float(
            np.log(
                st.norm.cdf(e - np.concatenate([[-np.inf], c]))[y - 1]
                - st.norm.cdf(e - np.concatenate([c, [np.inf]]))[y - 1]
            )
        ),
        rows=[(1, 0.3, np.array([-0.5, 0.8, 2.0])), (4, 0.3, np.array([-0.5, 0.8, 2.0]))],
        invalid=[(0, 0.3, np.array([-0.5, 0.8, 2.0])), (5, 0.3, np.array([-0.5, 0.8, 2.0]))],
        f=lambda e, c: d.ordered_probit_lpmf(2, e, c),
        point=(0.3, np.array([-0.5, 0.8, 2.0])),
        grad_tol=1e-4,
    ),
    Fam(
        "multinomial",
        (np.array([2, 3, 5]), np.array([0.2, 0.3, 0.5])),
        lambda y, t: _s(st.multinomial.logpmf(y, np.sum(y), t)),
        rows=[(np.array([0, 0, 4]), np.array([0.2, 0.3, 0.5]))],
        invalid=[(np.array([-1, 3, 5]), np.array([0.2, 0.3, 0.5])), (np.array([2, 3, 5]), np.array([0.2, 0.3, 0.6]))],
        f=lambda t: d.multinomial_lpmf(np.array([2, 3, 5]), t / jnp.sum(t)),
        point=(np.array([0.2, 0.3, 0.5]),),
    ),
    # ------------------------------------------------------------------
    # multivariate (ref: prim/mat/prob/*_lpdf.hpp)
    # ------------------------------------------------------------------
    Fam(
        "multi_normal",
        (YV3, MU3, SIGMA3),
        lambda y, m, s: _s(st.multivariate_normal.logpdf(y, m, s)),
        rows=[(RNG.normal(size=(5, K3)) + MU3, MU3, SIGMA3)],
        invalid=[(YV3, MU3, BAD_SPD), (YV3 * NAN, MU3, SIGMA3), (YV3, MU3 * NAN, SIGMA3)],
        f=lambda y, m: d.multi_normal_lpdf(y, m, SIGMA3),
        point=(YV3, MU3),
    ),
    Fam(
        "multi_normal_cholesky",
        (YV3, MU3, L3),
        lambda y, m, L: _s(st.multivariate_normal.logpdf(y, m, L @ L.T)),
        rows=[(RNG.normal(size=(4, K3)), MU3, L3)],
        invalid=[(YV3 * NAN, MU3, L3), (YV3, MU3, L3 * NAN)],
        f=lambda y, m: d.multi_normal_cholesky_lpdf(y, m, L3),
        point=(YV3, MU3),
    ),
    Fam(
        "multi_normal_prec",
        (YV3, MU3, OMEGA3),
        lambda y, m, om: _s(st.multivariate_normal.logpdf(y, m, np.linalg.inv(om))),
        invalid=[(YV3, MU3, BAD_SPD), (YV3 * NAN, MU3, OMEGA3)],
        f=lambda y, m: d.multi_normal_prec_lpdf(y, m, OMEGA3),
        point=(YV3, MU3),
        val_tol=1e-6,
    ),
    Fam(
        "multi_student_t",
        (YV3, 5.0, MU3, SIGMA3),
        lambda y, nu, m, s: _s(st.multivariate_t.logpdf(y, m, s, df=nu)),
        invalid=[(YV3, 0.0, MU3, SIGMA3), (YV3, 5.0, MU3, BAD_SPD), (YV3 * NAN, 5.0, MU3, SIGMA3)],
        f=lambda y, nu, m: d.multi_student_t_lpdf(y, nu, m, SIGMA3),
        point=(YV3, 5.0, MU3),
    ),
    Fam(
        "dirichlet",
        (np.array([0.2, 0.3, 0.5]), np.array([1.5, 2.0, 3.0])),
        lambda t, a: _s(st.dirichlet.logpdf(np.asarray(t), a)),
        rows=[(np.array([0.1, 0.1, 0.8]), np.array([0.5, 0.5, 0.5]))],
        invalid=[(np.array([0.2, 0.3, 0.6]), np.array([1.5, 2.0, 3.0])), (np.array([0.2, 0.3, 0.5]), np.array([0.0, 2.0, 3.0]))],
        f=lambda a: d.dirichlet_lpdf(np.array([0.2, 0.3, 0.5]), a),
        point=(np.array([1.5, 2.0, 3.0]),),
    ),
    Fam(
        "wishart",
        (SIGMA3 * 1.2 + 0.5 * np.eye(K3), 7.0, SIGMA3),
        lambda w, nu, s: float(st.wishart.logpdf(w, nu, s)),
        invalid=[(BAD_SPD, 7.0, SIGMA3), (SIGMA3, 1.0, SIGMA3)],
        f=lambda nu: d.wishart_lpdf(SIGMA3 * 1.2 + 0.5 * np.eye(K3), nu, SIGMA3),
        point=(7.0,),
        val_tol=1e-6,
    ),
    Fam(
        "inv_wishart",
        (SIGMA3 * 0.8 + 0.3 * np.eye(K3), 7.0, SIGMA3),
        lambda w, nu, s: float(st.invwishart.logpdf(w, nu, s)),
        invalid=[(BAD_SPD, 7.0, SIGMA3), (SIGMA3, 1.0, SIGMA3)],
        f=lambda nu: d.inv_wishart_lpdf(SIGMA3 * 0.8 + 0.3 * np.eye(K3), nu, SIGMA3),
        point=(7.0,),
        val_tol=1e-6,
    ),
    Fam(
        "lkj_corr",
        (CORR3, 1.7),
        None,  # oracle installed below (normalizing constant formula)
        invalid=[(BAD_SPD, 1.7), (CORR3, 0.0), (CORR3, -1.0)],
        f=lambda eta: d.lkj_corr_lpdf(CORR3, eta),
        point=(1.7,),
    ),
    Fam(
        "lkj_corr_cholesky",
        (LCORR3, 1.7),
        None,  # oracle installed below (lkj_corr + cholesky jacobian)
        invalid=[(LCORR3, 0.0)],
        f=lambda eta: d.lkj_corr_cholesky_lpdf(LCORR3, eta),
        point=(1.7,),
    ),
    Fam(
        "lkj_cov",
        (SIGMA3, MU3, np.array([0.5, 0.7, 0.9]), 1.7),
        None,  # oracle installed below (lognormal sds + lkj corr)
        invalid=[(BAD_SPD, MU3, np.array([0.5, 0.7, 0.9]), 1.7)],
        f=lambda eta: d.lkj_cov_lpdf(SIGMA3, MU3, np.array([0.5, 0.7, 0.9]), eta),
        point=(1.7,),
    ),
    Fam(
        "multi_gp",
        (RNG.normal(size=(2, K3)), SIGMA3, np.array([0.5, 2.0])),
        lambda y, s, w: _s(
            [st.multivariate_normal.logpdf(yi, np.zeros(len(yi)), s / wi) for yi, wi in zip(np.asarray(y), np.asarray(w))]
        ),
        invalid=[(RNG.normal(size=(2, K3)), BAD_SPD, np.array([0.5, 2.0])), (RNG.normal(size=(2, K3)), SIGMA3, np.array([-0.5, 2.0]))],
        f=lambda w: d.multi_gp_lpdf(np.arange(6.0).reshape(2, 3) / 3.0, SIGMA3, w),
        point=(np.array([0.5, 2.0]),),
    ),
    Fam(
        "multi_gp_cholesky",
        (RNG.normal(size=(2, K3)), L3, np.array([0.5, 2.0])),
        lambda y, L, w: _s(
            [st.multivariate_normal.logpdf(yi, np.zeros(len(yi)), (L @ L.T) / wi) for yi, wi in zip(np.asarray(y), np.asarray(w))]
        ),
        invalid=[(RNG.normal(size=(2, K3)), L3, np.array([-0.5, 2.0]))],
        f=lambda w: d.multi_gp_cholesky_lpdf(np.arange(6.0).reshape(2, 3) / 3.0, L3, w),
        point=(np.array([0.5, 2.0]),),
    ),
    Fam(
        "matrix_normal_prec",
        (RNG.normal(size=(2, K3)), np.zeros((2, K3)), np.eye(2) * 2.0, OMEGA3),
        lambda y, mu, s, dd: float(
            st.matrix_normal.logpdf(
                y, mu, rowcov=np.linalg.inv(s), colcov=np.linalg.inv(dd)
            )
        ),
        invalid=[(RNG.normal(size=(2, K3)), np.zeros((2, K3)), np.eye(2) * 2.0, BAD_SPD)],
        f=lambda mu: d.matrix_normal_prec_lpdf(np.arange(6.0).reshape(2, 3), mu, np.eye(2) * 2.0, OMEGA3),
        point=(np.zeros((2, K3)),),
        val_tol=1e-6,
    ),
    Fam(
        "gaussian_dlm_obs",
        None,  # args installed below (local-level model)
        None,
        f=None,
        point=None,
    ),
    # ------------------------------------------------------------------
    # fused GLM families (ref: prim/mat/prob/*_glm_*.hpp)
    # ------------------------------------------------------------------
    Fam(
        "bernoulli_logit_glm",
        None,  # installed below
        None,
        f=None,
        point=None,
    ),
    Fam("poisson_log_glm", None, None, f=None, point=None),
    Fam("neg_binomial_2_log_glm", None, None, f=None, point=None),
    Fam("normal_id_glm", None, None, f=None, point=None),
    Fam("ordered_logistic_glm", None, None, f=None, point=None),
    Fam("categorical_logit_glm", None, None, f=None, point=None),
]


# -- late-bound fixtures that need shared precomputation --------------------

def _wiener_oracle(t, a, tau, b, v, terms=200):
    x = (t - tau) / a**2
    w = 1.0 - b
    s = 0.0
    for k in range(-terms, terms + 1):
        s += (w + 2 * k) * np.exp(-((w + 2 * k) ** 2) / (2 * x))
    f = s / np.sqrt(2 * np.pi * x**3)
    return float(np.log((1 / a**2) * f * np.exp(v * a * w - v**2 * x * a**2 / 2)))


def _lkj_corr_oracle(y, eta):
    """LKJ density: (eta-1) log det(y) - log c_K(eta).

    Independent derivation of the normalizing constant via the vine
    construction (LKJ 2009, Thm 5): lag-L partial correlations are
    Beta(b_L, b_L) on (-1,1) with b_L = eta + (K-1-L)/2, each of the K-L
    lag-L pairs contributing 2^(2 b_L - 1) B(b_L, b_L).  Cross-checked:
    K=2 gives 2^(2 eta - 1) B(eta, eta); K=3, eta=1 gives the elliptope
    volume pi^2/2.  (Reference: do_lkj_constant in lkj_corr_lpdf.hpp.)
    """
    y = np.asarray(y)
    k = y.shape[-1]
    logc = 0.0
    for L in range(1, k):
        b = eta + (k - 1 - L) / 2.0
        logc += (k - L) * (sp.betaln(b, b) + (2.0 * b - 1.0) * np.log(2.0))
    return float((eta - 1.0) * np.log(np.linalg.det(y)) - logc)


def _install():
    by_name = {f.name: f for f in FAMS}

    w = by_name["wiener"]
    w.oracle = lambda *a: _wiener_oracle(*a)

    lk = by_name["lkj_corr"]
    lk.oracle = _lkj_corr_oracle

    lkc = by_name["lkj_corr_cholesky"]

    def _lkj_chol_oracle(L, eta):
        L = np.asarray(L)
        k = L.shape[-1]
        jac = sum((k - i - 1) * np.log(L[i, i]) for i in range(k))
        return _lkj_corr_oracle(L @ L.T, eta) + float(jac)

    lkc.oracle = _lkj_chol_oracle

    lcov = by_name["lkj_cov"]

    def _lkj_cov_oracle(y, mu, sigma, eta):
        y = np.asarray(y)
        sds = np.sqrt(np.diag(y))
        corr = y / np.outer(sds, sds)
        lp = _s(st.lognorm.logpdf(sds, np.asarray(sigma), scale=np.exp(mu)))
        # jacobian of cov -> (corr, sd): dCov = prod sd_i^{K+1}? Stan's
        # lkj_cov_lpdf sums lognormal(sds) + lkj_corr(corr) WITHOUT a
        # jacobian term (it is a prior over (tau, Omega) evaluated at
        # implied values — ref: prim/mat/prob/lkj_cov_lpdf.hpp:36-59).
        return lp + _lkj_corr_oracle(corr, eta)

    lcov.oracle = _lkj_cov_oracle

    # gaussian_dlm_obs: 1-D local level has a dense MVN closed form
    T = 6
    F = np.array([[1.0]])
    G = np.array([[1.0]])
    V = np.array([[0.5]])
    W = np.array([[0.2]])
    m0 = np.array([0.0])
    C0 = np.array([[1.0]])
    ydlm = RNG.normal(size=(1, T))
    sidx = np.arange(1, T + 1)
    cov = C0[0, 0] + W[0, 0] * np.minimum.outer(sidx, sidx) + V[0, 0] * np.eye(T)

    dlm = by_name["gaussian_dlm_obs"]
    dlm.args = (ydlm, F, G, V, W, m0, C0)
    dlm.oracle = lambda y, *_: float(
        st.multivariate_normal.logpdf(np.asarray(y)[0], np.zeros(T), cov)
    )
    dlm.invalid = [(ydlm * NAN, F, G, V, W, m0, C0)]
    dlm.f = lambda g: d.gaussian_dlm_obs_lpdf(ydlm, F, g, V, W, m0, C0)
    dlm.point = (G,)
    dlm.grad_tol = 1e-4
    dlm.hess_tol = 1e-3

    # GLMs: small design, oracle = unfused composition via scipy
    n, p = 5, 3
    X = RNG.normal(size=(n, p))
    BETA = np.array([0.5, -0.3, 0.8])
    ALPHA = 0.4
    ETA = X @ BETA + ALPHA
    yb = (RNG.uniform(size=n) < sp.expit(ETA)).astype(np.int32)
    yp = RNG.poisson(np.exp(ETA)).astype(np.int32)
    yn = RNG.normal(size=n) + ETA

    g = by_name["bernoulli_logit_glm"]
    g.args = (yb, X, ALPHA, BETA)
    g.oracle = lambda y, x, a, b: _s(
        st.bernoulli.logpmf(y, sp.expit(np.asarray(x) @ b + a))
    )
    g.invalid = [(yb * 0 + 2, X, ALPHA, BETA), (yb, X, NAN, BETA)]
    g.f = lambda a, b: d.bernoulli_logit_glm_lpmf(yb, X, a, b)
    g.point = (ALPHA, BETA)

    g = by_name["poisson_log_glm"]
    g.args = (yp, X, ALPHA, BETA)
    g.oracle = lambda y, x, a, b: _s(
        st.poisson.logpmf(y, np.exp(np.asarray(x) @ b + a))
    )
    g.invalid = [(yp * 0 - 1, X, ALPHA, BETA), (yp, X, NAN, BETA)]
    g.f = lambda a, b: d.poisson_log_glm_lpmf(yp, X, a, b)
    g.point = (ALPHA, BETA)

    g = by_name["neg_binomial_2_log_glm"]
    g.args = (yp, X, ALPHA, BETA, 3.0)
    g.oracle = lambda y, x, a, b, phi: _s(
        st.nbinom.logpmf(y, phi, phi / (phi + np.exp(np.asarray(x) @ b + a)))
    )
    g.invalid = [(yp * 0 - 1, X, ALPHA, BETA, 3.0), (yp, X, ALPHA, BETA, 0.0)]
    g.f = lambda a, b, phi: d.neg_binomial_2_log_glm_lpmf(yp, X, a, b, phi)
    g.point = (ALPHA, BETA, 3.0)

    g = by_name["normal_id_glm"]
    g.args = (yn, X, ALPHA, BETA, 1.3)
    g.oracle = lambda y, x, a, b, s: _s(
        st.norm.logpdf(y, np.asarray(x) @ b + a, s)
    )
    g.invalid = [(yn * NAN, X, ALPHA, BETA, 1.3), (yn, X, ALPHA, BETA, -1.0)]
    g.f = lambda a, b, s: d.normal_id_glm_lpdf(yn, X, a, b, s)
    g.point = (ALPHA, BETA, 1.3)

    cuts = np.array([-0.5, 0.8, 2.0])
    yo = np.array([1, 2, 3, 4, 2])
    g = by_name["ordered_logistic_glm"]
    g.args = (yo, X, BETA, cuts)

    def _olg_oracle(y, x, b, c):
        eta = np.asarray(x) @ b
        cc = np.concatenate([[-np.inf], c, [np.inf]])
        pk = sp.expit(eta[:, None] - cc[None, :-1]) - sp.expit(
            eta[:, None] - cc[None, 1:]
        )
        return _s(np.log(pk[np.arange(len(y)), np.asarray(y) - 1]))

    g.oracle = _olg_oracle
    g.invalid = [(yo * 0, X, BETA, cuts), (yo, X, BETA, cuts[::-1])]
    g.f = lambda b, c: d.ordered_logistic_glm_lpmf(yo, X, b, c)
    g.point = (BETA, cuts)

    BETA_K = RNG.normal(size=(p, 3))
    ALPHA_K = np.array([0.1, -0.2, 0.3])
    yc = np.array([1, 3, 2, 1, 3])
    g = by_name["categorical_logit_glm"]
    g.args = (yc, X, ALPHA_K, BETA_K)

    def _clg_oracle(y, x, a, b):
        eta = np.asarray(x) @ b + a
        lsm = eta - sp.logsumexp(eta, axis=-1, keepdims=True)
        return _s(lsm[np.arange(len(y)), np.asarray(y) - 1])

    g.oracle = _clg_oracle
    g.invalid = [(yc * 0, X, ALPHA_K, BETA_K), (yc * 0 + 4, X, ALPHA_K, BETA_K)]
    g.f = lambda a, b: d.categorical_logit_glm_lpmf(yc, X, a, b)
    g.point = (ALPHA_K, BETA_K)


_install()


# ---------------------------------------------------------------------------
# cdf / lcdf / lccdf fixtures  (oracle returns ELEMENTWISE probabilities)
# ---------------------------------------------------------------------------

class CdfFam:
    def __init__(self, name, args, probs, rows=(), tol=1e-6, logsf=None):
        self.name = name
        self.args = args
        self.probs = probs
        self.rows = list(rows)
        self.tol = tol
        # optional log-survival oracle: needed when cdf rounds to 1.0 in
        # float64 so log1p(-probs) would be -inf while the implementation
        # (correctly) returns a finite far-tail value
        self.logsf = logsf

    def __repr__(self):
        return self.name


CDFS = [
    CdfFam("normal", (Y, 0.5, 1.3), lambda y, m, s: st.norm.cdf(y, m, s),
           rows=[(Y2, -2.0, 0.3)], logsf=lambda y, m, s: st.norm.logsf(y, m, s)),
    CdfFam("lognormal", (Y, 0.2, 0.8), lambda y, m, s: st.lognorm.cdf(y, s, scale=np.exp(m))),
    CdfFam("cauchy", (Y, 0.5, 2.0), lambda y, m, s: st.cauchy.cdf(y, m, s)),
    CdfFam("student_t", (Y, 4.0, 0.5, 2.0), lambda y, nu, m, s: st.t.cdf(y, nu, m, s)),
    CdfFam("double_exponential", (Y, 0.5, 2.0), lambda y, m, s: st.laplace.cdf(y, m, s)),
    CdfFam("logistic", (Y, 0.5, 2.0), lambda y, m, s: st.logistic.cdf(y, m, s)),
    CdfFam("gumbel", (Y, 0.5, 2.0), lambda y, m, b: st.gumbel_r.cdf(y, m, b)),
    CdfFam("exponential", (Y, 1.7), lambda y, b: st.expon.cdf(y, scale=1 / b)),
    CdfFam("gamma", (Y, 2.0, 1.5), lambda y, a, b: st.gamma.cdf(y, a, scale=1 / b)),
    CdfFam("inv_gamma", (Y, 2.0, 1.5), lambda y, a, b: st.invgamma.cdf(y, a, scale=b)),
    CdfFam("chi_square", (Y, 3.0), lambda y, nu: st.chi2.cdf(y, nu)),
    CdfFam("inv_chi_square", (Y, 3.0), lambda y, nu: st.chi2.sf(1 / y, nu)),
    CdfFam("scaled_inv_chi_square", (Y, 3.0, 1.5), lambda y, nu, s: st.invgamma.cdf(y, nu / 2, scale=nu * s**2 / 2)),
    CdfFam("weibull", (Y, 2.0, 1.5), lambda y, a, s: st.weibull_min.cdf(y, a, scale=s)),
    CdfFam("frechet", (Y, 2.0, 1.5), lambda y, a, s: st.invweibull.cdf(y, a, scale=s)),
    CdfFam("rayleigh", (Y, 1.5), lambda y, s: st.rayleigh.cdf(y, scale=s)),
    CdfFam("pareto", (Y, 0.5, 2.0), lambda y, ym, a: st.pareto.cdf(y, a, scale=ym)),
    CdfFam("pareto_type_2", (Y, 0.0, 1.5, 2.0), lambda y, m, lam, a: st.lomax.cdf(y - m, a, scale=lam)),
    CdfFam("beta", (YP, 2.0, 3.0), lambda y, a, b: st.beta.cdf(y, a, b)),
    CdfFam("beta_proportion", (YP, 0.4, 5.0), lambda y, m, k: st.beta.cdf(y, m * k, (1 - m) * k)),
    CdfFam("uniform", (Y, 0.0, 5.0), lambda y, a, b: st.uniform.cdf(y, a, b - a)),
    CdfFam("skew_normal", (Y, 0.5, 2.0, 3.0), lambda y, xi, om, a: st.skewnorm.cdf(y, a, xi, om), tol=5e-6),
    CdfFam("exp_mod_normal", (Y, 0.5, 1.2, 0.7), lambda y, m, s, lam: st.exponnorm.cdf(y, 1 / (lam * s), m, s), tol=5e-6),
    # discrete
    CdfFam("bernoulli", (np.array([0, 1]), 0.3), lambda y, t: st.bernoulli.cdf(y, t),
           logsf=lambda y, t: st.bernoulli.logsf(y, t)),
    CdfFam("binomial", (YI, 8, 0.3), lambda y, n, t: st.binom.cdf(y, n, t)),
    CdfFam("beta_binomial", (YI, 8, 2.0, 3.0), lambda y, n, a, b: st.betabinom.cdf(y, n, a, b)),
    CdfFam("poisson", (YI, 2.5), lambda y, lam: st.poisson.cdf(y, lam)),
    CdfFam("neg_binomial", (YI, 3.0, 2.0), lambda y, a, b: st.nbinom.cdf(y, a, b / (b + 1))),
    CdfFam("neg_binomial_2", (YI, 2.5, 3.0), lambda y, m, p: st.nbinom.cdf(y, p, p / (p + m))),
]


# far-tail assertions for lcdf/lccdf: (name, kind, args, want, tol)
# These are exactly what truncated-data models evaluate (VERDICT Missing #7).
TAILS = [
    ("normal", "lcdf", (-40.0, 0.0, 1.0), st.norm.logcdf(-40.0), 1e-8),
    ("normal", "lccdf", (40.0, 0.0, 1.0), st.norm.logsf(40.0), 1e-8),
    ("normal", "lcdf", (-12.0, 0.5, 1.3), st.norm.logcdf(-12.0, 0.5, 1.3), 1e-9),
    ("lognormal", "lcdf", (1e-12, 0.0, 1.0), st.lognorm.logcdf(1e-12, 1.0), 1e-8),
    ("lognormal", "lccdf", (1e6, 0.0, 1.0), st.lognorm.logsf(1e6, 1.0), 1e-7),
    ("exponential", "lccdf", (500.0, 1.7), -850.0, 1e-12),
    ("exponential", "lcdf", (1e-14, 1.7), np.log(-np.expm1(-1.7e-14)), 1e-6),
    ("gamma", "lccdf", (80.0, 2.0, 1.5), st.gamma.logsf(80.0, 2.0, scale=1 / 1.5), 1e-6),
    ("gamma", "lcdf", (1e-7, 2.0, 1.5), st.gamma.logcdf(1e-7, 2.0, scale=1 / 1.5), 1e-6),
    ("weibull", "lccdf", (40.0, 2.0, 1.5), -(40.0 / 1.5) ** 2.0, 1e-10),
    ("weibull", "lcdf", (1e-8, 2.0, 1.5), np.log(-np.expm1(-(1e-8 / 1.5) ** 2)), 1e-6),
    ("frechet", "lcdf", (0.01, 2.0, 1.5), -((1.5 / 0.01) ** 2.0), 1e-10),
    ("cauchy", "lccdf", (1e8, 0.5, 2.0), st.cauchy.logsf(1e8, 0.5, 2.0), 1e-6),
    ("cauchy", "lcdf", (-1e8, 0.5, 2.0), st.cauchy.logcdf(-1e8, 0.5, 2.0), 1e-6),
    ("student_t", "lcdf", (-1e4, 4.0, 0.5, 2.0), st.t.logcdf(-1e4, 4.0, 0.5, 2.0), 1e-5),
    ("student_t", "lccdf", (1e4, 4.0, 0.5, 2.0), st.t.logsf(1e4, 4.0, 0.5, 2.0), 1e-5),
    ("logistic", "lcdf", (-200.0, 0.5, 2.0), st.logistic.logcdf(-200.0, 0.5, 2.0), 1e-9),
    ("logistic", "lccdf", (200.0, 0.5, 2.0), st.logistic.logsf(200.0, 0.5, 2.0), 1e-9),
    ("gumbel", "lcdf", (-15.0, 0.5, 2.0), st.gumbel_r.logcdf(-15.0, 0.5, 2.0), 1e-9),
    ("gumbel", "lccdf", (50.0, 0.5, 2.0), st.gumbel_r.logsf(50.0, 0.5, 2.0), 1e-7),
    ("beta", "lcdf", (1e-9, 2.0, 3.0), st.beta.logcdf(1e-9, 2.0, 3.0), 1e-5),
    ("beta", "lccdf", (1.0 - 1e-9, 2.0, 3.0), st.beta.logsf(1.0 - 1e-9, 2.0, 3.0), 1e-4),
    ("pareto", "lccdf", (1e9, 0.5, 2.0), st.pareto.logsf(1e9, 2.0, scale=0.5), 1e-8),
    ("rayleigh", "lccdf", (60.0, 1.5), -(60.0**2) / (2 * 1.5**2), 1e-10),
    ("chi_square", "lccdf", (400.0, 3.0), st.chi2.logsf(400.0, 3.0), 1e-6),
    ("poisson", "lcdf", (1, 80.0), st.poisson.logcdf(1, 80.0), 1e-6),
    ("double_exponential", "lcdf", (-400.0, 0.5, 2.0), st.laplace.logcdf(-400.0, 0.5, 2.0), 1e-10),
    ("double_exponential", "lccdf", (400.0, 0.5, 2.0), st.laplace.logsf(400.0, 0.5, 2.0), 1e-10),
]


# ---------------------------------------------------------------------------
# rng fixtures: (name, args, check) — check(draws) asserts moments/support
# ---------------------------------------------------------------------------

def _mean_check(mean, tol, var=None, var_tol=0.08):
    mean = np.asarray(mean, dtype=np.float64)

    def check(x):
        m = np.asarray(x, dtype=np.float64).mean(axis=0)
        assert np.abs(m - mean).max() < tol, f"mean {m} vs {mean}"
        if var is not None:
            v = np.asarray(x, dtype=np.float64).var(axis=0)
            assert np.abs(v - var).max() / max(np.max(var), 1e-3) < var_tol

    return check


_N = 30_000

RNGS = {
    "normal": ((0.5, 1.3), _mean_check(0.5, 0.03, 1.69)),
    "lognormal": ((0.2, 0.5), _mean_check(np.exp(0.325), 0.03)),
    "cauchy": ((0.5, 2.0), lambda x: abs(np.median(x) - 0.5) < 0.05),
    "student_t": ((5.0, 1.0, 2.0), _mean_check(1.0, 0.06)),
    "double_exponential": ((0.5, 1.0), _mean_check(0.5, 0.04, 2.0)),
    "logistic": ((0.0, 1.0), _mean_check(0.0, 0.04, np.pi**2 / 3)),
    "gumbel": ((0.0, 1.0), _mean_check(0.5772, 0.04)),
    "exponential": ((2.0,), _mean_check(0.5, 0.02, 0.25)),
    "gamma": ((2.0, 1.5), _mean_check(4 / 3, 0.03)),
    "inv_gamma": ((3.0, 1.5), _mean_check(0.75, 0.02)),
    "chi_square": ((3.0,), _mean_check(3.0, 0.06)),
    "inv_chi_square": ((5.0,), _mean_check(1 / 3, 0.02)),
    "scaled_inv_chi_square": ((5.0, 1.5), _mean_check(3.75, 0.2)),
    "weibull": ((2.0, 1.5), _mean_check(1.5 * sp.gamma(1.5), 0.02)),
    "frechet": ((3.0, 1.0), _mean_check(sp.gamma(2 / 3), 0.03)),
    "rayleigh": ((1.5,), _mean_check(1.5 * np.sqrt(np.pi / 2), 0.02)),
    "pareto": ((0.5, 3.0), _mean_check(0.75, 0.02)),
    "pareto_type_2": ((0.0, 1.5, 3.0), _mean_check(0.75, 0.03)),
    "beta": ((2.0, 3.0), _mean_check(0.4, 0.01)),
    "beta_proportion": ((0.4, 5.0), _mean_check(0.4, 0.01)),
    "uniform": ((1.0, 3.0), _mean_check(2.0, 0.02, 4 / 12)),
    "von_mises": (
        (0.5, 2.0),
        lambda x: abs(float(np.angle(np.exp(1j * np.asarray(x)).mean())) - 0.5) < 0.03
        and np.all(np.abs(np.asarray(x)) <= np.pi + 1e-6),
    ),
    "skew_normal": ((0.0, 1.0, 4.0), _mean_check(np.sqrt(2 / np.pi) * 4 / np.sqrt(17), 0.02)),
    "exp_mod_normal": ((0.5, 1.2, 0.7), _mean_check(0.5 + 1 / 0.7, 0.05)),
    "bernoulli": ((0.3,), _mean_check(0.3, 0.01)),
    "bernoulli_logit": ((0.4,), _mean_check(sp.expit(0.4), 0.01)),
    "binomial": ((8, 0.3), _mean_check(2.4, 0.04)),
    "binomial_logit": ((8, -0.4), _mean_check(8 * sp.expit(-0.4), 0.05)),
    "beta_binomial": ((8, 2.0, 3.0), _mean_check(3.2, 0.06)),
    "poisson": ((2.5,), _mean_check(2.5, 0.04)),
    "poisson_log": ((0.9,), _mean_check(np.exp(0.9), 0.05)),
    "neg_binomial": ((3.0, 2.0), _mean_check(1.5, 0.04)),
    "neg_binomial_2": ((2.5, 3.0), _mean_check(2.5, 0.06)),
    "neg_binomial_2_log": ((0.9, 3.0), _mean_check(np.exp(0.9), 0.06)),
    "hypergeometric": ((5, 6, 8), _mean_check(30 / 14, 0.04)),
    "categorical": ((np.array([0.2, 0.3, 0.5]),), _mean_check(2.3, 0.03)),
    "categorical_logit": ((np.log(np.array([0.2, 0.3, 0.5])),), _mean_check(2.3, 0.03)),
    "ordered_logistic": (
        (0.3, np.array([-0.5, 0.8, 2.0])),
        lambda x: np.isin(np.asarray(x), [1, 2, 3, 4]).all(),
    ),
    "ordered_probit": (
        (0.3, np.array([-0.5, 0.8, 2.0])),
        lambda x: np.isin(np.asarray(x), [1, 2, 3, 4]).all(),
    ),
}
