"""Continuous distributions: values vs scipy, AD vs finite diff, propto
consistency, cdf/ccdf complementarity, rng sanity.

Model: the reference's generated distribution tests (test/prob/, SURVEY.md
§4.3) — valid rows, invalid rows, propto drops constants, AD vs fd.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax.numpy as jnp

import math_tpu.dists as d
from math_tpu.testing import expect_ad, expect_near_rel

Y = np.array([0.7, 1.3, 2.9])


CASES = [
    # (lpdf, args, scipy logpdf)
    (d.normal_lpdf, (Y, 0.5, 1.3), lambda: st.norm.logpdf(Y, 0.5, 1.3)),
    (d.std_normal_lpdf, (Y,), lambda: st.norm.logpdf(Y)),
    (d.lognormal_lpdf, (Y, 0.2, 0.8), lambda: st.lognorm.logpdf(Y, 0.8, scale=np.exp(0.2))),
    (d.cauchy_lpdf, (Y, 0.5, 2.0), lambda: st.cauchy.logpdf(Y, 0.5, 2.0)),
    (d.student_t_lpdf, (Y, 4.0, 0.5, 2.0), lambda: st.t.logpdf(Y, 4.0, 0.5, 2.0)),
    (d.double_exponential_lpdf, (Y, 0.5, 2.0), lambda: st.laplace.logpdf(Y, 0.5, 2.0)),
    (d.logistic_lpdf, (Y, 0.5, 2.0), lambda: st.logistic.logpdf(Y, 0.5, 2.0)),
    (d.gumbel_lpdf, (Y, 0.5, 2.0), lambda: st.gumbel_r.logpdf(Y, 0.5, 2.0)),
    (d.exponential_lpdf, (Y, 1.7), lambda: st.expon.logpdf(Y, scale=1 / 1.7)),
    (d.gamma_lpdf, (Y, 2.0, 1.5), lambda: st.gamma.logpdf(Y, 2.0, scale=1 / 1.5)),
    (d.inv_gamma_lpdf, (Y, 2.0, 1.5), lambda: st.invgamma.logpdf(Y, 2.0, scale=1.5)),
    (d.chi_square_lpdf, (Y, 3.0), lambda: st.chi2.logpdf(Y, 3.0)),
    (d.weibull_lpdf, (Y, 2.0, 1.5), lambda: st.weibull_min.logpdf(Y, 2.0, scale=1.5)),
    (d.frechet_lpdf, (Y, 2.0, 1.5), lambda: st.invweibull.logpdf(Y, 2.0, scale=1.5)),
    (d.rayleigh_lpdf, (Y, 1.5), lambda: st.rayleigh.logpdf(Y, scale=1.5)),
    (d.pareto_lpdf, (Y, 0.5, 2.0), lambda: st.pareto.logpdf(Y, 2.0, scale=0.5)),
    (
        d.pareto_type_2_lpdf,
        (Y, 0.0, 1.5, 2.0),
        lambda: st.lomax.logpdf(Y, 2.0, scale=1.5),
    ),
    (
        d.beta_lpdf,
        (np.array([0.1, 0.5, 0.9]), 2.0, 3.0),
        lambda: st.beta.logpdf(np.array([0.1, 0.5, 0.9]), 2.0, 3.0),
    ),
    (
        d.uniform_lpdf,
        (Y, 0.0, 5.0),
        lambda: st.uniform.logpdf(Y, 0, 5),
    ),
    (
        d.von_mises_lpdf,
        (np.array([-1.0, 0.3, 2.0]), 0.5, 2.0),
        lambda: st.vonmises.logpdf(np.array([-1.0, 0.3, 2.0]), 2.0, loc=0.5),
    ),
    (
        d.skew_normal_lpdf,
        (Y, 0.5, 2.0, 3.0),
        lambda: st.skewnorm.logpdf(Y, 3.0, 0.5, 2.0),
    ),
    (
        d.exp_mod_normal_lpdf,
        (Y, 0.5, 1.2, 0.7),
        lambda: st.exponnorm.logpdf(Y, 1 / (0.7 * 1.2), 0.5, 1.2),
    ),
    (
        d.inv_chi_square_lpdf,
        (Y, 3.0),
        lambda: st.chi2.logpdf(1 / Y, 3.0) - 2 * np.log(Y),
    ),
    (
        d.scaled_inv_chi_square_lpdf,
        (Y, 3.0, 1.5),
        lambda: st.invgamma.logpdf(Y, 3.0 / 2, scale=3.0 * 1.5**2 / 2),
    ),
    (
        d.beta_proportion_lpdf,
        (np.array([0.1, 0.5, 0.9]), 0.4, 5.0),
        lambda: st.beta.logpdf(np.array([0.1, 0.5, 0.9]), 0.4 * 5.0, 0.6 * 5.0),
    ),
]


@pytest.mark.parametrize("lpdf,args,ref", CASES, ids=[c[0].__name__ for c in CASES])
def test_lpdf_value(lpdf, args, ref):
    got = float(lpdf(*args))
    want = float(np.sum(ref()))
    expect_near_rel(got, want, 1e-8, lpdf.__name__)


@pytest.mark.parametrize("lpdf,args,ref", CASES, ids=[c[0].__name__ for c in CASES])
def test_lpdf_grad(lpdf, args, ref):
    expect_ad(lambda *a: lpdf(*a), *args, tol=2e-5)


@pytest.mark.parametrize("lpdf,args,ref", CASES, ids=[c[0].__name__ for c in CASES])
def test_propto_differs_by_constant(lpdf, args, ref):
    """propto=True must differ from propto=False by a y-independent shift
    when parameters are traced (gradient parity)."""
    import jax

    def g_full(*params):
        return lpdf(args[0], *params)

    def g_propto(*params):
        return lpdf(args[0], *params, propto=True)

    params = tuple(jnp.asarray(p * 1.0) for p in args[1:])
    if not params:
        return
    gf = jax.grad(lambda ps: g_full(*ps))(params)
    gp = jax.grad(lambda ps: g_propto(*ps))(params)
    for a, b in zip(gf, gp):
        expect_near_rel(np.asarray(a), np.asarray(b), 1e-9, "propto grad parity")


def test_normal_invalid_sigma():
    assert float(d.normal_lpdf(1.0, 0.0, -1.0)) == -np.inf
    assert float(d.normal_lpdf(np.array([1.0, 2.0]), 0.0, np.array([1.0, -1.0]))) == -np.inf


def test_off_support():
    assert float(d.lognormal_lpdf(-1.0, 0.0, 1.0)) == -np.inf
    assert float(d.gamma_lpdf(-1.0, 2.0, 2.0)) == -np.inf
    assert float(d.beta_lpdf(1.5, 2.0, 2.0)) == -np.inf
    assert float(d.pareto_lpdf(0.3, 0.5, 2.0)) == -np.inf
    assert float(d.uniform_lpdf(7.0, 0.0, 5.0)) == -np.inf


CDF_CASES = [
    (d.normal_cdf, d.normal_lcdf, d.normal_lccdf, (Y, 0.5, 1.3), lambda: st.norm.cdf(Y, 0.5, 1.3)),
    (d.lognormal_cdf, d.lognormal_lcdf, d.lognormal_lccdf, (Y, 0.2, 0.8), lambda: st.lognorm.cdf(Y, 0.8, scale=np.exp(0.2))),
    (d.cauchy_cdf, d.cauchy_lcdf, d.cauchy_lccdf, (Y, 0.5, 2.0), lambda: st.cauchy.cdf(Y, 0.5, 2.0)),
    (d.student_t_cdf, d.student_t_lcdf, d.student_t_lccdf, (Y, 4.0, 0.5, 2.0), lambda: st.t.cdf(Y, 4.0, 0.5, 2.0)),
    (d.double_exponential_cdf, d.double_exponential_lcdf, d.double_exponential_lccdf, (Y, 0.5, 2.0), lambda: st.laplace.cdf(Y, 0.5, 2.0)),
    (d.logistic_cdf, d.logistic_lcdf, d.logistic_lccdf, (Y, 0.5, 2.0), lambda: st.logistic.cdf(Y, 0.5, 2.0)),
    (d.gumbel_cdf, d.gumbel_lcdf, d.gumbel_lccdf, (Y, 0.5, 2.0), lambda: st.gumbel_r.cdf(Y, 0.5, 2.0)),
    (d.exponential_cdf, d.exponential_lcdf, d.exponential_lccdf, (Y, 1.7), lambda: st.expon.cdf(Y, scale=1 / 1.7)),
    (d.gamma_cdf, d.gamma_lcdf, d.gamma_lccdf, (Y, 2.0, 1.5), lambda: st.gamma.cdf(Y, 2.0, scale=1 / 1.5)),
    (d.inv_gamma_cdf, d.inv_gamma_lcdf, d.inv_gamma_lccdf, (Y, 2.0, 1.5), lambda: st.invgamma.cdf(Y, 2.0, scale=1.5)),
    (d.chi_square_cdf, d.chi_square_lcdf, d.chi_square_lccdf, (Y, 3.0), lambda: st.chi2.cdf(Y, 3.0)),
    (d.weibull_cdf, d.weibull_lcdf, d.weibull_lccdf, (Y, 2.0, 1.5), lambda: st.weibull_min.cdf(Y, 2.0, scale=1.5)),
    (d.frechet_cdf, d.frechet_lcdf, d.frechet_lccdf, (Y, 2.0, 1.5), lambda: st.invweibull.cdf(Y, 2.0, scale=1.5)),
    (d.rayleigh_cdf, d.rayleigh_lcdf, d.rayleigh_lccdf, (Y, 1.5), lambda: st.rayleigh.cdf(Y, scale=1.5)),
    (d.pareto_cdf, d.pareto_lcdf, d.pareto_lccdf, (Y, 0.5, 2.0), lambda: st.pareto.cdf(Y, 2.0, scale=0.5)),
    (d.pareto_type_2_cdf, d.pareto_type_2_lcdf, d.pareto_type_2_lccdf, (Y, 0.0, 1.5, 2.0), lambda: st.lomax.cdf(Y, 2.0, scale=1.5)),
    (d.beta_cdf, d.beta_lcdf, d.beta_lccdf, (np.array([0.1, 0.5, 0.9]), 2.0, 3.0), lambda: st.beta.cdf(np.array([0.1, 0.5, 0.9]), 2.0, 3.0)),
    (d.uniform_cdf, d.uniform_lcdf, d.uniform_lccdf, (Y, 0.0, 5.0), lambda: st.uniform.cdf(Y, 0, 5)),
    (d.skew_normal_cdf, d.skew_normal_lcdf, d.skew_normal_lccdf, (Y, 0.5, 2.0, 3.0), lambda: st.skewnorm.cdf(Y, 3.0, 0.5, 2.0)),
    (d.exp_mod_normal_cdf, d.exp_mod_normal_lcdf, d.exp_mod_normal_lccdf, (Y, 0.5, 1.2, 0.7), lambda: st.exponnorm.cdf(Y, 1 / (0.7 * 1.2), 0.5, 1.2)),
]


@pytest.mark.parametrize(
    "cdf,lcdf,lccdf,args,ref", CDF_CASES, ids=[c[0].__name__ for c in CDF_CASES]
)
def test_cdf_families(cdf, lcdf, lccdf, args, ref):
    want = ref()
    got_prod = float(cdf(*args))
    expect_near_rel(got_prod, float(np.prod(want)), 1e-7, "cdf product")
    got_lcdf = float(lcdf(*args))
    expect_near_rel(got_lcdf, float(np.sum(np.log(want))), 1e-6, "lcdf")
    got_lccdf = float(lccdf(*args))
    expect_near_rel(got_lccdf, float(np.sum(np.log1p(-want))), 5e-6, "lccdf")


RNG_CASES = [
    (d.normal_rng, (0.5, 1.3), 0.5, 1.3**2),
    (d.lognormal_rng, (0.2, 0.5), np.exp(0.2 + 0.125), None),
    (d.exponential_rng, (2.0,), 0.5, 0.25),
    (d.gamma_rng, (2.0, 1.5), 2 / 1.5, 2 / 1.5**2),
    (d.weibull_rng, (2.0, 1.5), 1.5 * 0.8862, None),
    (d.rayleigh_rng, (1.5,), 1.5 * np.sqrt(np.pi / 2), None),
    (d.beta_rng, (2.0, 3.0), 0.4, None),
    (d.uniform_rng, (1.0, 3.0), 2.0, 4 / 12),
    (d.double_exponential_rng, (0.5, 1.0), 0.5, 2.0),
    (d.gumbel_rng, (0.0, 1.0), 0.5772, None),
    (d.logistic_rng, (0.0, 1.0), 0.0, np.pi**2 / 3),
    (d.skew_normal_rng, (0.0, 1.0, 4.0), np.sqrt(2 / np.pi) * 4 / np.sqrt(17), None),
    (d.student_t_rng, (5.0, 1.0, 2.0), 1.0, None),
    (d.frechet_rng, (3.0, 1.0), 1.3541, None),
]


@pytest.mark.parametrize("rng,args,mean,var", RNG_CASES, ids=[c[0].__name__ for c in RNG_CASES])
def test_rng_moments(rng, args, mean, var):
    import jax

    key = jax.random.PRNGKey(0)
    x = np.asarray(rng(key, *args, shape=(200_000,)))
    se = max(abs(mean), 1.0) / np.sqrt(len(x)) * 6 + 0.01
    assert abs(x.mean() - mean) < se * 3, f"mean {x.mean()} vs {mean}"
    if var is not None:
        assert abs(x.var() - var) / max(var, 1) < 0.05


def test_von_mises_rng_moments():
    import jax

    key = jax.random.PRNGKey(1)
    x = np.asarray(d.von_mises_rng(key, 0.5, 2.0, shape=(100_000,)))
    assert np.all(np.abs(x) <= np.pi + 1e-6)
    # circular mean
    ang = np.angle(np.exp(1j * x).mean())
    assert abs(ang - 0.5) < 0.02
