"""Discrete distributions vs scipy + AD on continuous parameters."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import math_tpu.dists as d
from math_tpu.testing import expect_ad, expect_near_rel

YI = np.array([0, 2, 5])


CASES = [
    (d.bernoulli_lpmf, (np.array([0, 1, 1]), 0.3), lambda: st.bernoulli.logpmf(np.array([0, 1, 1]), 0.3)),
    (d.bernoulli_logit_lpmf, (np.array([0, 1, 1]), 0.4), lambda: st.bernoulli.logpmf(np.array([0, 1, 1]), 1 / (1 + np.exp(-0.4)))),
    (d.binomial_lpmf, (YI, 8, 0.3), lambda: st.binom.logpmf(YI, 8, 0.3)),
    (d.binomial_logit_lpmf, (YI, 8, -0.4), lambda: st.binom.logpmf(YI, 8, 1 / (1 + np.exp(0.4)))),
    (d.beta_binomial_lpmf, (YI, 8, 2.0, 3.0), lambda: st.betabinom.logpmf(YI, 8, 2.0, 3.0)),
    (d.poisson_lpmf, (YI, 2.5), lambda: st.poisson.logpmf(YI, 2.5)),
    (d.poisson_log_lpmf, (YI, 0.9), lambda: st.poisson.logpmf(YI, np.exp(0.9))),
    (d.neg_binomial_2_lpmf, (YI, 2.5, 3.0), lambda: st.nbinom.logpmf(YI, 3.0, 3.0 / (3.0 + 2.5))),
    (d.neg_binomial_2_log_lpmf, (YI, np.log(2.5), 3.0), lambda: st.nbinom.logpmf(YI, 3.0, 3.0 / (3.0 + 2.5))),
    (d.neg_binomial_lpmf, (YI, 3.0, 2.0), lambda: st.nbinom.logpmf(YI, 3.0, 2.0 / 3.0)),
    (d.hypergeometric_lpmf, (np.array([1, 2, 3]), 5, 6, 8), lambda: st.hypergeom.logpmf(np.array([1, 2, 3]), 14, 6, 5)),
]


@pytest.mark.parametrize("lpmf,args,ref", CASES, ids=[c[0].__name__ for c in CASES])
def test_lpmf_value(lpmf, args, ref):
    got = float(lpmf(*args))
    want = float(np.sum(ref()))
    expect_near_rel(got, want, 1e-8, lpmf.__name__)


GRAD_CASES = [
    (d.bernoulli_lpmf, (np.array([0, 1, 1]),), (0.3,)),
    (d.bernoulli_logit_lpmf, (np.array([0, 1, 1]),), (0.4,)),
    (d.binomial_lpmf, (YI, 8), (0.3,)),
    (d.beta_binomial_lpmf, (YI, 8), (2.0, 3.0)),
    (d.poisson_lpmf, (YI,), (2.5,)),
    (d.poisson_log_lpmf, (YI,), (0.9,)),
    (d.neg_binomial_2_lpmf, (YI,), (2.5, 3.0)),
    (d.neg_binomial_2_log_lpmf, (YI,), (0.9, 3.0)),
    (d.neg_binomial_lpmf, (YI,), (3.0, 2.0)),
]


@pytest.mark.parametrize(
    "lpmf,data,params", GRAD_CASES, ids=[c[0].__name__ for c in GRAD_CASES]
)
def test_lpmf_grad(lpmf, data, params):
    expect_ad(lambda *p: lpmf(*data, *p), *params, tol=2e-5)


def test_categorical():
    theta = np.array([0.2, 0.3, 0.5])
    y = np.array([1, 3, 2, 3])
    got = float(d.categorical_lpmf(y, theta))
    want = float(np.sum(np.log(theta[y - 1])))
    expect_near_rel(got, want, 1e-10)
    beta = np.log(theta)
    got2 = float(d.categorical_logit_lpmf(y, beta))
    expect_near_rel(got2, want, 1e-8)
    expect_ad(lambda b: d.categorical_logit_lpmf(y, b), beta)


def test_ordered_logistic():
    c = np.array([-0.5, 0.8, 2.0])
    eta = 0.3
    # brute-force probabilities
    import scipy.special as sp

    probs = np.diff(
        np.concatenate([[0.0], sp.expit(eta - c)[::-1].cumsum()[::-1] * 0 + (1 - sp.expit(c - eta)), [1.0]])
    )
    # direct: P(y=k) = sigmoid(eta - c_{k-1}) - sigmoid(eta - c_k)
    cc = np.concatenate([[-np.inf], c, [np.inf]])
    pk = sp.expit(eta - cc[:-1]) - sp.expit(eta - cc[1:])
    for k in range(1, 5):
        got = float(d.ordered_logistic_lpmf(k, eta, c))
        expect_near_rel(got, np.log(pk[k - 1]), 1e-8, f"k={k}")
    expect_ad(lambda e, cu: d.ordered_logistic_lpmf(2, e, cu), eta, c)
    expect_ad(lambda e, cu: d.ordered_logistic_lpmf(1, e, cu), eta, c)
    expect_ad(lambda e, cu: d.ordered_logistic_lpmf(4, e, cu), eta, c)


def test_ordered_probit():
    from scipy.stats import norm

    c = np.array([-0.5, 0.8, 2.0])
    eta = 0.3
    cc = np.concatenate([[-np.inf], c, [np.inf]])
    pk = norm.cdf(eta - cc[:-1]) - norm.cdf(eta - cc[1:])
    for k in range(1, 5):
        got = float(d.ordered_probit_lpmf(k, eta, c))
        expect_near_rel(got, np.log(pk[k - 1]), 1e-7, f"k={k}")
    expect_ad(lambda e, cu: d.ordered_probit_lpmf(3, e, cu), eta, c)


DCDF_CASES = [
    (d.bernoulli_cdf, (np.array([0, 1]), 0.3), lambda: st.bernoulli.cdf(np.array([0, 1]), 0.3)),
    (d.binomial_cdf, (YI, 8, 0.3), lambda: st.binom.cdf(YI, 8, 0.3)),
    (d.poisson_cdf, (YI, 2.5), lambda: st.poisson.cdf(YI, 2.5)),
    (d.neg_binomial_2_cdf, (YI, 2.5, 3.0), lambda: st.nbinom.cdf(YI, 3.0, 3.0 / 5.5)),
    (d.neg_binomial_cdf, (YI, 3.0, 2.0), lambda: st.nbinom.cdf(YI, 3.0, 2 / 3)),
]


@pytest.mark.parametrize("cdf,args,ref", DCDF_CASES, ids=[c[0].__name__ for c in DCDF_CASES])
def test_discrete_cdf(cdf, args, ref):
    got = float(cdf(*args))
    expect_near_rel(got, float(np.prod(ref())), 1e-7, cdf.__name__)


def test_invalid_and_off_support():
    assert float(d.bernoulli_lpmf(2, 0.3)) == -np.inf
    assert float(d.bernoulli_lpmf(1, 1.3)) == -np.inf
    assert float(d.binomial_lpmf(9, 8, 0.3)) == -np.inf
    assert float(d.poisson_lpmf(-1, 2.0)) == -np.inf
    assert float(d.poisson_lpmf(2, -1.0)) == -np.inf
    assert float(d.neg_binomial_2_lpmf(1, -2.5, 3.0)) == -np.inf


def test_discrete_rngs():
    key = jax.random.PRNGKey(0)
    n = 100_000
    x = np.asarray(d.bernoulli_rng(key, 0.3, (n,)))
    assert abs(x.mean() - 0.3) < 0.01
    x = np.asarray(d.binomial_rng(key, 8, 0.3, (n,)))
    assert abs(x.mean() - 2.4) < 0.03
    x = np.asarray(d.poisson_rng(key, 2.5, (n,)))
    assert abs(x.mean() - 2.5) < 0.04
    x = np.asarray(d.neg_binomial_2_rng(key, 2.5, 3.0, (n,)))
    assert abs(x.mean() - 2.5) < 0.05
    x = np.asarray(d.beta_binomial_rng(key, 8, 2.0, 3.0, (n,)))
    assert abs(x.mean() - 8 * 0.4) < 0.05
    x = np.asarray(d.ordered_logistic_rng(key, 0.3, np.array([-0.5, 0.8, 2.0]), (n,)))
    assert set(np.unique(x)) <= {1, 2, 3, 4}
    x = np.asarray(d.categorical_rng(key, np.array([0.2, 0.3, 0.5]), (n,)))
    assert abs((x == 3).mean() - 0.5) < 0.01
    x = np.asarray(d.hypergeometric_rng(key, 5, 6, 8, (n,)))
    assert abs(x.mean() - 5 * 6 / 14) < 0.02
