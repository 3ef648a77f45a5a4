"""Fused GLM likelihoods: parity with the unfused compositions.

The reference's GLM tests check the fused kernels against the scalar
distribution path (test/unit/math/prim/mat/prob/*_glm_*_test.cpp); we do the
same: glm(y, x, alpha, beta) == base(y, x@beta + alpha).
"""

import numpy as np

import jax
import jax.numpy as jnp

import math_tpu.dists as d
from math_tpu.testing import expect_ad, expect_near_rel

RNG = np.random.default_rng(0)
N, K = 40, 3
X = RNG.normal(size=(N, K))
BETA = RNG.normal(size=K) * 0.5
ALPHA = 0.3
ETA = X @ BETA + ALPHA


def test_bernoulli_logit_glm():
    y = (RNG.uniform(size=N) < 1 / (1 + np.exp(-ETA))).astype(int)
    got = float(d.bernoulli_logit_glm_lpmf(y, X, ALPHA, BETA))
    want = float(d.bernoulli_logit_lpmf(y, ETA))
    expect_near_rel(got, want, 1e-9)
    expect_ad(lambda a, b: d.bernoulli_logit_glm_lpmf(y, X, a, b), ALPHA, BETA)


def test_poisson_log_glm():
    y = RNG.poisson(np.exp(ETA))
    got = float(d.poisson_log_glm_lpmf(y, X, ALPHA, BETA))
    want = float(d.poisson_log_lpmf(y, ETA))
    expect_near_rel(got, want, 1e-9)
    expect_ad(lambda a, b: d.poisson_log_glm_lpmf(y, X, a, b), ALPHA, BETA)


def test_neg_binomial_2_log_glm():
    y = RNG.poisson(np.exp(ETA))
    phi = 3.0
    got = float(d.neg_binomial_2_log_glm_lpmf(y, X, ALPHA, BETA, phi))
    want = float(d.neg_binomial_2_log_lpmf(y, ETA, phi))
    expect_near_rel(got, want, 1e-9)
    expect_ad(
        lambda a, b, p: d.neg_binomial_2_log_glm_lpmf(y, X, a, b, p),
        ALPHA,
        BETA,
        phi,
    )


def test_normal_id_glm():
    y = ETA + RNG.normal(size=N)
    sigma = 1.3
    got = float(d.normal_id_glm_lpdf(y, X, ALPHA, BETA, sigma))
    want = float(d.normal_lpdf(y, ETA, sigma))
    expect_near_rel(got, want, 1e-9)
    expect_ad(
        lambda a, b, s: d.normal_id_glm_lpdf(y, X, a, b, s), ALPHA, BETA, sigma
    )


def test_ordered_logistic_glm():
    cuts = np.array([-1.0, 0.5, 2.0])
    eta0 = X @ BETA
    y = np.asarray(
        d.ordered_logistic_rng(jax.random.PRNGKey(0), jnp.asarray(eta0), cuts)
    )
    got = float(d.ordered_logistic_glm_lpmf(y, X, BETA, cuts))
    want = float(d.ordered_logistic_lpmf(y, eta0, cuts))
    expect_near_rel(got, want, 1e-8)
    expect_ad(lambda b, c: d.ordered_logistic_glm_lpmf(y, X, b, c), BETA, cuts)


def test_categorical_logit_glm():
    C = 4
    beta = RNG.normal(size=(K, C))
    alpha = RNG.normal(size=C)
    eta = X @ beta + alpha
    y = np.asarray(
        jax.random.categorical(jax.random.PRNGKey(1), jnp.asarray(eta), axis=-1) + 1
    )
    got = float(d.categorical_logit_glm_lpmf(y, X, alpha, beta))
    want = sum(
        float(d.categorical_logit_lpmf(int(y[i]), eta[i])) for i in range(N)
    )
    expect_near_rel(got, want, 1e-8)
    expect_ad(
        lambda a, b: d.categorical_logit_glm_lpmf(y, X, a, b), alpha, beta
    )
