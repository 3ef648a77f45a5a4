"""Parity tests for the long-tail families (wiener, DLM, multi_gp, ...)."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import math_tpu.dists as d
from math_tpu.testing import expect_ad, expect_near_rel


def _wiener_pdf_numeric(t, a, tau, b, v, terms=200):
    """Oracle: small-time Navarro-Fuss series with many terms, f64."""
    x = (t - tau) / a**2
    w = 1.0 - b
    s = 0.0
    for k in range(-terms, terms + 1):
        s += (w + 2 * k) * np.exp(-((w + 2 * k) ** 2) / (2 * x))
    f = s / np.sqrt(2 * np.pi * x**3)
    return (1 / a**2) * f * np.exp(v * a * w - v**2 * x * a**2 / 2)


def test_wiener_matches_series_oracle():
    for t, a, tau, b, v in [
        (0.8, 1.5, 0.3, 0.5, 0.5),
        (1.2, 2.0, 0.2, 0.4, -0.8),
        (2.5, 1.0, 0.1, 0.6, 1.0),
        (0.45, 1.2, 0.4, 0.3, 0.0),
    ]:
        got = float(d.wiener_lpdf(t, a, tau, b, v))
        want = float(np.log(_wiener_pdf_numeric(t, a, tau, b, v)))
        expect_near_rel(got, want, 1e-6, f"wiener({t},{a},{tau},{b},{v})")


def test_wiener_grads_and_guards():
    expect_ad(lambda a, tau, b, v: d.wiener_lpdf(0.9, a, tau, b, v),
              1.5, 0.3, 0.5, 0.5, tol=1e-4)
    assert float(d.wiener_lpdf(0.2, 1.5, 0.3, 0.5, 0.5)) == -np.inf  # y < tau
    assert float(d.wiener_lpdf(0.9, -1.0, 0.3, 0.5, 0.5)) == -np.inf


def test_gaussian_dlm_obs_local_level():
    """1-D local-level model: compare against a dense MVN formulation."""
    rng = np.random.default_rng(0)
    T = 12
    F = np.array([[1.0]])
    G = np.array([[1.0]])
    V = np.array([[0.5]])
    W = np.array([[0.2]])
    m0 = np.array([0.0])
    C0 = np.array([[1.0]])
    y = rng.normal(size=(1, T))

    got = float(d.gaussian_dlm_obs_lpdf(y, F, G, V, W, m0, C0))

    # dense covariance of y: theta_t = theta_0 + sum w; cov(theta_s,theta_t)
    # = C0 + W*min(s,t); y adds V on the diagonal
    s_idx = np.arange(1, T + 1)
    cov = C0[0, 0] + W[0, 0] * np.minimum.outer(s_idx, s_idx)
    cov = cov + V[0, 0] * np.eye(T)
    want = float(st.multivariate_normal.logpdf(y[0], np.zeros(T), cov))
    expect_near_rel(got, want, 1e-8, "dlm local level")


def test_gaussian_dlm_obs_multivariate_and_grad():
    rng = np.random.default_rng(1)
    n, r, T = 3, 2, 8
    F = rng.normal(size=(n, r))
    G = 0.8 * np.eye(n) + 0.05 * rng.normal(size=(n, n))
    V = np.eye(r) * 0.4
    W = np.eye(n) * 0.3
    m0 = np.zeros(n)
    C0 = np.eye(n)
    y = np.asarray(
        d.gaussian_dlm_obs_rng(jax.random.PRNGKey(0), F, G, V, W, m0, C0, T)
    )
    assert y.shape == (r, T)
    lp = float(d.gaussian_dlm_obs_lpdf(y, F, G, V, W, m0, C0))
    assert np.isfinite(lp)
    # diagonal-V overload agrees with matrix V
    lp_diag = float(d.gaussian_dlm_obs_lpdf(y, F, G, np.diag(V), W, m0, C0))
    expect_near_rel(lp_diag, lp, 1e-10, "diag V overload")
    expect_ad(
        lambda g: d.gaussian_dlm_obs_lpdf(y, F, g, V, W, m0, C0),
        G,
        tol=1e-4,
    )


def test_multi_gp():
    rng = np.random.default_rng(2)
    n, k = 5, 3
    A = rng.normal(size=(n, n))
    sigma = A @ A.T + n * np.eye(n)
    w = np.array([0.5, 1.0, 2.0])
    y = rng.normal(size=(k, n))
    got = float(d.multi_gp_lpdf(y, sigma, w))
    want = sum(
        float(st.multivariate_normal.logpdf(y[i], np.zeros(n), sigma / w[i]))
        for i in range(k)
    )
    expect_near_rel(got, want, 1e-9, "multi_gp")
    L = np.linalg.cholesky(sigma)
    got_c = float(d.multi_gp_cholesky_lpdf(y, L, w))
    expect_near_rel(got_c, want, 1e-9, "multi_gp_cholesky")
    expect_ad(lambda w_: d.multi_gp_lpdf(y, sigma, w_), w, tol=1e-5)


def test_matrix_normal_prec():
    rng = np.random.default_rng(3)
    n, p = 3, 2
    A = rng.normal(size=(n, n))
    sigma_prec = A @ A.T + n * np.eye(n)
    B = rng.normal(size=(p, p))
    d_prec = B @ B.T + p * np.eye(p)
    y = rng.normal(size=(n, p))
    mu = rng.normal(size=(n, p))
    got = float(d.matrix_normal_prec_lpdf(y, mu, sigma_prec, d_prec))
    # MN(Mu, Sigma^-1, D^-1): vec(y) ~ N(vec(mu), D^-1 (x) Sigma^-1)
    cov = np.kron(np.linalg.inv(d_prec), np.linalg.inv(sigma_prec))
    want = float(
        st.multivariate_normal.logpdf(y.T.ravel(), mu.T.ravel(), cov)
    )
    expect_near_rel(got, want, 1e-8, "matrix_normal_prec")
    # rng mean/shape
    ys = np.asarray(
        d.matrix_normal_prec_rng(
            jax.random.PRNGKey(1), mu, sigma_prec, d_prec, shape=(20000,)
        )
    )
    assert ys.shape == (20000, n, p)
    assert np.abs(ys.mean(0) - mu).max() < 0.05
    vecs = ys.transpose(0, 2, 1).reshape(20000, n * p)  # column-major vec
    got_cov = np.cov(vecs.T)
    np.testing.assert_allclose(got_cov, cov, atol=0.05)


def test_lkj_cov():
    rng = np.random.default_rng(4)
    sds = np.array([1.2, 0.8, 2.0])
    corr = np.eye(3)
    corr[0, 1] = corr[1, 0] = 0.3
    corr[1, 2] = corr[2, 1] = -0.2
    y = np.diag(sds) @ corr @ np.diag(sds)
    got = float(d.lkj_cov_lpdf(y, 0.0, 1.0, 2.0))
    want = float(
        np.sum(st.lognorm.logpdf(sds, 1.0, scale=1.0))
    ) + float(d.lkj_corr_lpdf(corr, 2.0))
    expect_near_rel(got, want, 1e-8, "lkj_cov")


def test_beta_binomial_cdf():
    y = np.array([0, 2, 5])
    got = float(d.beta_binomial_cdf(y, 8, 2.0, 3.0))
    want = float(np.prod(st.betabinom.cdf(y, 8, 2.0, 3.0)))
    expect_near_rel(got, want, 1e-8)
    got_l = float(d.beta_binomial_lcdf(y, 8, 2.0, 3.0))
    expect_near_rel(got_l, float(np.sum(st.betabinom.logcdf(y, 8, 2.0, 3.0))), 1e-7)
    got_cc = float(d.beta_binomial_lccdf(y, 8, 2.0, 3.0))
    expect_near_rel(
        got_cc, float(np.sum(np.log1p(-st.betabinom.cdf(y, 8, 2.0, 3.0)))), 1e-7
    )


def test_neg_binomial_lcdf_lccdf():
    y = np.array([0, 2, 5])
    want = st.nbinom.cdf(y, 3.0, 2 / 3)
    expect_near_rel(
        float(d.neg_binomial_lcdf(y, 3.0, 2.0)), float(np.sum(np.log(want))), 1e-7
    )
    expect_near_rel(
        float(d.neg_binomial_lccdf(y, 3.0, 2.0)),
        float(np.sum(np.log1p(-want))),
        1e-7,
    )


def test_bernoulli_logit_glm_rng():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50_000, 3))
    beta = np.array([0.5, -1.0, 0.2])
    ys = np.asarray(
        d.bernoulli_logit_glm_rng(jax.random.PRNGKey(2), X, 0.3, beta)
    )
    p_emp = ys.mean()
    p_true = (1 / (1 + np.exp(-(X @ beta + 0.3)))).mean()
    assert abs(p_emp - p_true) < 0.01
