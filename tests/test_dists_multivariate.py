"""Multivariate distributions vs scipy + AD checks."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import math_tpu.dists as d
from math_tpu.testing import expect_ad, expect_near_rel


RNG = np.random.default_rng(0)
K = 3
A = RNG.normal(size=(K, K))
SIGMA = A @ A.T + K * np.eye(K)
MU = np.array([0.5, -1.0, 2.0])
YV = np.array([0.3, -0.2, 1.5])
YB = RNG.normal(size=(5, K)) + MU


def test_multi_normal():
    got = float(d.multi_normal_lpdf(YV, MU, SIGMA))
    want = float(st.multivariate_normal.logpdf(YV, MU, SIGMA))
    expect_near_rel(got, want, 1e-9)
    # batch of rows sums
    got_b = float(d.multi_normal_lpdf(YB, MU, SIGMA))
    want_b = float(np.sum(st.multivariate_normal.logpdf(YB, MU, SIGMA)))
    expect_near_rel(got_b, want_b, 1e-9)


def test_multi_normal_cholesky():
    L = np.linalg.cholesky(SIGMA)
    got = float(d.multi_normal_cholesky_lpdf(YV, MU, L))
    want = float(st.multivariate_normal.logpdf(YV, MU, SIGMA))
    expect_near_rel(got, want, 1e-9)
    expect_ad(lambda y, m: d.multi_normal_cholesky_lpdf(y, m, L), YV, MU)

    def f_l(lflat):
        Lm = jnp.zeros((K, K)).at[np.tril_indices(K)].set(lflat)
        return d.multi_normal_cholesky_lpdf(YV, MU, Lm)

    expect_ad(f_l, L[np.tril_indices(K)])


def test_multi_normal_prec():
    om = np.linalg.inv(SIGMA)
    got = float(d.multi_normal_prec_lpdf(YV, MU, om))
    want = float(st.multivariate_normal.logpdf(YV, MU, SIGMA))
    expect_near_rel(got, want, 1e-8)


def test_multi_student_t():
    nu = 5.0
    got = float(d.multi_student_t_lpdf(YV, nu, MU, SIGMA))
    want = float(st.multivariate_t.logpdf(YV, MU, SIGMA, df=nu))
    expect_near_rel(got, want, 1e-9)
    expect_ad(lambda y, n, m: d.multi_student_t_lpdf(y, n, m, SIGMA), YV, nu, MU)


def test_dirichlet():
    al = np.array([1.5, 2.0, 3.0])
    th = np.array([0.2, 0.3, 0.5])
    got = float(d.dirichlet_lpdf(th, al))
    want = float(st.dirichlet.logpdf(th, al))
    expect_near_rel(got, want, 1e-9)
    expect_ad(lambda a: d.dirichlet_lpdf(th, a), al)


def test_multinomial():
    th = np.array([0.2, 0.3, 0.5])
    y = np.array([2, 3, 5])
    got = float(d.multinomial_lpmf(y, th))
    want = float(st.multinomial.logpmf(y, 10, th))
    expect_near_rel(got, want, 1e-9)
    # renormalize: FD probes leave the simplex, which the value-level
    # check_simplex mask now (correctly) sends to -inf
    expect_ad(lambda t: d.multinomial_lpmf(y, t / jnp.sum(t)), th)


def test_wishart():
    nu = 7.0
    W = wishart_sample = SIGMA * 1.2 + 0.5 * np.eye(K)
    got = float(d.wishart_lpdf(W, nu, SIGMA))
    want = float(st.wishart.logpdf(W, nu, SIGMA))
    expect_near_rel(got, want, 1e-8)


def test_inv_wishart():
    nu = 7.0
    W = SIGMA * 0.8 + 0.3 * np.eye(K)
    got = float(d.inv_wishart_lpdf(W, nu, SIGMA))
    want = float(st.invwishart.logpdf(W, nu, SIGMA))
    expect_near_rel(got, want, 1e-8)


def test_lkj_corr_cholesky_integrates():
    """eta=1 density over cholesky factors must integrate to ~1 (MC check),
    and lpdf must match lkj_corr through the Jacobian."""
    # direct value check vs lkj_corr: p_chol(L) = p_corr(LL^T) * |J|,
    # |J| = prod L_kk^{K-k}  (k 1-indexed row), here verify internal
    # consistency: lkj_corr_cholesky(L) - lkj_corr(LL^T) = sum (K-k) log L_kk
    eta = 1.7
    key = jax.random.PRNGKey(0)
    L = d.lkj_corr_cholesky_rng(key, K, eta)
    La = np.asarray(L)
    y = La @ La.T
    lhs = float(d.lkj_corr_cholesky_lpdf(L, eta))
    rhs = float(d.lkj_corr_lpdf(y, eta))
    jac = sum((K - kk - 1) * np.log(La[kk, kk]) for kk in range(K))
    # p_chol = p_corr * prod L_kk^{K-k}; K-k with k 1-indexed = K-kk-1+...
    expect_near_rel(lhs - rhs, jac, 1e-6, "chol vs corr jacobian")


def test_lkj_corr_cholesky_rng_moments():
    key = jax.random.PRNGKey(1)
    Ls = d.lkj_corr_cholesky_rng(key, 3, 2.0, shape=(4000,))
    Ys = np.asarray(Ls @ jnp.swapaxes(Ls, -1, -2))
    # marginal of off-diagonal r ~ Beta-shifted, mean 0
    r = Ys[:, 1, 0]
    assert abs(r.mean()) < 0.03
    # E[r^2] = 1/(2*eta + K - 1)? for K=3, eta=2: var = 1/(2*2+3-1)?
    # LKJ: r marginal ~ Beta(eta + (K-2)/2, eta + (K-2)/2) on [-1,1]
    a = 2.0 + 0.5
    var_expected = 1.0 / (2 * a + 1)
    assert abs(r.var() - var_expected) < 0.02


def test_mvn_rngs():
    key = jax.random.PRNGKey(2)
    x = np.asarray(d.multi_normal_rng(key, MU, SIGMA, shape=(50_000,)))
    assert np.abs(x.mean(0) - MU).max() < 0.05
    assert np.abs(np.cov(x.T) - SIGMA).max() < 0.15
    L = np.linalg.cholesky(SIGMA)
    x = np.asarray(d.multi_normal_cholesky_rng(key, MU, L, shape=(50_000,)))
    assert np.abs(np.cov(x.T) - SIGMA).max() < 0.15
    x = np.asarray(d.multi_normal_prec_rng(key, MU, np.linalg.inv(SIGMA), shape=(50_000,)))
    assert np.abs(np.cov(x.T) - SIGMA).max() < 0.15


def test_wishart_rng_mean():
    key = jax.random.PRNGKey(3)
    nu = 7.0
    W = np.asarray(d.wishart_rng(key, nu, SIGMA, shape=(20_000,)))
    expect_near_rel(W.mean(0), nu * SIGMA, 0.15, "wishart mean")


def test_dirichlet_multinomial_rng():
    key = jax.random.PRNGKey(4)
    al = np.array([1.5, 2.0, 3.0])
    x = np.asarray(d.dirichlet_rng(key, al, shape=(50_000,)))
    expect_near_rel(x.mean(0), al / al.sum(), 0.02, "dirichlet mean")
    th = np.array([0.2, 0.3, 0.5])
    y = np.asarray(d.multinomial_rng(key, th, 10, shape=(50_000,)))
    assert (y.sum(-1) == 10).all()
    expect_near_rel(y.mean(0), 10 * th, 0.02, "multinomial mean")
