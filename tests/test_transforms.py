"""Transforms: round-trips, Jacobian parity via AD, structural validity.

The log|det J| accumulation formulas are checked against brute-force
``slogdet(jacobian(constrain))`` — the same ground truth the reference's
transform unit tests use implicitly via AD (test/unit/math/rev/mat/fun/
*_constrain_test.cpp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import math_tpu.transforms as t
from math_tpu.testing import expect_ad, expect_near_rel


def brute_logdet(fn, x, proj=None):
    """log|det d fn(x) / dx| with optional projection to free coordinates."""
    J = jax.jacfwd(fn)(jnp.asarray(x))
    J = np.asarray(J).reshape(-1, np.size(x))
    if proj is not None:
        J = J[proj]
    sign, ld = np.linalg.slogdet(J)
    return ld


# --- scalar transforms ------------------------------------------------------


@pytest.mark.parametrize(
    "clp,free,args",
    [
        (t.lb_constrain_lp, t.lb_free, (1.5,)),
        (t.ub_constrain_lp, t.ub_free, (2.5,)),
        (t.positive_constrain_lp, t.positive_free, ()),
        (t.prob_constrain_lp, t.prob_free, ()),
        (t.corr_constrain_lp, t.corr_free, ()),
    ],
)
def test_scalar_roundtrip_and_jacobian(clp, free, args):
    x = 0.37
    y, lp = clp(x, *args)
    x2 = free(y, *args)
    expect_near_rel(float(x2), x, 1e-10, "roundtrip")
    ld = brute_logdet(lambda u: clp(u, *args)[0], x)
    expect_near_rel(float(lp), ld, 1e-8, "logdet")


def test_lub():
    x = -0.8
    y, lp = t.lub_constrain_lp(x, -2.0, 5.0)
    assert -2.0 < float(y) < 5.0
    expect_near_rel(float(t.lub_free(y, -2.0, 5.0)), x, 1e-10)
    ld = brute_logdet(lambda u: t.lub_constrain_lp(u, -2.0, 5.0)[0], x)
    expect_near_rel(float(lp), ld, 1e-9)


def test_offset_multiplier():
    x = np.array([0.3, -1.2])
    y, lp = t.offset_multiplier_constrain_lp(x, 1.0, 2.5)
    expect_near_rel(np.asarray(t.offset_multiplier_free(y, 1.0, 2.5)), x, 1e-12)
    expect_near_rel(float(lp), 2 * np.log(2.5), 1e-12)


# --- vector transforms ------------------------------------------------------


def test_ordered():
    x = np.array([0.3, -0.5, 1.2, 0.0])
    y, lp = t.ordered_constrain_lp(x)
    assert (np.diff(np.asarray(y)) > 0).all()
    expect_near_rel(np.asarray(t.ordered_free(y)), x, 1e-10)
    ld = brute_logdet(lambda u: t.ordered_constrain(u), x)
    expect_near_rel(float(lp), ld, 1e-8)


def test_positive_ordered():
    x = np.array([-0.3, 0.5, -1.2])
    y, lp = t.positive_ordered_constrain_lp(x)
    ya = np.asarray(y)
    assert (ya > 0).all() and (np.diff(ya) > 0).all()
    expect_near_rel(np.asarray(t.positive_ordered_free(y)), x, 1e-10)
    ld = brute_logdet(t.positive_ordered_constrain, x)
    expect_near_rel(float(lp), ld, 1e-8)


def test_simplex():
    x = np.array([0.2, -0.9, 1.1])
    y, lp = t.simplex_constrain_lp(x)
    ya = np.asarray(y)
    assert ya.shape == (4,)
    assert abs(ya.sum() - 1) < 1e-12 and (ya > 0).all()
    expect_near_rel(np.asarray(t.simplex_free(y)), x, 1e-9, "simplex roundtrip")
    # Jacobian of the K-1 independent coordinates
    ld = brute_logdet(lambda u: t.simplex_constrain(u)[:-1], x)
    expect_near_rel(float(lp), ld, 1e-8, "simplex logdet")


def test_unit_vector():
    x = np.array([0.3, -1.0, 0.8])
    y, lp = t.unit_vector_constrain_lp(x)
    expect_near_rel(float(jnp.sum(jnp.square(y))), 1.0, 1e-12)
    expect_near_rel(float(lp), -0.5 * float(np.sum(x**2)), 1e-12)


# --- matrix transforms ------------------------------------------------------


def test_cholesky_corr():
    K = 4
    n = K * (K - 1) // 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=n) * 0.7
    L, lp = t.cholesky_corr_constrain_lp(x, K)
    La = np.asarray(L)
    # rows have unit norm; lower triangular
    expect_near_rel(np.sum(La**2, axis=1), np.ones(K), 1e-12, "unit rows")
    assert np.allclose(La, np.tril(La))
    expect_near_rel(np.asarray(t.cholesky_corr_free(L, K)), x, 1e-9, "roundtrip")
    # brute-force logdet over the free coordinates (strict lower triangle)
    rows, cols = np.tril_indices(K, -1)
    flatidx = rows * K + cols
    ld = brute_logdet(lambda u: t.cholesky_corr_constrain(u, K).reshape(-1), x, flatidx)
    expect_near_rel(float(lp), ld, 1e-8, "logdet")


def test_corr_matrix():
    K = 4
    n = K * (K - 1) // 2
    rng = np.random.default_rng(1)
    x = rng.normal(size=n) * 0.5
    y, lp = t.corr_matrix_constrain_lp(x, K)
    ya = np.asarray(y)
    expect_near_rel(np.diag(ya), np.ones(K), 1e-12, "unit diag")
    assert np.allclose(ya, ya.T)
    assert (np.linalg.eigvalsh(ya) > 0).all()
    expect_near_rel(np.asarray(t.corr_matrix_free(y, K)), x, 1e-8, "roundtrip")
    # logdet over the strictly-lower free coordinates of the output
    rows, cols = np.tril_indices(K, -1)
    flatidx = rows * K + cols
    ld = brute_logdet(lambda u: t.corr_matrix_constrain(u, K).reshape(-1), x, flatidx)
    expect_near_rel(float(lp), ld, 1e-7, "logdet")


def test_cov_matrix():
    K = 3
    n = K * (K + 1) // 2
    rng = np.random.default_rng(2)
    x = rng.normal(size=n) * 0.6
    y, lp = t.cov_matrix_constrain_lp(x, K)
    ya = np.asarray(y)
    assert (np.linalg.eigvalsh(ya) > 0).all()
    expect_near_rel(np.asarray(t.cov_matrix_free(y, K)), x, 1e-9, "roundtrip")
    rows, cols = np.tril_indices(K)
    flatidx = rows * K + cols
    ld = brute_logdet(lambda u: t.cov_matrix_constrain(u, K).reshape(-1), x, flatidx)
    expect_near_rel(float(lp), ld, 1e-8, "logdet")


def test_cholesky_factor():
    M, N = 4, 3
    n = N * (N + 1) // 2 + (M - N) * N
    rng = np.random.default_rng(3)
    x = rng.normal(size=n) * 0.5
    L, lp = t.cholesky_factor_constrain_lp(x, M, N)
    La = np.asarray(L)
    assert (np.diag(La[:N, :N]) > 0).all()
    expect_near_rel(np.asarray(t.cholesky_factor_free(L, M, N)), x, 1e-10, "roundtrip")
    # free coordinates = lower-trapezoid entries
    rows, cols = np.tril_indices(M)
    keep = cols < N
    flatidx = (rows * N + cols)[keep]
    ld = brute_logdet(lambda u: t.cholesky_factor_constrain(u, M, N).reshape(-1), x, flatidx)
    expect_near_rel(float(lp), ld, 1e-9, "logdet")


def test_transform_objects_roundtrip():
    specs = [
        (t.Identity(shape=(3,)), (3,)),
        (t.LowerBound(shape=(2,), lb=0.0), (2,)),
        (t.Bounded(shape=(), lb=-1.0, ub=1.0), ()),
        (t.Ordered(shape=(4,)), (4,)),
        (t.Simplex(shape=(5,)), (4,)),
        (t.CholeskyCorr(shape=(3, 3)), (3,)),
        (t.CovMatrix(shape=(3, 3)), (6,)),
    ]
    rng = np.random.default_rng(4)
    for tr, ushape in specs:
        x = jnp.asarray(rng.normal(size=tr.unconstrained_shape) * 0.5)
        assert tuple(np.shape(x)) == tuple(tr.unconstrained_shape)
        y, lp = tr.constrain_lp(x)
        x2 = tr.free(y)
        expect_near_rel(np.asarray(x2), np.asarray(x), 1e-8, type(tr).__name__)


def test_grads_finite():
    """Every transform's constrain_lp must be differentiable."""
    K = 4
    n = K * (K - 1) // 2
    x = jnp.asarray(np.random.default_rng(5).normal(size=n) * 0.4)

    def f(u):
        _, lp = t.cholesky_corr_constrain_lp(u, K)
        return lp

    expect_ad(f, np.asarray(x))
