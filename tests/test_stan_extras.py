"""Numeric checks for the long-tail matrix/sequence functions added for
full prim/mat/fun parity (autocorrelation, chol2inv, CSR accessors,
matrix_exp_2x2, LKJ cov transforms, welford facades, ...)."""

import numpy as np
import scipy.linalg as sla

import jax
import jax.numpy as jnp

import math_tpu.stan as stan
from math_tpu import transforms
from math_tpu.ops import linalg


def test_autocorrelation_matches_definition():
    rng = np.random.default_rng(0)
    y = rng.normal(size=64)
    ac = np.asarray(linalg.autocorrelation(y))
    yc = y - y.mean()
    n = len(y)
    # reference: lag-k sum / (N - k), normalized by lag 0
    raw = np.array([np.sum(yc[: n - k] * yc[k:]) / (n - k) for k in range(n)])
    want = raw / raw[0]
    np.testing.assert_allclose(ac, want, rtol=1e-10, atol=1e-12)
    acov = np.asarray(linalg.autocovariance(y))
    np.testing.assert_allclose(acov, want * yc.var(), rtol=1e-10, atol=1e-12)


def test_chol2inv_and_mdivide_variants():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 5))
    a = a @ a.T + 5 * np.eye(5)
    L = np.linalg.cholesky(a)
    np.testing.assert_allclose(
        np.asarray(linalg.chol2inv(L)), np.linalg.inv(a), rtol=1e-9, atol=1e-10
    )
    b = rng.normal(size=(3, 5))
    np.testing.assert_allclose(
        np.asarray(linalg.mdivide_right_spd(b, a)), b @ np.linalg.inv(a), rtol=1e-8
    )
    u = np.triu(rng.normal(size=(5, 5))) + 5 * np.eye(5)
    np.testing.assert_allclose(
        np.asarray(linalg.mdivide_left_tri(u, b.T, lower=False)),
        np.linalg.solve(u, b.T),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(linalg.mdivide_right_tri(b, u, lower=False)),
        b @ np.linalg.inv(u),
        rtol=1e-8,
    )
    d = rng.normal(size=(3, 3))
    ldlt = linalg.ldlt_factor(a)
    np.testing.assert_allclose(
        float(linalg.trace_gen_inv_quad_form_ldlt(d, ldlt, b.T)),
        np.trace(d @ b @ np.linalg.inv(a) @ b.T),
        rtol=1e-8,
    )


def test_matrix_exp_2x2():
    rng = np.random.default_rng(2)
    for _ in range(5):
        a = rng.normal(size=(2, 2))
        np.testing.assert_allclose(
            np.asarray(linalg.matrix_exp_2x2(a)), sla.expm(a), rtol=1e-9, atol=1e-10
        )
    # complex-eigenvalue (rotation-like) branch
    rot = np.array([[0.0, -2.0], [2.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(linalg.matrix_exp_2x2(rot)), sla.expm(rot), rtol=1e-9, atol=1e-10
    )


def test_csr_roundtrip():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 6))
    w = linalg.csr_extract_w(a)
    v = linalg.csr_extract_v(a)
    u = linalg.csr_extract_u(a)
    back = np.asarray(linalg.csr_to_dense_matrix(4, 6, w, v, u))
    np.testing.assert_allclose(back, a, rtol=1e-12)
    assert int(linalg.csr_u_to_z(u, 2)) == 6
    b = rng.normal(size=6)
    np.testing.assert_allclose(
        np.asarray(linalg.csr_matrix_times_vector(4, 6, w, v, u, b)),
        a @ b,
        rtol=1e-10,
    )


def test_sort_rank_helpers():
    x = np.array([3.0, 1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(linalg.sort_indices_asc(x)), [2, 3, 1])
    np.testing.assert_array_equal(np.asarray(linalg.sort_indices_desc(x)), [1, 3, 2])
    assert int(linalg.rank(x, 1)) == 2  # two elements smaller than 3.0
    np.testing.assert_allclose(
        np.asarray(stan.sort_desc(x)), [3.0, 2.0, 1.0], rtol=0
    )


def test_lkj_cov_transform_roundtrip_and_jacobian():
    k = 4
    dim = k * (k - 1) // 2 + k
    rng = np.random.default_rng(4)
    x = rng.normal(size=dim) * 0.5

    y = np.asarray(transforms.cov_matrix_constrain_lkj(x, k))
    # valid SPD covariance
    assert np.all(np.linalg.eigvalsh(y) > 0)
    x_back = np.asarray(transforms.cov_matrix_free_lkj(y, k))
    np.testing.assert_allclose(x_back, x, rtol=1e-8, atol=1e-8)

    # log|det J| against brute-force AD of the flattened map
    _, lp = transforms.cov_matrix_constrain_lkj_lp(jnp.asarray(x), k)
    iu = np.tril_indices(k)  # lower triangle incl. diag parameterizes y

    def flat_map(xx):
        yy = transforms.cov_matrix_constrain_lkj(xx, k)
        return yy[iu[0], iu[1]]

    J = jax.jacfwd(flat_map)(jnp.asarray(x))
    want = np.linalg.slogdet(np.asarray(J))[1]
    np.testing.assert_allclose(float(lp), want, rtol=1e-8)


def test_read_corr_and_factor_roundtrip():
    k = 5
    kc2 = k * (k - 1) // 2
    rng = np.random.default_rng(5)
    cpcs = np.tanh(rng.normal(size=kc2) * 0.4)
    L = np.asarray(transforms.read_corr_L(cpcs, k))
    corr = L @ L.T
    assert np.allclose(np.diag(corr), 1.0)
    np.testing.assert_allclose(
        np.asarray(transforms.read_corr_matrix(cpcs, k)), corr, rtol=1e-10
    )
    # factor_U inverts read_corr_L (transposed factor, atanh CPCs)
    cpcs_back = np.tanh(np.asarray(transforms.factor_U(L.T, k)))
    np.testing.assert_allclose(cpcs_back, cpcs, rtol=1e-7, atol=1e-8)

    sds = np.exp(rng.normal(size=k) * 0.3)
    cov = np.asarray(transforms.read_cov_matrix(cpcs, sds))
    np.testing.assert_allclose(np.sqrt(np.diag(cov)), sds, rtol=1e-9)
    cpcs2, logsds2 = transforms.factor_cov_matrix(cov, k)
    np.testing.assert_allclose(np.tanh(np.asarray(cpcs2)), cpcs, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(logsds2), np.log(sds), rtol=1e-8)


def test_make_nu():
    # K=4, eta=2: alpha = eta + (K-2)/2 = 3; rows of the CPC triangle get
    # 2*alpha, decrementing alpha by 1/2 per row: [6,6,6, 5,5, 4]
    nu = np.asarray(transforms.make_nu(2.0, 4))
    np.testing.assert_allclose(nu, [6.0, 6.0, 6.0, 5.0, 5.0, 4.0])


def test_stan_surface_smoke():
    assert float(stan.fdim(3.0, 1.0)) == 2.0
    assert float(stan.fdim(1.0, 3.0)) == 0.0
    assert int(stan.logical_gte(3, 3)) == 1
    assert float(stan.if_else(True, 1.0, 2.0)) == 1.0
    assert int(stan.modulus(-7, 3)) == -1  # C++ truncation semantics
    assert int(stan.divide(jnp.asarray(-7), jnp.asarray(2))) == -3
    np.testing.assert_allclose(np.asarray(stan.inv_cloglog(0.0)), 1 - np.exp(-1))
    x = np.array([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(stan.to_vector(x)), [1, 3, 2, 4])
    np.testing.assert_allclose(
        np.asarray(stan.to_matrix(stan.to_vector(x), 2, 2)), x
    )
    # matrix input: Stan reads the source column-major (Eigen::Map), so
    # to_matrix(3x2 -> 2x3) must walk columns of the source
    y = np.array([[1.0, 4.0], [2.0, 5.0], [3.0, 6.0]])
    np.testing.assert_allclose(
        np.asarray(stan.to_matrix(y, 2, 3)), [[1.0, 3.0, 5.0], [2.0, 4.0, 6.0]]
    )
    np.testing.assert_allclose(np.asarray(stan.block(x, 1, 2, 2, 1)), [[2.0], [4.0]])
    np.testing.assert_allclose(np.asarray(stan.diag_pre_multiply([2.0, 3.0], x)), [[2, 4], [9, 12]])
    np.testing.assert_allclose(
        np.asarray(stan.diag_post_multiply(x, [2.0, 3.0])), [[2, 6], [6, 12]]
    )
    assert float(stan.variance(np.array([1.0, 2.0, 3.0]))) == 1.0
    # gammasgn handles the negative branch: Gamma(-0.5) = -2 sqrt(pi)
    np.testing.assert_allclose(float(stan.tgamma(-0.5)), -2 * np.sqrt(np.pi), rtol=1e-10)

    w = stan.welford_var_estimator(2)
    data = np.random.default_rng(6).normal(size=(10, 2))
    for row in data:
        w.add_sample(row)
    np.testing.assert_allclose(np.asarray(w.sample_mean()), data.mean(0), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(w.sample_variance()), data.var(0, ddof=1), rtol=1e-9
    )
    wc = stan.welford_covar_estimator(2)
    for row in data:
        wc.add_sample(row)
    np.testing.assert_allclose(
        np.asarray(wc.sample_covariance()), np.cov(data.T, ddof=1), rtol=1e-9
    )

    acc = stan.accumulator()
    acc.add(1.0).add(np.array([2.0, 3.0]))
    assert float(acc.sum()) == 6.0
