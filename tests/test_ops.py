"""linalg / GP / quadrature / algebra-solver ops."""

import numpy as np
import pytest
import scipy.linalg
import scipy.integrate

import jax
import jax.numpy as jnp

from math_tpu.ops import gp as gp_ops
from math_tpu.ops import linalg as la
from math_tpu.ops.integrate import integrate_1d
from math_tpu.ops.solve import algebra_solver_fp, algebra_solver_newton
from math_tpu.testing import expect_ad, expect_near_rel, finite_diff_gradient

RNG = np.random.default_rng(0)
A = RNG.normal(size=(5, 5))
SPD = A @ A.T + 5 * np.eye(5)
B = RNG.normal(size=(5, 3))


def test_linalg_values():
    L = np.asarray(la.cholesky_decompose(SPD))
    np.testing.assert_allclose(L @ L.T, SPD, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(la.mdivide_left(SPD, B)), np.linalg.solve(SPD, B), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(la.mdivide_right(B.T, SPD)), B.T @ np.linalg.inv(SPD), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(la.mdivide_left_tri_low(np.tril(A + 5 * np.eye(5)), B)),
        scipy.linalg.solve_triangular(np.tril(A + 5 * np.eye(5)), B, lower=True),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        float(la.log_determinant_spd(SPD)), np.linalg.slogdet(SPD)[1], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(la.inverse_spd(SPD)), np.linalg.inv(SPD), rtol=1e-8
    )
    np.testing.assert_allclose(
        float(la.trace_quad_form(SPD, B)), np.trace(B.T @ SPD @ B), rtol=1e-10
    )
    ldlt = la.ldlt_factor(SPD)
    np.testing.assert_allclose(
        np.asarray(la.mdivide_left_ldlt(ldlt, B)), np.linalg.solve(SPD, B), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(la.trace_inv_quad_form_ldlt(ldlt, B)),
        np.trace(B.T @ np.linalg.inv(SPD) @ B),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(la.matrix_exp(A * 0.3)), scipy.linalg.expm(A * 0.3), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(la.quad_form_diag(SPD, np.arange(1.0, 6.0))),
        np.diag(np.arange(1.0, 6.0)) @ SPD @ np.diag(np.arange(1.0, 6.0)),
        rtol=1e-12,
    )


class TestMatrixExpAction:
    """Action algorithm (ref: matrix_exp_action_handler.hpp) vs dense expm."""

    def test_value_parity_small_and_large_norm(self):
        for scale in [0.1, 1.0, 8.0, 40.0]:  # 40: needs s ~ 9 substeps
            got = np.asarray(la.matrix_exp_multiply(scale * A, B))
            want = scipy.linalg.expm(scale * A) @ B
            np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    def test_scale_form(self):
        got = np.asarray(la.scale_matrix_exp_multiply(2.5, A, B))
        want = scipy.linalg.expm(2.5 * A) @ B
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_traced_with_norm_bound(self):
        # under jit A is traced: max_norm= supplies the static substep count
        norm = float(np.abs(A).sum(axis=0).max())

        @jax.jit
        def f(a, b):
            return la.matrix_exp_multiply(a, b, max_norm=norm * 1.5)

        np.testing.assert_allclose(
            np.asarray(f(A, B)), scipy.linalg.expm(A) @ B, rtol=1e-8
        )

    def test_traced_without_bound_dense_fallback(self):
        @jax.jit
        def f(a, b):
            return la.matrix_exp_multiply(a, b)

        np.testing.assert_allclose(
            np.asarray(f(A, B)), scipy.linalg.expm(A) @ B, rtol=1e-7
        )

    def test_grad_vs_dense_path(self):
        # AD through the scan-based action vs AD through dense expm
        norm = float(np.abs(A).sum(axis=0).max())

        def f_action(a):
            return jnp.sum(la.matrix_exp_multiply(a, B, max_norm=norm * 2))

        def f_dense(a):
            return jnp.sum(la.matrix_exp(a) @ B)

        g_action = np.asarray(jax.grad(f_action)(jnp.asarray(A)))
        g_dense = np.asarray(jax.grad(f_dense)(jnp.asarray(A)))
        np.testing.assert_allclose(g_action, g_dense, rtol=1e-6, atol=1e-8)
        # b-side gradient too
        gb_action = np.asarray(
            jax.grad(
                lambda b: jnp.sum(la.matrix_exp_multiply(A, b))
            )(jnp.asarray(B))
        )
        gb_dense = scipy.linalg.expm(A).T @ np.ones((5, 3))
        np.testing.assert_allclose(gb_action, gb_dense, rtol=1e-8)


def test_csr_matrix_times_vector():
    import scipy.sparse as sp

    M = sp.random(7, 5, density=0.4, random_state=1, format="csr")
    b = RNG.normal(size=5)
    got = np.asarray(
        la.csr_matrix_times_vector(
            7, 5, M.data, M.indices + 1, np.append(M.indptr + 1, 0)[:-1], b
        )
    )
    np.testing.assert_allclose(got, M @ b, rtol=1e-10)


def test_cholesky_grad():
    x = SPD[np.tril_indices(5)]

    def f(xf):
        m = jnp.zeros((5, 5)).at[np.tril_indices(5)].set(xf)
        m = m + m.T - jnp.diag(jnp.diag(m))
        return jnp.sum(jnp.tril(la.cholesky_decompose(m)))

    expect_ad(f, x, tol=1e-4)


def test_gp_kernels():
    x = RNG.normal(size=(6, 2))
    k = np.asarray(gp_ops.gp_exp_quad_cov(x, 1.3, 0.7))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(k, 1.3**2 * np.exp(-0.5 * d2 / 0.49), rtol=1e-8)
    assert (np.linalg.eigvalsh(k + 1e-9 * np.eye(6)) > 0).all()

    k32 = np.asarray(gp_ops.gp_matern32_cov(x, 1.0, 0.9))
    d = np.sqrt(d2)
    z = np.sqrt(3) * d / 0.9
    np.testing.assert_allclose(k32, (1 + z) * np.exp(-z), rtol=1e-6)

    kp = np.asarray(gp_ops.gp_periodic_cov(x, 1.0, 0.5, 2.0))
    np.testing.assert_allclose(
        kp, np.exp(-2 * np.sin(np.pi * d / 2.0) ** 2 / 0.25), rtol=1e-6
    )

    # gradients flow through kernels
    expect_ad(
        lambda s, l: jnp.sum(gp_ops.gp_exp_quad_cov(x, s, l)), 1.3, 0.7, tol=1e-5
    )
    expect_ad(
        lambda s, l: jnp.sum(gp_ops.gp_matern52_cov(x, s, l)), 1.1, 0.8, tol=1e-5
    )


def test_integrate_1d_finite():
    # int_0^1 x^theta dx = 1/(theta+1)
    got = float(integrate_1d(lambda x, t: jnp.power(x, t), 0.0, 1.0, 2.5))
    expect_near_rel(got, 1 / 3.5, 1e-10)
    # gradient wrt theta
    g = float(jax.grad(lambda t: integrate_1d(lambda x, tt: jnp.power(x, tt), 0.0, 1.0, t))(2.5))
    expect_near_rel(g, -1 / 3.5**2, 1e-8)


def test_integrate_1d_half_infinite():
    # int_0^inf exp(-t x) dx = 1/t
    got = float(integrate_1d(lambda x, t: jnp.exp(-t * x), 0.0, np.inf, 1.7))
    expect_near_rel(got, 1 / 1.7, 1e-9)


def test_integrate_1d_doubly_infinite():
    # int exp(-x^2/(2 s^2)) = s sqrt(2 pi)
    got = float(
        integrate_1d(lambda x, s: jnp.exp(-0.5 * (x / s) ** 2), -np.inf, np.inf, 1.3)
    )
    expect_near_rel(got, 1.3 * np.sqrt(2 * np.pi), 1e-9)


def test_algebra_solver_newton():
    # solve x^2 = theta elementwise -> x = sqrt(theta)
    def f(x, theta):
        return jnp.square(x) - theta

    theta = jnp.asarray([4.0, 9.0])
    x = algebra_solver_newton(f, jnp.asarray([1.0, 1.0]), theta)
    np.testing.assert_allclose(np.asarray(x), [2.0, 3.0], rtol=1e-8)
    # IFT gradient: dx/dtheta = 1/(2 sqrt(theta))
    g = jax.jacrev(lambda t: algebra_solver_newton(f, jnp.asarray([1.0, 1.0]), t))(theta)
    np.testing.assert_allclose(
        np.asarray(g), np.diag([0.25, 1 / 6]), atol=1e-8
    )


def test_algebra_solver_coupled_system():
    # 2-D nonlinear: x0 + x1 = theta0, x0*x1 = theta1
    def f(x, theta):
        return jnp.stack([x[0] + x[1] - theta[0], x[0] * x[1] - theta[1]])

    theta = np.array([5.0, 6.0])
    x = np.asarray(
        algebra_solver_newton(f, jnp.asarray([1.0, 4.5]), jnp.asarray(theta))
    )
    np.testing.assert_allclose(sorted(x), [2.0, 3.0], rtol=1e-7)

    def loss(t):
        return jnp.sum(algebra_solver_newton(f, jnp.asarray([1.0, 4.5]), t))

    g_ad = np.asarray(jax.grad(loss)(jnp.asarray(theta)))
    g_fd = finite_diff_gradient(loss, theta, h=1e-6)
    np.testing.assert_allclose(g_ad, g_fd, rtol=1e-5)


def test_algebra_solver_fp():
    # x = cos(x) fixed point
    def f(x, theta):
        return jnp.cos(x) * theta

    x = float(
        algebra_solver_fp(lambda x, t: jnp.cos(x) * t, jnp.asarray([0.5]), jnp.asarray([1.0]))[0]
    )
    expect_near_rel(x, 0.7390851332151607, 1e-8)


def test_algebra_solver_powell_dogleg():
    """Trust-region dogleg converges from far starts where Newton blows up
    (ref: algebra_solver_powell.hpp robustness rationale)."""
    from math_tpu.ops.solve import algebra_solver_powell

    def f(x, t):
        return jnp.stack([jnp.exp(x[0]) - t[0], x[0] * x[1] + x[1] ** 3 - t[1]])

    theta = jnp.asarray([2.0, 5.0])
    x0 = jnp.asarray([-6.0, 9.0])
    x = algebra_solver_powell(f, x0, theta)
    assert float(jnp.linalg.norm(f(x, theta))) < 1e-10
    np.testing.assert_allclose(float(x[0]), np.log(2.0), rtol=1e-10)

    # IFT gradients match the newton solver's from a good start
    g_p = jax.jacrev(lambda t: algebra_solver_powell(f, x0, t))(theta)
    g_n = jax.jacrev(lambda t: algebra_solver_newton(f, x, t))(theta)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_n), rtol=1e-9)
