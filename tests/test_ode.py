"""ODE solvers: accuracy vs scipy, adjoint gradients vs finite differences."""

import numpy as np
import pytest
from scipy.integrate import solve_ivp

import jax
import jax.numpy as jnp

from math_tpu.ops.ode import integrate_ode_rk45, ode_rk4_fixed
from math_tpu.testing import expect_near_rel, finite_diff_gradient


def lotka_volterra(t, y, theta):
    u, v = y[0], y[1]
    alpha, beta, gamma, delta = theta[0], theta[1], theta[2], theta[3]
    return jnp.stack([alpha * u - beta * u * v, -gamma * v + delta * u * v])


THETA = np.array([1.1, 0.4, 0.4, 0.1])
Y0 = np.array([10.0, 5.0])
TS = np.linspace(0.5, 10.0, 12)


def _scipy_solution():
    def f(t, y):
        return [
            THETA[0] * y[0] - THETA[1] * y[0] * y[1],
            -THETA[2] * y[1] + THETA[3] * y[0] * y[1],
        ]

    sol = solve_ivp(f, (0, 10.0), Y0, t_eval=TS, rtol=1e-10, atol=1e-12)
    return sol.y.T


def test_rk45_accuracy():
    ys = np.asarray(
        integrate_ode_rk45(lotka_volterra, Y0, 0.0, TS, THETA, rtol=1e-8, atol=1e-10)
    )
    want = _scipy_solution()
    expect_near_rel(ys, want, 1e-6, "LV solution")


def test_rk4_fixed_accuracy():
    ys = np.asarray(ode_rk4_fixed(lotka_volterra, Y0, 0.0, TS, THETA, 64))
    want = _scipy_solution()
    expect_near_rel(ys, want, 1e-5, "LV rk4 solution")


def test_adjoint_gradients_match_fd():
    def loss(theta):
        ys = integrate_ode_rk45(
            lotka_volterra, Y0, 0.0, TS, theta, rtol=1e-8, atol=1e-10
        )
        return jnp.sum(jnp.square(ys))

    g_ad = np.asarray(jax.grad(loss)(jnp.asarray(THETA)))
    g_fd = finite_diff_gradient(loss, THETA, h=1e-5)
    expect_near_rel(g_ad, g_fd, 2e-4, "adjoint grad theta")


def test_adjoint_gradients_y0():
    def loss(y0):
        ys = integrate_ode_rk45(
            lotka_volterra, y0, 0.0, TS, jnp.asarray(THETA), rtol=1e-8, atol=1e-10
        )
        return jnp.sum(ys[-1])

    g_ad = np.asarray(jax.grad(loss)(jnp.asarray(Y0)))
    g_fd = finite_diff_gradient(loss, Y0, h=1e-5)
    expect_near_rel(g_ad, g_fd, 2e-4, "adjoint grad y0")


def test_rk4_grads_match_adjoint():
    def loss_fixed(theta):
        return jnp.sum(
            jnp.square(ode_rk4_fixed(lotka_volterra, Y0, 0.0, TS, theta, 64))
        )

    def loss_adj(theta):
        return jnp.sum(
            jnp.square(
                integrate_ode_rk45(
                    lotka_volterra, Y0, 0.0, TS, theta, rtol=1e-9, atol=1e-11
                )
            )
        )

    g1 = np.asarray(jax.grad(loss_fixed)(jnp.asarray(THETA)))
    g2 = np.asarray(jax.grad(loss_adj)(jnp.asarray(THETA)))
    expect_near_rel(g1, g2, 1e-4, "fixed vs adjoint grads")


def test_jit_and_vmap():
    f = jax.jit(
        lambda th: integrate_ode_rk45(lotka_volterra, Y0, 0.0, TS, th)
    )
    ys = np.asarray(f(jnp.asarray(THETA)))
    expect_near_rel(ys, _scipy_solution(), 1e-4, "jit solution")
    thetas = jnp.asarray(np.stack([THETA, THETA * 1.05]))
    ys_b = jax.vmap(f)(thetas)
    assert ys_b.shape == (2, 12, 2)


def test_max_steps_nan():
    ys = integrate_ode_rk45(
        lotka_volterra, Y0, 0.0, TS, THETA, rtol=1e-12, atol=1e-14, max_num_steps=5
    )
    assert np.isnan(np.asarray(ys)).any()


def test_integrate_ode_adams_multistep():
    """ABM4 PECE vs closed form + adjoint-gradient parity with rk45."""
    from math_tpu.ops.ode import integrate_ode_adams, integrate_ode_rk45

    def f(t, y, theta):
        a, b = theta
        return jnp.stack([a * y[0] - b * y[1], b * y[0] + a * y[1]])

    theta = jnp.asarray([-0.3, 2.0])
    y0 = jnp.asarray([1.0, 0.0])
    ts = jnp.linspace(0.4, 6.0, 7)
    ys = np.asarray(integrate_ode_adams(f, y0, 0.0, ts, theta))
    t = np.asarray(ts)
    exact = np.exp(-0.3 * t)[:, None] * np.stack(
        [np.cos(2 * t), np.sin(2 * t)], -1
    )
    np.testing.assert_allclose(ys, exact, rtol=0, atol=1e-6)

    def loss(fn):
        return lambda th: jnp.sum(jnp.square(fn(f, y0, 0.0, ts, th)))

    ga = np.asarray(jax.grad(loss(integrate_ode_adams))(theta))
    gr = np.asarray(jax.grad(loss(integrate_ode_rk45))(theta))
    np.testing.assert_allclose(ga, gr, rtol=1e-4, atol=1e-5)
