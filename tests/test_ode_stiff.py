"""Stiff solver: TR-BDF2 vs scipy BDF on genuinely stiff systems."""

import numpy as np
from scipy.integrate import solve_ivp

import jax
import jax.numpy as jnp

from math_tpu.ops.ode import integrate_ode_bdf
from math_tpu.testing import expect_near_rel, finite_diff_gradient


def vdp(t, y, theta):
    mu = theta[0]
    return jnp.stack([y[1], mu * ((1 - y[0] ** 2) * y[1]) - y[0]])


def test_van_der_pol_stiff():
    mu = 100.0  # stiffness ratio ~ mu^2
    ts = np.linspace(1.0, 200.0, 10)
    ys = np.asarray(
        integrate_ode_bdf(
            vdp, jnp.asarray([2.0, 0.0]), 0.0, ts, jnp.asarray([mu]),
            rtol=1e-7, atol=1e-9,
        )
    )
    sol = solve_ivp(
        lambda t, y: [y[1], mu * ((1 - y[0] ** 2) * y[1]) - y[0]],
        (0, 200.0),
        [2.0, 0.0],
        t_eval=ts,
        method="BDF",
        rtol=1e-10,
        atol=1e-12,
    )
    want = sol.y.T
    # position component tracked to solver tolerance
    expect_near_rel(ys[:, 0], want[:, 0], 5e-4, "vdp position")
    assert not np.isnan(ys).any()


def test_stiff_decay_exact():
    """y' = -k y with k = 1e4: explicit solvers need h ~ 1e-4; TR-BDF2
    takes large steps (L-stable)."""

    def f(t, y, theta):
        return -theta[0] * y

    ts = np.array([0.1, 1.0, 2.0])
    k = 1e4
    ys = np.asarray(
        integrate_ode_bdf(
            f, jnp.asarray([1.0]), 0.0, ts, jnp.asarray([k]),
            rtol=1e-8, atol=1e-12, max_num_steps=5000,
        )
    )
    want = np.exp(-k * ts)[:, None]
    assert np.abs(ys - want).max() < 1e-8


def test_stiff_gradients():
    def f(t, y, theta):
        return jnp.stack([-theta[0] * y[0] + theta[1] * y[1], -theta[1] * y[1]])

    ts = np.linspace(0.2, 2.0, 5)

    def loss(theta):
        ys = integrate_ode_bdf(
            f, jnp.asarray([1.0, 1.0]), 0.0, ts, theta, rtol=1e-9, atol=1e-12
        )
        return jnp.sum(jnp.square(ys))

    th = np.array([50.0, 3.0])
    g_ad = np.asarray(jax.grad(loss)(jnp.asarray(th)))
    g_fd = finite_diff_gradient(loss, th, h=1e-5)
    expect_near_rel(g_ad, g_fd, 5e-4, "stiff adjoint grad")
