"""Semi-explicit index-1 DAE integration (IDAS analog)."""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.ops.ode import integrate_dae
from math_tpu.testing import expect_near_rel, finite_diff_gradient


def test_linear_dae_analytic():
    """y' = -z, 0 = z - theta*y  ==>  y(t) = y0 exp(-theta t), z = theta y."""

    def f(t, y, z, theta):
        return -z

    def g(t, y, z, theta):
        return z - theta[0] * y

    ts = np.linspace(0.5, 3.0, 6)
    ys, zs = integrate_dae(
        f, g, jnp.asarray([2.0]), jnp.asarray([0.5]), 0.0, ts, jnp.asarray([0.7])
    )
    want = 2.0 * np.exp(-0.7 * ts)
    expect_near_rel(np.asarray(ys)[:, 0], want, 1e-6, "dae y")
    expect_near_rel(np.asarray(zs)[:, 0], 0.7 * want, 1e-6, "dae z")


def test_nonlinear_dae_gradient():
    """y' = -z, 0 = z^3 + z - theta*y (unique real root)."""

    def f(t, y, z, theta):
        return -z

    def g(t, y, z, theta):
        return z**3 + z - theta[0] * y

    ts = np.linspace(0.5, 2.0, 4)

    def loss(theta):
        ys, _ = integrate_dae(
            f, g, jnp.asarray([2.0]), jnp.asarray([0.5]), 0.0, ts, theta
        )
        return jnp.sum(jnp.square(ys))

    g_ad = np.asarray(jax.grad(loss)(jnp.asarray([0.9])))
    g_fd = finite_diff_gradient(loss, np.array([0.9]), h=1e-5)
    expect_near_rel(g_ad, g_fd, 5e-4, "dae grad")
