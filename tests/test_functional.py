"""Higher-order AD drivers and map_rect / adj_jac_apply."""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu import functional as fn
from math_tpu.testing import expect_near_rel


def rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


X = np.array([0.3, -0.5, 1.2])


def test_gradient_jacobian_hessian():
    fx, g = fn.gradient(rosen, X)
    g_fd = fn.finite_diff_gradient(rosen, X)
    expect_near_rel(np.asarray(g), g_fd, 1e-5)

    fvec = lambda x: jnp.stack([jnp.sum(x**2), jnp.prod(x)])
    fx, J = fn.jacobian(fvec, X)
    fx2, J2 = fn.jacobian(fvec, X, mode="fwd")
    expect_near_rel(np.asarray(J), np.asarray(J2), 1e-12)

    fx, g, H = fn.hessian(rosen, X)
    H_fd = fn.finite_diff_hessian(rosen, X)
    expect_near_rel(np.asarray(H), H_fd, 1e-3)

    v = np.array([1.0, -2.0, 0.5])
    hv = fn.hessian_times_vector(rosen, X, v)
    expect_near_rel(np.asarray(hv), np.asarray(H) @ v, 1e-10)

    m = np.eye(3)
    g_tr = fn.grad_tr_mat_times_hessian(rosen, X, m)
    # tr(H) gradient vs fd
    def tr_h(x):
        return float(np.trace(np.asarray(jax.hessian(rosen)(jnp.asarray(x)))))
    g_fd2 = fn.finite_diff_gradient(tr_h, X, h=1e-5)
    expect_near_rel(np.asarray(g_tr), g_fd2, 1e-4)

    fx3, H3, gH = fn.grad_hessian(rosen, X)
    assert np.asarray(gH).shape == (3, 3, 3)


def test_derivative():
    fx, dx = fn.derivative(jnp.sin, 0.7)
    expect_near_rel(float(dx), np.cos(0.7), 1e-12)
    fx, d1 = fn.partial_derivative(rosen, X, 1)
    expect_near_rel(float(d1), fn.finite_diff_gradient(rosen, X)[1], 1e-5)


def test_map_rect_matches_serial():
    """Parallel map must equal the serial loop (the reference checks MPI
    against the in-process path the same way, SURVEY.md §4.4)."""

    def job(shared, theta, x_r, x_i):
        mu = shared[0]
        return jnp.stack([mu + theta[0] * x_r[0], theta[1] ** 2])

    shared = jnp.asarray([1.5])
    job_params = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    x_r = jnp.asarray([[0.1], [0.2], [0.3]])
    x_i = jnp.zeros((3, 1), jnp.int32)

    got = np.asarray(fn.map_rect(job, shared, job_params, x_r, x_i))
    want = np.concatenate(
        [np.asarray(job(shared, job_params[i], x_r[i], x_i[i])) for i in range(3)]
    )
    expect_near_rel(got, want, 1e-12)

    # gradients flow through shared params
    g = jax.grad(lambda s: jnp.sum(fn.map_rect(job, s, job_params, x_r, x_i)))(shared)
    expect_near_rel(np.asarray(g), np.array([3.0]), 1e-12)


def test_adj_jac_apply():
    """Custom vjp: y = softmax(x) with hand-written adjoint."""

    def f(x):
        return jax.nn.softmax(x)

    def mult_adj_jac(args, adj):
        (x,) = args
        y = jax.nn.softmax(x)
        return (y * (adj - jnp.dot(adj, y)),)

    soft = fn.adj_jac_apply(f, mult_adj_jac)
    x = jnp.asarray(X)
    g1 = jax.grad(lambda x: jnp.sum(soft(x) * jnp.arange(3.0)))(x)
    g2 = jax.grad(lambda x: jnp.sum(jax.nn.softmax(x) * jnp.arange(3.0)))(x)
    expect_near_rel(np.asarray(g1), np.asarray(g2), 1e-10)
