"""Second-order AD through the Pallas blocked Cholesky (interpret on CPU).

r5 rewired chol_pallas from one-shot custom_vjp to linear custom_jvp rules
(reverse mode = their transpose = Murray's adjoint), making jax.hessian —
and any order — work through the kernel paths (the r4 verdict's open
audit for ops/chol_pallas.chol_inv_block).  ref: mix/mat/functor/
hessian.hpp:42-66.
"""

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu.ops.chol_pallas import (
    chol_inv_block,
    cholesky_blocked_pallas,
    cholesky_solve_logdiag_pallas,
)

N = 48
B = 16  # small block so the blocked path (multiple panels) engages


def _spd(theta):
    """Parameterized SPD matrix: exp-quadratic kernel on a fixed grid."""
    x = jnp.linspace(-2.0, 2.0, N)
    d2 = (x[:, None] - x[None, :]) ** 2
    return theta[1] ** 2 * jnp.exp(-0.5 * d2 / theta[0] ** 2) + (
        0.1 + theta[2] ** 2
    ) * jnp.eye(N)


T0 = jnp.asarray([0.9, 1.1, 0.5])


def test_hessian_through_blocked_pallas_chol():
    def f(theta):
        L = cholesky_blocked_pallas(_spd(theta), block_size=B)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.01 * jnp.sum(L**2)

    def f_ref(theta):
        L = jnp.linalg.cholesky(_spd(theta))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.01 * jnp.sum(L**2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(T0)), np.asarray(jax.grad(f_ref)(T0)),
        rtol=1e-6,
    )
    h = np.asarray(jax.hessian(f)(T0))
    h_ref = np.asarray(jax.hessian(f_ref)(T0))
    np.testing.assert_allclose(h, h_ref, rtol=1e-5, atol=1e-8)


def test_hessian_through_solve_logdiag():
    y = jnp.asarray(np.random.default_rng(0).normal(size=N), jnp.float64)

    def f(theta):
        z, slog = cholesky_solve_logdiag_pallas(_spd(theta), y, block_size=B)
        return -0.5 * jnp.sum(z**2) - slog  # marginal-MVN logp core

    def f_ref(theta):
        L = jnp.linalg.cholesky(_spd(theta))
        z = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        return -0.5 * jnp.sum(z**2) - jnp.sum(jnp.log(jnp.diagonal(L)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(T0)), np.asarray(jax.grad(f_ref)(T0)),
        rtol=1e-6,
    )
    h = np.asarray(jax.hessian(f)(T0))
    h_ref = np.asarray(jax.hessian(f_ref)(T0))
    np.testing.assert_allclose(h, h_ref, rtol=1e-5, atol=1e-8)


def test_hessian_through_chol_inv_block_and_batch():
    """Direct block-kernel second order, including a vmapped batch."""

    def f(theta):
        u, w = chol_inv_block(_spd(theta)[:B, :B])
        return jnp.sum(jnp.log(jnp.diagonal(u))) + 0.01 * jnp.sum(w**2)

    h = np.asarray(jax.hessian(f)(T0))

    def f_ref(theta):
        L = jnp.linalg.cholesky(_spd(theta)[:B, :B])
        w = jnp.linalg.inv(L).T  # W = U^{-1} = (L^{-1})^T
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.01 * jnp.sum(w**2)

    h_ref = np.asarray(jax.hessian(f_ref)(T0))
    np.testing.assert_allclose(h, h_ref, rtol=1e-5, atol=1e-8)

    # batched: hessian of a vmapped-chain scalar
    thetas = jnp.stack([T0, T0 * 1.1])

    def g(ths):
        def one(th):
            u, _ = chol_inv_block(_spd(th)[:B, :B])
            return jnp.sum(jnp.log(jnp.diagonal(u)))

        return jnp.sum(jax.vmap(one)(ths))

    hb = np.asarray(jax.hessian(g)(thetas))
    assert np.isfinite(hb).all() and np.abs(hb).max() > 0


def test_third_order_chol():
    def f(theta):
        L = cholesky_blocked_pallas(_spd(theta), block_size=B)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    def f_ref(theta):
        L = jnp.linalg.cholesky(_spd(theta))
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    t1 = np.asarray(jax.grad(lambda t: jnp.trace(jax.hessian(f)(t)))(T0))
    t2 = np.asarray(jax.grad(lambda t: jnp.trace(jax.hessian(f_ref)(t)))(T0))
    np.testing.assert_allclose(t1, t2, rtol=1e-5, atol=1e-8)


def test_hand_transpose_is_exact():
    """The custom_transpose rules must be EXACT transposes of their
    tangent maps — verified by the dot-product identity
    <cot, f(lin)> == <f^T(cot), lin> on random NON-symmetric tangents
    (the symmetric-construction convention is not assumed here)."""
    from math_tpu.ops import chol_pallas as cp

    rng = np.random.default_rng(3)
    a = _spd(T0)
    flat, _, _ = cp._flatten_pad(a, N, B)
    L, Ws = cp._chol_blocked_impl(flat, B)
    Ws = tuple(Ws)

    # factor-only tangent map
    da = jnp.asarray(rng.normal(size=flat.shape))
    lbar = jnp.asarray(rng.normal(size=flat.shape))
    (dL,) = cp._chb_tan_fun((L, Ws), (da,))
    (abar,) = cp._chb_tan_transpose((L, Ws), (jnp.tril(lbar),))
    lhs = float(jnp.sum(jnp.tril(lbar) * dL))
    rhs = float(jnp.sum(abar * da))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)

    # joint solve+logdiag tangent map
    b = jnp.asarray(rng.normal(size=(1, flat.shape[-1], 2)))
    y = cp._lower_solve_blocks(L, Ws, b, B)
    db = jnp.asarray(rng.normal(size=b.shape))
    ybar = jnp.asarray(rng.normal(size=b.shape))
    sbar = jnp.asarray(rng.normal(size=(1,)))
    dy, ds = cp._csl_tan_fun((L, Ws, y), (da, db))
    abar2, bbar2 = cp._csl_tan_transpose((L, Ws, y), (ybar, sbar))
    lhs2 = float(jnp.sum(ybar * dy) + jnp.sum(sbar * ds))
    rhs2 = float(jnp.sum(abar2 * da) + jnp.sum(bbar2 * db))
    np.testing.assert_allclose(lhs2, rhs2, rtol=1e-10)
