"""Scan-blocked Cholesky (ops/cholesky.py) vs XLA's factorization.

Mirrors the reference's blocked-vs-scalar cholesky parity tests
(rev/mat/fun/cholesky_decompose_test) and the OpenCL device-parity suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.ops.cholesky import cholesky_blocked, cholesky_decompose_tpu


@pytest.mark.parametrize("n,bs", [(5, 4), (64, 16), (200, 64), (513, 128)])
def test_forward_parity(n, bs):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, n))
    a = x @ x.T + n * np.eye(n)
    L = np.asarray(cholesky_blocked(jnp.asarray(a), block_size=bs))
    np.testing.assert_allclose(L, np.linalg.cholesky(a), rtol=1e-10, atol=1e-11)


def test_vjp_parity_through_symmetric_input():
    # cholesky reads only the lower triangle; gradients are only defined up
    # to the symmetric combination, so compare through a symmetric build
    n = 96
    rng = np.random.default_rng(1)
    B0 = jnp.asarray(rng.normal(size=(n, n)))

    def loss(chol):
        return lambda b: jnp.sum(jnp.sin(chol(b @ b.T + n * jnp.eye(n))))

    g1 = jax.grad(loss(lambda m: cholesky_blocked(m, block_size=32)))(B0)
    g2 = jax.grad(loss(jnp.linalg.cholesky))(B0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-9)


def test_dispatch_and_batching():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 40, 40))
    a = x @ np.swapaxes(x, -1, -2) + 40 * np.eye(40)
    # below threshold -> XLA path; also exercise vmap over the blocked path
    small = np.asarray(cholesky_decompose_tpu(jnp.asarray(a)))
    np.testing.assert_allclose(small, np.linalg.cholesky(a), rtol=1e-9, atol=1e-10)
    batched = np.asarray(
        jax.vmap(lambda m: cholesky_blocked(m, block_size=16))(jnp.asarray(a))
    )
    np.testing.assert_allclose(batched, np.linalg.cholesky(a), rtol=1e-9, atol=1e-10)


def test_non_multiple_block_size_padding():
    n = 130  # not a multiple of 64
    rng = np.random.default_rng(3)
    x = rng.normal(size=(n, n))
    a = x @ x.T + n * np.eye(n)
    L = np.asarray(cholesky_blocked(jnp.asarray(a), block_size=64))
    np.testing.assert_allclose(L, np.linalg.cholesky(a), rtol=1e-9, atol=1e-10)


# --- Pallas fused block kernel (interpret mode on CPU) ----------------------


def test_pallas_block_kernel():
    from math_tpu.ops.chol_pallas import chol_inv_block

    rng = np.random.default_rng(5)
    B = 32
    x = rng.normal(size=(B, B))
    d = x @ x.T + B * np.eye(B)
    U, W = chol_inv_block(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(U.T @ U), d, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(U @ W), np.eye(B), rtol=1e-10, atol=1e-10
    )


def test_pallas_blocked_forward_and_vjp():
    from math_tpu.ops.chol_pallas import cholesky_blocked_pallas

    rng = np.random.default_rng(6)
    n = 96
    x = rng.normal(size=(n, n))
    a = x @ x.T + n * np.eye(n)
    L = np.asarray(cholesky_blocked_pallas(jnp.asarray(a), block_size=32))
    np.testing.assert_allclose(L, np.linalg.cholesky(a), rtol=1e-10, atol=1e-11)

    B0 = jnp.asarray(rng.normal(size=(n, n)))

    def loss(chol):
        return lambda b: jnp.sum(jnp.sin(chol(b @ b.T + n * jnp.eye(n))))

    g1 = jax.grad(loss(lambda m: cholesky_blocked_pallas(m, block_size=32)))(B0)
    g2 = jax.grad(loss(jnp.linalg.cholesky))(B0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_non_psd_propagates_nan(impl):
    # NUTS relies on nan/-inf logp to reject non-PSD proposals; the blocked
    # factorizations must signal failure, not return finite garbage
    from math_tpu.ops.chol_pallas import cholesky_blocked_pallas

    fn = cholesky_blocked if impl == "scan" else cholesky_blocked_pallas
    n = 48
    a = np.eye(n)
    a[5, 5] = -1e15  # violently non-PSD
    L = np.asarray(fn(jnp.asarray(a), block_size=16))
    assert np.isnan(L).any(), "non-PSD input must produce NaN"
    # and a PSD matrix through the same path stays NaN-free
    rng = np.random.default_rng(11)
    x = rng.normal(size=(n, n))
    good = np.asarray(fn(jnp.asarray(x @ x.T + n * np.eye(n)), block_size=16))
    assert np.isfinite(good).all()


def test_pallas_blocked_vmap():
    from math_tpu.ops.chol_pallas import cholesky_blocked_pallas

    rng = np.random.default_rng(7)
    xs = rng.normal(size=(3, 64, 64))
    aa = xs @ np.swapaxes(xs, -1, -2) + 64 * np.eye(64)
    Lb = np.asarray(
        jax.vmap(lambda m: cholesky_blocked_pallas(m, block_size=32))(jnp.asarray(aa))
    )
    np.testing.assert_allclose(Lb, np.linalg.cholesky(aa), rtol=1e-9, atol=1e-10)


def test_vmap_merges_into_kernel_batch():
    """vmap must FOLD the chain axis into the kernel's batch dimension
    (primitive batching rule), not serialize it through a Pallas grid —
    that serialization cost 3.5 ms/chain flat on v5e."""
    from math_tpu.ops.chol_pallas import chol_inv_block

    rng = np.random.default_rng(3)
    B = 8
    A = rng.normal(size=(5, B, B))
    A = A @ np.swapaxes(A, -1, -2) + B * np.eye(B)
    jaxpr = str(jax.make_jaxpr(jax.vmap(chol_inv_block))(jnp.asarray(A)))
    assert jaxpr.count("math_tpu_chol_inv_block") == 1, jaxpr
    U, W = jax.vmap(chol_inv_block)(jnp.asarray(A))
    U2, W2 = chol_inv_block(jnp.asarray(A))  # direct batched call
    np.testing.assert_allclose(np.asarray(U), np.asarray(U2), rtol=1e-12)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(U[i]).T, np.linalg.cholesky(A[i]), rtol=1e-10
        )


def test_blocked_tri_solve():
    """Blocked forward substitution vs dense solve: values, grads, vmap
    (the marginal-GP logp's solve; XLA's triangular_solve compile blows up
    at n ~ 2000 through the remote relay)."""
    import jax.scipy.linalg as jsl

    from math_tpu.ops.cholesky import mdivide_left_tri_low_blocked

    rng = np.random.default_rng(0)
    n = 70
    L = np.tril(rng.normal(size=(n, n))) + n * np.eye(n)
    b = rng.normal(size=n)
    y = np.asarray(
        mdivide_left_tri_low_blocked(jnp.asarray(L), jnp.asarray(b), block_size=16)
    )
    np.testing.assert_allclose(y, np.linalg.solve(L, b), rtol=1e-10)
    B = rng.normal(size=(n, 3))
    Y = np.asarray(
        mdivide_left_tri_low_blocked(jnp.asarray(L), jnp.asarray(B), block_size=16)
    )
    np.testing.assert_allclose(Y, np.linalg.solve(L, B), rtol=1e-10)
    g1 = jax.grad(
        lambda m: jnp.sum(
            mdivide_left_tri_low_blocked(jnp.tril(m), jnp.asarray(b), block_size=16)
        )
    )(jnp.asarray(L))
    g2 = jax.grad(
        lambda m: jnp.sum(jsl.solve_triangular(jnp.tril(m), jnp.asarray(b), lower=True))
    )(jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9, atol=1e-12)
    Ls = np.tril(rng.normal(size=(3, n, n))) + n * np.eye(n)
    bs = rng.normal(size=(3, n))
    Ys = np.asarray(
        jax.vmap(lambda m, x: mdivide_left_tri_low_blocked(m, x, block_size=16))(
            jnp.asarray(Ls), jnp.asarray(bs)
        )
    )
    for i in range(3):
        np.testing.assert_allclose(Ys[i], np.linalg.solve(Ls[i], bs[i]), rtol=1e-9)


def test_fused_chol_solve_logdiag():
    """cholesky_solve_logdiag_pallas: values + joint adjoint vs the dense
    XLA composition, scalar and batched (the marginal-GP logp core)."""
    import jax.scipy.linalg as jsl

    from math_tpu.ops.chol_pallas import cholesky_solve_logdiag_pallas

    rng = np.random.default_rng(3)
    n = 70

    def mk(shape=()):
        A = rng.normal(size=shape + (n, n))
        return A @ np.swapaxes(A, -1, -2) + n * np.eye(n)

    K = jnp.asarray(mk())
    b = jnp.asarray(rng.normal(size=n))

    def dense(k, bb):
        L = jnp.linalg.cholesky(k)
        y = jsl.solve_triangular(L, bb, lower=True)
        return y, jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)

    y, s = cholesky_solve_logdiag_pallas(K, b, block_size=16)
    yd, sd = dense(K, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), rtol=1e-9)
    np.testing.assert_allclose(float(s), float(sd), rtol=1e-10)

    # joint gradient (the logp shape: -0.5||y||^2 - s) wrt (K, b), vs dense
    def lp(f):
        def g(k, bb):
            yy, ss = f(k, bb)
            return -0.5 * jnp.sum(jnp.square(yy)) - ss
        return g

    gk, gb = jax.grad(lp(lambda k, bb: cholesky_solve_logdiag_pallas(k, bb, block_size=16)), argnums=(0, 1))(K, b)
    dk, db = jax.grad(lp(dense), argnums=(0, 1))(K, b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(db), rtol=1e-8, atol=1e-12)
    # chol cotangent convention: compare through the symmetric part
    np.testing.assert_allclose(
        np.asarray(gk + gk.T), np.asarray(dk + dk.T), rtol=1e-7, atol=1e-10
    )

    # batched via vmap (the sampler path): values match per-slice dense
    Ks = jnp.asarray(mk((3,)))
    bs = jnp.asarray(rng.normal(size=(3, n)))
    yv, sv = jax.vmap(
        lambda k, bb: cholesky_solve_logdiag_pallas(k, bb, block_size=16)
    )(Ks, bs)
    ydv, sdv = jax.vmap(dense)(Ks, bs)
    np.testing.assert_allclose(np.asarray(yv), np.asarray(ydv), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(sdv), rtol=1e-9)


def test_multi_normal_blocked_dispatch():
    """multi_normal_lpdf's blocked branch matches the XLA branch in value
    and gradient (single row and row batch)."""
    from math_tpu import dists
    from math_tpu.config import get_config, update_config
    import dataclasses

    rng = np.random.default_rng(5)
    k = 40
    A = rng.normal(size=(k, k))
    sigma = jnp.asarray(A @ A.T + k * np.eye(k))
    mu = jnp.asarray(rng.normal(size=k))
    y1 = jnp.asarray(rng.normal(size=k))
    yb = jnp.asarray(rng.normal(size=(3, k)))

    th0 = get_config().thresholds
    try:
        for y in (y1, yb):
            update_config(thresholds=dataclasses.replace(
                th0, cholesky_blocked_min_dim=1 << 60))
            ref_v = float(dists.multi_normal_lpdf(y, mu, sigma))
            ref_g = jax.grad(
                lambda s: dists.multi_normal_lpdf(y, mu, 0.5 * (s + s.T))
            )(sigma)
            update_config(thresholds=dataclasses.replace(
                th0, cholesky_blocked_min_dim=1, cholesky_block_size=16))
            blk_v = float(dists.multi_normal_lpdf(y, mu, sigma))
            blk_g = jax.grad(
                lambda s: dists.multi_normal_lpdf(y, mu, 0.5 * (s + s.T))
            )(sigma)
            np.testing.assert_allclose(blk_v, ref_v, rtol=1e-10)
            np.testing.assert_allclose(
                np.asarray(blk_g), np.asarray(ref_g), rtol=1e-8, atol=1e-10
            )
    finally:
        update_config(thresholds=th0)


def test_masked_diagonal():
    from math_tpu.ops.linalg import masked_diagonal

    rng = np.random.default_rng(4)
    m = jnp.asarray(rng.normal(size=(2, 5, 5)))
    np.testing.assert_allclose(
        np.asarray(masked_diagonal(m)),
        np.diagonal(np.asarray(m), axis1=-2, axis2=-1),
    )
    g1 = jax.grad(lambda x: jnp.sum(jnp.log(masked_diagonal(x))))(m[0])
    g2 = jax.grad(
        lambda x: jnp.sum(jnp.log(jnp.diagonal(x, axis1=-2, axis2=-1)))
    )(m[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))


def test_vmapped_grad_through_symmetric_input():
    """Batched VJP parity vs XLA through a symmetric construction (the
    blocked adjoint's raw triangle layout is a documented convention
    difference; symmetric-input gradients must agree exactly)."""
    from math_tpu.ops.chol_pallas import cholesky_blocked_pallas

    rng = np.random.default_rng(5)
    n = 40
    xs = rng.normal(size=(3, n, n)) * 0.3

    def f_blocked(x):
        k = x @ jnp.swapaxes(x, -1, -2) + n * jnp.eye(n)
        return jnp.sum(cholesky_blocked_pallas(k, block_size=16))

    def f_ref(x):
        k = x @ jnp.swapaxes(x, -1, -2) + n * jnp.eye(n)
        return jnp.sum(jnp.linalg.cholesky(k))

    g_b = np.asarray(jax.vmap(jax.grad(f_blocked))(jnp.asarray(xs)))
    g_r = np.asarray(jax.vmap(jax.grad(f_ref))(jnp.asarray(xs)))
    np.testing.assert_allclose(g_b, g_r, rtol=1e-8, atol=1e-10)
