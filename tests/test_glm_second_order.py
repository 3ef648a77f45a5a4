"""Second-order AD through the fused Pallas GLM path (interpret on CPU).

The reference guarantees fvar<var>/fvar<fvar<var>> Hessians through every
density including the fused GLM likelihoods (mix/mat/functor/
hessian.hpp:42-66; mix-mode prob instantiations via
test/prob/generate_tests.cpp:33-54's _fv/_ffv suffixes).  r5 rewired the
kernels from one-shot custom_vjp to a two-level custom_jvp so jax.hessian
(and any higher order) works through the dispatched fused path; these
tests pin that for all 6 families against the plain-XLA formulation.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.ops import pallas_glm as pg

RNG = np.random.default_rng(7)
N, K, C = 640, 4, 3
X = jnp.asarray(RNG.normal(size=(N, K)), jnp.float32)
B0 = jnp.asarray(RNG.normal(size=(K, C)) * 0.2, jnp.float32)
A0 = jnp.asarray(RNG.normal(size=(C,)) * 0.2, jnp.float32)
E0 = jnp.asarray(0.6 + RNG.uniform(size=C), jnp.float32)
Y_BERN = jnp.asarray(RNG.integers(0, 2, N), jnp.float32)
Y_POIS = jnp.asarray(RNG.poisson(2.0, N), jnp.float32)
Y_NORM = jnp.asarray(RNG.normal(size=N), jnp.float32)
Y_NB = jnp.asarray(RNG.poisson(3.0, N), jnp.float32)


def _unpack(p, has_extra):
    a = p[:C]
    b = p[C : C + K * C].reshape(K, C)
    e = p[C + K * C :] if has_extra else None
    return a, b, e


def _pair(family):
    """(fused scalar fn, xla scalar fn, p0) over a flat parameter vector."""
    if family == "bernoulli_logit":
        y, has_extra = Y_BERN, False
        fused = lambda y_, x_, a, b, e: pg.bernoulli_logit_glm_fused(  # noqa: E731
            y_, x_, a, b, True
        )
    elif family == "poisson_log":
        y, has_extra = Y_POIS, False
        fused = lambda y_, x_, a, b, e: pg.poisson_log_glm_fused(  # noqa: E731
            y_, x_, a, b, True
        )
    elif family == "normal_id":
        y, has_extra = Y_NORM, True
        fused = lambda y_, x_, a, b, e: pg.normal_id_glm_fused(  # noqa: E731
            y_, x_, a, b, e, True
        )
    else:
        y, has_extra = Y_NB, True
        fused = lambda y_, x_, a, b, e: pg.neg_binomial_2_log_glm_fused(  # noqa: E731
            y_, x_, a, b, e, True
        )

    xla = {
        "bernoulli_logit": lambda a, b, e: pg.bernoulli_logit_glm_lpmf_chains(
            y, X, a, b
        ),
        "poisson_log": lambda a, b, e: pg.poisson_log_glm_lpmf_chains(
            y, X, a, b
        ),
        "normal_id": lambda a, b, e: pg.normal_id_glm_lpdf_chains(
            y, X, a, b, e
        ),
        "neg_binomial_2_log": (
            lambda a, b, e: pg.neg_binomial_2_log_glm_lpmf_chains(
                y, X, a, b, e
            )
        ),
    }[family]

    def f_fused(p):
        a, b, e = _unpack(p, has_extra)
        return jnp.sum(fused(y, X, a, b, e))

    def f_xla(p):
        a, b, e = _unpack(p, has_extra)
        return jnp.sum(xla(a, b, e))

    parts = [A0, B0.ravel()] + ([E0] if has_extra else [])
    return f_fused, f_xla, jnp.concatenate(parts)


@pytest.mark.parametrize(
    "family",
    ["bernoulli_logit", "poisson_log", "normal_id", "neg_binomial_2_log"],
)
def test_hessian_matches_xla(family):
    f_fused, f_xla, p0 = _pair(family)
    # gradients must still be the fused single-pass ones
    g1 = np.asarray(jax.grad(f_fused)(p0))
    g2 = np.asarray(jax.grad(f_xla)(p0))
    np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-3)
    h1 = np.asarray(jax.hessian(f_fused)(p0))
    h2 = np.asarray(jax.hessian(f_xla)(p0))
    scale = np.abs(h2).max()
    np.testing.assert_allclose(h1, h2, rtol=5e-4, atol=5e-4 * scale)


def test_third_order_and_grad_of_grad():
    f_fused, f_xla, p0 = _pair("bernoulli_logit")
    # reverse-over-reverse
    gg1 = np.asarray(jax.grad(lambda p: jnp.sum(jax.grad(f_fused)(p) ** 2))(p0))
    gg2 = np.asarray(jax.grad(lambda p: jnp.sum(jax.grad(f_xla)(p) ** 2))(p0))
    np.testing.assert_allclose(gg1, gg2, rtol=1e-3, atol=1e-4)
    # third order: grad of the Hessian trace
    t1 = np.asarray(
        jax.grad(lambda p: jnp.trace(jax.hessian(f_fused)(p)))(p0)
    )
    t2 = np.asarray(jax.grad(lambda p: jnp.trace(jax.hessian(f_xla)(p)))(p0))
    np.testing.assert_allclose(t1, t2, rtol=1e-3, atol=1e-3 * max(1e-6, np.abs(t2).max()))


def test_hessian_wrt_x_data():
    """Reference supports x as var (bernoulli_logit_glm_lpmf.hpp:112-137):
    second order w.r.t. a slice of the design matrix must also work."""
    xs = X[:8]

    def f(xrows, a, b):
        xx = jnp.concatenate([xrows, X[8:]], axis=0)
        return jnp.sum(pg.bernoulli_logit_glm_fused(Y_BERN, xx, a, b, True))

    def f_ref(xrows, a, b):
        xx = jnp.concatenate([xrows, X[8:]], axis=0)
        return jnp.sum(pg.bernoulli_logit_glm_lpmf_chains(Y_BERN, xx, a, b))

    h1 = np.asarray(jax.hessian(f)(xs, A0, B0))
    h2 = np.asarray(jax.hessian(f_ref)(xs, A0, B0))
    np.testing.assert_allclose(h1, h2, rtol=1e-3, atol=1e-4)


def test_hessian_ordered_and_categorical():
    yo = jnp.asarray(RNG.integers(1, 5, N), jnp.int32)  # K=4 categories
    cuts0 = jnp.asarray(
        np.sort(RNG.normal(size=(3, C)), axis=0), jnp.float32
    )

    def f_ord(p):
        b = p[: K * C].reshape(K, C)
        cu = p[K * C :].reshape(3, C)
        return jnp.sum(pg.ordered_logistic_glm_fused(yo, X, b, cu, True))

    def f_ord_xla(p):
        b = p[: K * C].reshape(K, C)
        cu = p[K * C :].reshape(3, C)
        return jnp.sum(pg.ordered_logistic_glm_lpmf_chains(yo, X, b, cu))

    p0 = jnp.concatenate([B0.ravel(), cuts0.ravel()])
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_ord)(p0)), np.asarray(jax.grad(f_ord_xla)(p0)),
        rtol=5e-4, atol=5e-3,
    )
    h1 = np.asarray(jax.hessian(f_ord)(p0))
    h2 = np.asarray(jax.hessian(f_ord_xla)(p0))
    np.testing.assert_allclose(h1, h2, rtol=1e-3, atol=1e-3 * np.abs(h2).max())

    kcls = 4
    ac0 = jnp.asarray(RNG.normal(size=(C, kcls)) * 0.2, jnp.float32)
    bc0 = jnp.asarray(RNG.normal(size=(C, K, kcls)) * 0.2, jnp.float32)

    def f_cat(p):
        a = p[: C * kcls].reshape(C, kcls)
        b = p[C * kcls :].reshape(C, K, kcls)
        return jnp.sum(pg.categorical_logit_glm_fused(yo, X, a, b, True))

    def f_cat_xla(p):
        a = p[: C * kcls].reshape(C, kcls)
        b = p[C * kcls :].reshape(C, K, kcls)
        return jnp.sum(pg.categorical_logit_glm_lpmf_chains(yo, X, a, b))

    pc0 = jnp.concatenate([ac0.ravel(), bc0.ravel()])
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_cat)(pc0)), np.asarray(jax.grad(f_cat_xla)(pc0)),
        rtol=5e-4, atol=5e-3,
    )
    h1 = np.asarray(jax.hessian(f_cat)(pc0))
    h2 = np.asarray(jax.hessian(f_cat_xla)(pc0))
    np.testing.assert_allclose(h1, h2, rtol=1e-3, atol=1e-3 * np.abs(h2).max())


def test_hessian_through_dispatched_path():
    """The threshold dispatcher must be Hessian-capable exactly where the
    fused branch engages (the r4 verdict's live probe)."""
    from math_tpu.config import get_config, update_config

    th0 = get_config().thresholds
    update_config(
        thresholds=dataclasses.replace(
            th0, glm_pallas_min_rows=1, glm_pallas_min_chains=1,
            glm_pallas_min_chains_per_family={},
        )
    )
    try:

        def f(p):
            a, b, _ = _unpack(p, False)
            return jnp.sum(
                pg.bernoulli_logit_glm_lpmf_chains(
                    Y_BERN, X, a, b, interpret=True
                )
            )

        h = np.asarray(jax.hessian(f)(jnp.concatenate([A0, B0.ravel()])))
        assert np.isfinite(h).all() and np.abs(h).max() > 0
    finally:
        update_config(thresholds=th0)
