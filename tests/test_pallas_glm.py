"""Fused Pallas GLM kernels: parity vs the XLA path (interpret mode on CPU).

Analog of the reference's OpenCL-vs-CPU parity suite (SURVEY.md §4.5) for
all four fused families (ref: opencl/prim/{bernoulli_logit,poisson_log,
normal_id,neg_binomial_2_log}_glm_*).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu import dists
from math_tpu.ops import pallas_glm as pg

RNG = np.random.default_rng(0)
N, K, C = 3000, 7, 5
X = jnp.asarray(RNG.normal(size=(N, K)), jnp.float32)
B = jnp.asarray(RNG.normal(size=(K, C)) * 0.2, jnp.float32)
A = jnp.asarray(RNG.normal(size=(C,)) * 0.2, jnp.float32)
SIGMA = jnp.asarray(0.5 + RNG.uniform(size=C), jnp.float32)
PHI = jnp.asarray(1.0 + 3.0 * RNG.uniform(size=C), jnp.float32)

# y kept as NUMPY so include_summand prunes y-only constants exactly like
# the fused kernels (which treat y as data, matching Stan's int y).
Y_BERN = RNG.integers(0, 2, N).astype(np.float32)
Y_POIS = RNG.poisson(2.0, N).astype(np.float32)
Y_NORM = RNG.normal(size=N).astype(np.float32)
Y_NB = RNG.poisson(3.0, N).astype(np.float32)


def _case(family):
    """(fused_fn, chains_fn, xla_per_chain_fn, y, extra)"""
    if family == "bernoulli_logit":
        fn = lambda a, b: dists.bernoulli_logit_glm_lpmf(  # noqa: E731
            Y_BERN, X, a, b, propto=True
        )
        return (
            lambda y, x, a, b: pg.bernoulli_logit_glm_fused(y, x, a, b, True),
            pg.bernoulli_logit_glm_lpmf_chains,
            jax.vmap(fn, in_axes=(0, 1)),
            Y_BERN,
            None,
        )
    if family == "poisson_log":
        fn = lambda a, b: dists.poisson_log_glm_lpmf(  # noqa: E731
            Y_POIS, X, a, b, propto=True
        )
        return (
            lambda y, x, a, b: pg.poisson_log_glm_fused(y, x, a, b, True),
            pg.poisson_log_glm_lpmf_chains,
            jax.vmap(fn, in_axes=(0, 1)),
            Y_POIS,
            None,
        )
    if family == "normal_id":
        fn = lambda a, b, s: dists.normal_id_glm_lpdf(  # noqa: E731
            Y_NORM, X, a, b, s, propto=True
        )
        return (
            lambda y, x, a, b, e: pg.normal_id_glm_fused(y, x, a, b, e, True),
            pg.normal_id_glm_lpdf_chains,
            jax.vmap(fn, in_axes=(0, 1, 0)),
            Y_NORM,
            SIGMA,
        )
    fn = lambda a, b, p: dists.neg_binomial_2_log_glm_lpmf(  # noqa: E731
        Y_NB, X, a, b, p, propto=True
    )
    return (
        lambda y, x, a, b, e: pg.neg_binomial_2_log_glm_fused(y, x, a, b, e, True),
        pg.neg_binomial_2_log_glm_lpmf_chains,
        jax.vmap(fn, in_axes=(0, 1, 0)),
        Y_NB,
        PHI,
    )


FAMILIES = ["bernoulli_logit", "poisson_log", "normal_id", "neg_binomial_2_log"]


@pytest.mark.parametrize("family", FAMILIES)
def test_fused_value_parity(family):
    fused, _, ref, y, extra = _case(family)
    got = fused(y, X, A, B) if extra is None else fused(y, X, A, B, extra)
    want = ref(A, B) if extra is None else ref(A, B, extra)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3
    )


@pytest.mark.parametrize("family", FAMILIES)
def test_fused_grad_parity(family):
    """alpha/beta/extra gradients from the in-kernel partials vs traced XLA."""
    fused, _, ref, y, extra = _case(family)
    if extra is None:
        g_f = jax.grad(lambda a, b: jnp.sum(fused(y, X, a, b)), (0, 1))(A, B)
        g_x = jax.grad(lambda a, b: jnp.sum(ref(a, b)), (0, 1))(A, B)
    else:
        g_f = jax.grad(lambda a, b, e: jnp.sum(fused(y, X, a, b, e)), (0, 1, 2))(
            A, B, extra
        )
        g_x = jax.grad(lambda a, b, e: jnp.sum(ref(a, b, e)), (0, 1, 2))(
            A, B, extra
        )
    for f, x in zip(g_f, g_x):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(x), rtol=3e-4, atol=1e-3
        )


@pytest.mark.parametrize("family", ["bernoulli_logit", "normal_id"])
def test_fused_data_grad_parity(family):
    """Round-1 hazard (VERDICT weak #3): dx/dy must be EXACT, not silent
    zeros, when the caller differentiates the design matrix / response
    (ref: bernoulli_logit_glm_lpmf.hpp:112-137 computes dx when x is var)."""
    fused, _, _, y, extra = _case(family)
    yj = jnp.asarray(y)
    args = (A, B) if extra is None else (A, B, extra)

    def f_fused(yy, xx):
        return jnp.sum(fused(yy, xx, *args))

    # XLA reference built from the same propto=True formulation the
    # dispatcher falls back to
    chains = _case(family)[1]

    def f_xla(yy, xx):
        out = (
            chains(yy, xx, A, B)
            if extra is None
            else chains(yy, xx, A, B, extra)
        )
        return jnp.sum(out)

    gy_f, gx_f = jax.grad(f_fused, (0, 1))(yj, X)
    gy_x, gx_x = jax.grad(f_xla, (0, 1))(yj, X)
    assert float(jnp.abs(gx_f).max()) > 0.0  # not silently zero
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x), rtol=3e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_x), rtol=3e-4, atol=1e-3)


@pytest.mark.parametrize("family", FAMILIES)
def test_fused_row_masking(family):
    """N not a multiple of the block size: padded rows must not contribute."""
    n_odd = 1537
    fused, _, ref, y, extra = _case(family)
    Xo, yo = X[:n_odd], y[:n_odd]
    if extra is None:
        got = fused(yo, Xo, A, B)
        want = jax.vmap(
            lambda a, b: pg.__dict__[f"{family}_glm_lpmf_chains"](
                yo, Xo, a[None], b[:, None]
            )[0],
            in_axes=(0, 1),
        )(A, B)
    else:
        got = fused(yo, Xo, A, B, extra)
        nm = "lpdf" if family == "normal_id" else "lpmf"
        want = jax.vmap(
            lambda a, b, e: pg.__dict__[f"{family}_glm_{nm}_chains"](
                yo, Xo, a[None], b[:, None], e[None]
            )[0],
            in_axes=(0, 1, 0),
        )(A, B, extra)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3
    )


# --- ordered_logistic_glm (ref: opencl/kernels/ordered_logistic_glm_lpmf.hpp:42)

KCUT = 4  # K = 5 categories
CUTS = jnp.asarray(
    np.sort(RNG.normal(size=(KCUT, C)), axis=0) * 1.2, jnp.float32
)
Y_ORD = RNG.integers(1, KCUT + 2, N).astype(np.int32)  # classes 1..K


def _ordered_ref_per_chain(b, c):
    return dists.ordered_logistic_glm_lpmf(Y_ORD, X, b, c, propto=True)


def test_ordered_fused_value_parity():
    got = pg.ordered_logistic_glm_fused(jnp.asarray(Y_ORD), X, B, CUTS, True)
    want = jax.vmap(_ordered_ref_per_chain, in_axes=(1, 1))(B, CUTS)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3
    )


def test_ordered_fused_grad_parity():
    gf = jax.grad(
        lambda b, c: jnp.sum(
            pg.ordered_logistic_glm_fused(jnp.asarray(Y_ORD), X, b, c, True)
        ),
        (0, 1),
    )(B, CUTS)
    gx = jax.grad(
        lambda b, c: jnp.sum(
            jax.vmap(_ordered_ref_per_chain, in_axes=(1, 1))(b, c)
        ),
        (0, 1),
    )(B, CUTS)
    for f, x in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(x), rtol=3e-4, atol=1e-3
        )


def test_ordered_fused_data_grad_parity():
    def f_fused(xx):
        return jnp.sum(
            pg.ordered_logistic_glm_fused(jnp.asarray(Y_ORD), xx, B, CUTS, True)
        )

    def f_xla(xx):
        return jnp.sum(
            jax.vmap(
                lambda b, c: dists.ordered_logistic_glm_lpmf(
                    Y_ORD, xx, b, c, propto=True
                ),
                in_axes=(1, 1),
            )(B, CUTS)
        )

    gx_f = jax.grad(f_fused)(X)
    gx_x = jax.grad(f_xla)(X)
    assert float(jnp.abs(gx_f).max()) > 0.0
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_x), rtol=3e-4, atol=1e-3
    )


def test_ordered_fused_row_masking():
    n_odd = 1537
    got = pg.ordered_logistic_glm_fused(
        jnp.asarray(Y_ORD[:n_odd]), X[:n_odd], B, CUTS, True
    )
    want = jax.vmap(
        lambda b, c: dists.ordered_logistic_glm_lpmf(
            Y_ORD[:n_odd], X[:n_odd], b, c, propto=True
        ),
        in_axes=(1, 1),
    )(B, CUTS)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3
    )


def test_ordered_extreme_eta_stable():
    # far-out linear predictor: logp stays finite-or--inf, grads nan-free
    bx = 30.0 * B
    got = pg.ordered_logistic_glm_fused(jnp.asarray(Y_ORD), X, bx, CUTS, True)
    gb, gc = jax.grad(
        lambda b, c: jnp.sum(
            pg.ordered_logistic_glm_fused(jnp.asarray(Y_ORD), X, b, c, True)
        ),
        (0, 1),
    )(bx, CUTS)
    assert not np.isnan(np.asarray(got)).any()
    assert np.isfinite(np.asarray(gb)).all()
    assert np.isfinite(np.asarray(gc)).all()


# --- categorical_logit_glm (ref: opencl/kernels/categorical_logit_glm_lpmf.hpp:42,174)

KCLS = 5
A_CAT = jnp.asarray(RNG.normal(size=(C, KCLS)) * 0.3, jnp.float32)
B_CAT = jnp.asarray(RNG.normal(size=(C, K, KCLS)) * 0.2, jnp.float32)
Y_CAT = RNG.integers(1, KCLS + 1, N).astype(np.int32)


def _categorical_ref_all(a, b):
    return jax.vmap(
        lambda ac, bc: dists.categorical_logit_glm_lpmf(
            Y_CAT, X, ac, bc, propto=True
        )
    )(a, b)


def test_categorical_fused_value_parity():
    got = pg.categorical_logit_glm_fused(
        jnp.asarray(Y_CAT), X, A_CAT, B_CAT, True
    )
    want = _categorical_ref_all(A_CAT, B_CAT)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3
    )


def test_categorical_fused_grad_parity():
    gf = jax.grad(
        lambda a, b: jnp.sum(
            pg.categorical_logit_glm_fused(jnp.asarray(Y_CAT), X, a, b, True)
        ),
        (0, 1),
    )(A_CAT, B_CAT)
    gx = jax.grad(
        lambda a, b: jnp.sum(_categorical_ref_all(a, b)), (0, 1)
    )(A_CAT, B_CAT)
    for f, x in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(x), rtol=3e-4, atol=1e-3
        )


def test_categorical_fused_data_grad_parity():
    def f_fused(xx):
        return jnp.sum(
            pg.categorical_logit_glm_fused(jnp.asarray(Y_CAT), xx, A_CAT, B_CAT, True)
        )

    def f_xla(xx):
        return jnp.sum(
            jax.vmap(
                lambda ac, bc: dists.categorical_logit_glm_lpmf(
                    Y_CAT, xx, ac, bc, propto=True
                )
            )(A_CAT, B_CAT)
        )

    gx_f = jax.grad(f_fused)(X)
    gx_x = jax.grad(f_xla)(X)
    assert float(jnp.abs(gx_f).max()) > 0.0
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_x), rtol=3e-4, atol=1e-3
    )


def test_categorical_fused_row_masking():
    n_odd = 1537
    got = pg.categorical_logit_glm_fused(
        jnp.asarray(Y_CAT[:n_odd]), X[:n_odd], A_CAT, B_CAT, True
    )
    want = jax.vmap(
        lambda ac, bc: dists.categorical_logit_glm_lpmf(
            Y_CAT[:n_odd], X[:n_odd], ac, bc, propto=True
        )
    )(A_CAT, B_CAT)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3
    )


def test_new_chains_dispatchers_xla_path():
    # small problems dispatch to the XLA fallback with identical values
    got_o = np.asarray(
        pg.ordered_logistic_glm_lpmf_chains(jnp.asarray(Y_ORD), X, B, CUTS)
    )
    want_o = np.asarray(jax.vmap(_ordered_ref_per_chain, in_axes=(1, 1))(B, CUTS))
    np.testing.assert_allclose(got_o, want_o, rtol=1e-5)
    got_c = np.asarray(
        pg.categorical_logit_glm_lpmf_chains(jnp.asarray(Y_CAT), X, A_CAT, B_CAT)
    )
    want_c = np.asarray(_categorical_ref_all(A_CAT, B_CAT))
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5)


def test_dispatch_thresholds():
    # small problem: dispatches to XLA path (values match exactly)
    got = np.asarray(pg.bernoulli_logit_glm_lpmf_chains(jnp.asarray(Y_BERN), X, A, B))
    want = np.asarray(_case("bernoulli_logit")[2](A, B))
    np.testing.assert_allclose(got, want, rtol=1e-6)
