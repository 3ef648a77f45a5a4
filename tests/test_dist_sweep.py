"""Generated distribution sweep: multi-row valid/invalid tables, first- AND
second-order AD vs finite differences, cdf triples, far-tail log-cdf accuracy.

Analog of the reference's generated prob tests (``test/prob/``,
``test_fixture_distr.hpp:24-35`` valid/invalid rows and
``test_ad.hpp:113-130`` Hessian-vs-finite-difference) — see
``tests/dist_fixtures.py`` for the tables.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import math_tpu.dists as d
from math_tpu.testing import expect_ad, expect_near_rel

from dist_fixtures import CDFS, FAMS, TAILS


def _rows(fam):
    return [fam.args] + fam.rows


VALUE_CASES = [
    (fam, i, row) for fam in FAMS for i, row in enumerate(_rows(fam))
]


@pytest.mark.parametrize(
    "fam,i,row",
    VALUE_CASES,
    ids=[f"{fam.name}-{i}" for fam, i, _ in VALUE_CASES],
)
def test_valid_row_value(fam, i, row):
    got = float(fam.lp(*row))
    want = float(fam.oracle(*row))
    expect_near_rel(got, want, fam.val_tol, f"{fam.name} row {i}")


INVALID_CASES = [
    (fam, i, row) for fam in FAMS for i, row in enumerate(fam.invalid)
]


@pytest.mark.parametrize(
    "fam,i,row",
    INVALID_CASES,
    ids=[f"{fam.name}-bad{i}" for fam, i, _ in INVALID_CASES],
)
def test_invalid_row_rejected(fam, i, row):
    """Invalid arguments must poison the log-density (-inf, or nan where the
    invalidity is only detectable as a failed factorization).  This is the
    no-throw analog of the reference fixtures' invalid rows, which must make
    every instantiation throw."""
    v = float(fam.lp(*row))
    assert not np.isfinite(v) and v != np.inf, f"{fam.name} bad row {i}: {v}"


AD_FAMS = [f for f in FAMS if f.f is not None]

# AD legs sweep the base point AND every boundary-adjacent ad_row
# (generate_tests.cpp:33-54 sweeps many points; double-where Hessian NaNs
# live near support boundaries, which one interior point cannot see)
AD_CASES = [
    (fam, i, pt)
    for fam in AD_FAMS
    for i, pt in enumerate([fam.point] + fam.ad_rows)
]


@pytest.mark.parametrize(
    "fam,i,pt", AD_CASES, ids=[f"{fam.name}-p{i}" for fam, i, _ in AD_CASES]
)
def test_gradient_fd(fam, i, pt):
    # boundary rows use a relatively looser fd tolerance: the gradient
    # magnitude blows up ~1/y there and the fd probe loses digits
    tol = fam.grad_tol if i == 0 else max(fam.grad_tol, 2e-4)
    expect_ad(fam.f, *pt, tol=tol)


HESS_FAMS = [f for f in AD_FAMS if f.hess and not f.skip_hess]
HESS_CASES = [
    (fam, i, pt)
    for fam in HESS_FAMS
    for i, pt in enumerate([fam.point] + fam.ad_rows)
]


@pytest.mark.parametrize(
    "fam,i,pt",
    HESS_CASES,
    ids=[f"{fam.name}-p{i}" for fam, i, _ in HESS_CASES],
)
def test_hessian_fd(fam, i, pt):
    """Second-order sweep (ref: test_ad.hpp fvar<var>/fvar<fvar<var>> legs).

    Catches nan second derivatives from double-where masking, which
    first-order checks cannot see."""
    hess_tol = fam.hess_tol if i == 0 else max(fam.hess_tol, 5e-3)
    expect_ad(fam.f, *pt, tol=fam.grad_tol if i == 0 else 2e-4,
              hessian=True, hess_tol=hess_tol)


@pytest.mark.parametrize(
    "cf,i",
    [(cf, i) for cf in CDFS for i in range(1 + len(cf.rows))],
    ids=[f"{cf.name}-{i}" for cf in CDFS for i in range(1 + len(cf.rows))],
)
def test_cdf_triple_rows(cf, i):
    args = ([cf.args] + cf.rows)[i]
    want = np.asarray(cf.probs(*args), dtype=np.float64)
    # beta_proportion has lcdf/lccdf but no plain cdf, as in the reference
    cdf = getattr(d, cf.name + "_cdf", None)
    lcdf = getattr(d, cf.name + "_lcdf")
    lccdf = getattr(d, cf.name + "_lccdf")
    if cdf is not None:
        expect_near_rel(float(cdf(*args)), float(np.prod(want)), cf.tol, "cdf")
    expect_near_rel(float(lcdf(*args)), float(np.sum(np.log(want))), cf.tol, "lcdf")
    want_lccdf = (
        float(np.sum(cf.logsf(*args)))
        if cf.logsf is not None
        else float(np.sum(np.log1p(-want)))
    )
    expect_near_rel(float(lccdf(*args)), want_lccdf, 10 * cf.tol, "lccdf")


def _cdf_grad_view(name, kind, args):
    """(callable over float params, float params): integer/bool data args
    stay bound (Stan's int y is non-differentiable); float args — including
    continuous y — are differentiated."""
    fn = getattr(d, f"{name}_{kind}")
    is_f = [np.issubdtype(np.asarray(a).dtype, np.floating) for a in args]
    fixed = list(args)
    fidx = [i for i, ok in enumerate(is_f) if ok]

    def view(*params):
        full = list(fixed)
        for j, p in zip(fidx, params):
            full[j] = p
        return fn(*full)

    return view, [args[j] for j in fidx]


CDF_GRAD_CASES = [
    (cf, kind) for cf in CDFS for kind in ("lcdf", "lccdf")
]


@pytest.mark.parametrize(
    "cf,kind",
    CDF_GRAD_CASES,
    ids=[f"{cf.name}-{kind}" for cf, kind in CDF_GRAD_CASES],
)
def test_cdf_gradients(cf, kind):
    """lcdf/lccdf gradients vs finite differences (the reference's generated
    cdf fixtures AD-test these; truncated-data models differentiate lccdf —
    a tail-accurate VALUE with a garbage gradient would pass the value-only
    triples)."""
    view, params = _cdf_grad_view(cf.name, kind, cf.args)
    expect_ad(view, *params, tol=5e-5)


@pytest.mark.parametrize(
    "name,kind,args,want,tol",
    TAILS,
    ids=[f"{t[0]}-{t[1]}-tailgrad{i}" for i, t in enumerate(TAILS)],
)
def test_lcdf_tail_gradients(name, kind, args, want, tol):
    """Far-tail lcdf/lccdf gradients: finite (no masking NaNs) and
    rev == fwd.  fd is skipped here — the probe step crosses support
    boundaries (e.g. beta at 1-1e-9) or underflows at |y| ~ 1e8."""
    view, params = _cdf_grad_view(name, kind, args)
    x = [jnp.asarray(p, jnp.result_type(float)) for p in params]
    g_rev = jax.grad(lambda *p: view(*p), argnums=tuple(range(len(x))))(*x)
    g_fwd = jax.jacfwd(lambda *p: view(*p), argnums=tuple(range(len(x))))(*x)
    for r, f in zip(g_rev, g_fwd):
        assert np.isfinite(np.asarray(r)).all(), (name, kind, args, r)
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=1e-8, atol=1e-12
        )


@pytest.mark.parametrize(
    "name,kind,args,want,tol",
    TAILS,
    ids=[f"{t[0]}-{t[1]}-{i}" for i, t in enumerate(TAILS)],
)
def test_lcdf_tails(name, kind, args, want, tol):
    """Far-tail accuracy of lcdf/lccdf — what truncated-data models evaluate.

    The reference leans on Boost's continued-fraction/double-exponential
    implementations here (VERDICT Missing #7); the oracle is scipy's
    log-space cdf/sf, which is accurate in these regimes."""
    fn = getattr(d, f"{name}_{kind}")
    got = float(fn(*args))
    want = float(want)
    assert np.isfinite(got), f"{name}_{kind}{args} = {got}"
    expect_near_rel(got, want, tol, f"{name}_{kind}{args}")


def test_propto_grad_parity_all():
    """propto=True must differ only by a parameter-independent constant:
    gradients w.r.t. every differentiable argument agree (ref:
    include_summand semantics)."""
    for fam in AD_FAMS:
        # all-float-args gradient of lp(*args) vs lp(*args, propto=True)
        flt = [
            np.asarray(a, dtype=np.float64)
            for a in fam.args
            if np.issubdtype(np.asarray(a).dtype, np.floating)
        ]
        if not flt:
            continue
        idx = [
            i
            for i, a in enumerate(fam.args)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
        ]

        def call(parts, propto):
            full = list(fam.args)
            for j, p in zip(idx, parts):
                full[j] = p
            return fam.lp(*full, propto=propto)

        g0 = jax.grad(lambda ps: call(ps, False))(tuple(flt))
        g1 = jax.grad(lambda ps: call(ps, True))(tuple(flt))
        for a, b in zip(g0, g1):
            expect_near_rel(
                np.asarray(a), np.asarray(b), 1e-9, f"{fam.name} propto grad"
            )
