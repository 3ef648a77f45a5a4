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


@pytest.mark.parametrize("fam", AD_FAMS, ids=[f.name for f in AD_FAMS])
def test_gradient_fd(fam):
    expect_ad(fam.f, *fam.point, tol=fam.grad_tol)


HESS_FAMS = [f for f in AD_FAMS if f.hess and not f.skip_hess]


@pytest.mark.parametrize("fam", HESS_FAMS, ids=[f.name for f in HESS_FAMS])
def test_hessian_fd(fam):
    """Second-order sweep (ref: test_ad.hpp fvar<var>/fvar<fvar<var>> legs).

    Catches nan second derivatives from double-where masking, which
    first-order checks cannot see."""
    expect_ad(fam.f, *fam.point, tol=fam.grad_tol, hessian=True,
              hess_tol=fam.hess_tol)


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
