"""Generated broadcast-shape sweeps over ALL univariate densities.

Analog of the reference's generated instantiation sweeps
(``test/prob/generate_tests.cpp:33-54``, batched via ``make/tests``): for
every univariate family in the fixture registry, every argument-position
combination of {scalar, length-3 vector} must agree with 3x the all-scalar
evaluation, and gradients must hold at one mixed combination per family
(via the family's differentiable view, so int/data arguments stay
non-differentiable exactly like the reference's ``T_y=int`` slots).
"""

import numpy as np
import pytest

import math_tpu.dists as d  # noqa: F401  (families resolved via fixtures)
from dist_fixtures import FAMS
from math_tpu.testing import expect_ad, expect_near_rel

# Everything from `categorical` on takes vector/matrix-valued parameters
# (simplexes, cut vectors, covariance matrices, GLM design matrices) where
# per-argument scalar<->vector lifting is not meaningful; those families'
# shape behavior is pinned by their own fixture rows instead.
_NON_UNIVARIATE = {
    "categorical", "categorical_logit", "ordered_logistic",
    "ordered_probit", "multinomial", "multi_normal",
    "multi_normal_cholesky", "multi_normal_prec", "multi_student_t",
    "dirichlet", "wishart", "inv_wishart", "lkj_corr",
    "lkj_corr_cholesky", "lkj_cov", "multi_gp", "multi_gp_cholesky",
    "matrix_normal_prec", "gaussian_dlm_obs", "bernoulli_logit_glm",
    "poisson_log_glm", "neg_binomial_2_log_glm", "normal_id_glm",
    "ordered_logistic_glm", "categorical_logit_glm",
}

UNIVARIATE = [f for f in FAMS if f.name not in _NON_UNIVARIATE]


def test_univariate_family_count():
    """The sweep must cover all 38 reference univariate families."""
    assert len(UNIVARIATE) == 38, [f.name for f in UNIVARIATE]


def _scalarize(a):
    """First element of a fixture argument, preserving int-ness."""
    arr = np.asarray(a)
    v = arr.ravel()[0]
    if np.issubdtype(arr.dtype, np.integer):
        return int(v)
    return float(v)


@pytest.mark.parametrize("fam", UNIVARIATE, ids=[f.name for f in UNIVARIATE])
def test_broadcast_value_sweep(fam):
    """All 2^n scalar/vector argument combinations == 3x the scalar eval."""
    import itertools

    base = [_scalarize(a) for a in fam.args]
    scalar_val = float(np.asarray(fam.lp(*base)))
    assert np.isfinite(scalar_val), (fam.name, base, scalar_val)

    def lift(a, kind):
        return np.full(3, a) if kind else a

    for kinds in itertools.product([0, 1], repeat=len(base)):
        if not any(kinds):
            continue
        got = float(np.asarray(fam.lp(*[
            lift(a, k) for a, k in zip(base, kinds)
        ])))
        expect_near_rel(
            got, 3.0 * scalar_val, 1e-9, f"{fam.name} broadcast {kinds}"
        )


@pytest.mark.parametrize(
    "fam",
    [f for f in UNIVARIATE if f.f is not None],
    ids=[f.name for f in UNIVARIATE if f.f is not None],
)
def test_gradients_at_mixed_combo(fam):
    """AD vs finite differences at one mixed scalar/vector lift of the
    family's differentiable point (ints/data stay non-differentiable via
    the fixture's ``f`` closure, like the reference's int slots)."""
    lifted = []
    for i, a in enumerate(fam.point):
        arr = np.asarray(a, dtype=np.float64)
        if arr.ndim == 0 and i % 2 == 1:
            arr = np.full(3, float(arr))
        lifted.append(arr)
    expect_ad(fam.f, *lifted, tol=3e-5)


def test_mixed_vector_scalar_value():
    y = np.array([0.5, 1.5, 2.5])
    got = float(d.normal_lpdf(y, 1.0, np.array([1.0, 2.0, 3.0])))
    want = sum(
        float(d.normal_lpdf(float(yy), 1.0, float(ss)))
        for yy, ss in zip(y, [1.0, 2.0, 3.0])
    )
    assert abs(got - want) < 1e-10
