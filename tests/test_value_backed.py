"""Value-backed parity: EVERY reference prob file name gets a value assertion.

Closes the "stub loophole" in ``tests/test_parity.py`` (which only checks
``callable``): here a registry maps each of the reference's prob names
(``prim/{scal,mat,arr}/prob/*.hpp``) to a concrete value check —
oracle comparison for densities/cdfs, alias equality for the deprecated
``*_log``/``*_cdf_log``/``*_ccdf_log`` forwarders (the reference's own
``_log`` files are one-line forwarders), and moment/support checks for rngs.
"""

import os

import numpy as np
import pytest
import scipy.special as sp

import jax

import math_tpu.dists as d
from math_tpu.testing import expect_near_rel

from dist_fixtures import CDFS, FAMS, MU3, OMEGA3, RNGS, SIGMA3, L3

REF = "/root/reference/stan/math/prim"


def _reference_names():
    fns = set()
    for sub in ("scal/prob", "mat/prob", "arr/prob"):
        p = os.path.join(REF, sub)
        if os.path.isdir(p):
            fns.update(f[:-4] for f in os.listdir(p) if f.endswith(".hpp"))
    return fns


REF_NAMES = _reference_names()

# ---------------------------------------------------------------------------
# build the registry: name -> zero-arg thunk performing a value assertion
# ---------------------------------------------------------------------------

CHECKS = {}


def _value_check(fam):
    def check():
        got = float(fam.lp(*fam.args))
        want = float(fam.oracle(*fam.args))
        expect_near_rel(got, want, max(fam.val_tol, 1e-7), fam.name)

    return check


def _alias_check(alias, canon, args):
    def check():
        a = float(getattr(d, alias)(*args))
        b = float(getattr(d, canon)(*args))
        expect_near_rel(a, b, 1e-12, f"{alias} == {canon}")
        # -inf is legitimate (e.g. lccdf at the top of a discrete support);
        # nan never is.
        assert not np.isnan(a), f"{alias}{args} is nan"

    return check


for fam in FAMS:
    lp_name = fam.lp.__name__
    CHECKS[lp_name] = _value_check(fam)
    log_name = fam.name + "_log"
    if log_name in REF_NAMES:
        CHECKS[log_name] = _alias_check(log_name, lp_name, fam.args)

# the reference also ships dirichlet_lpmf as an alias of the lpdf
CHECKS["dirichlet_lpmf"] = _alias_check(
    "dirichlet_lpmf",
    "dirichlet_lpdf",
    (np.array([0.2, 0.3, 0.5]), np.array([1.5, 2.0, 3.0])),
)


def _cdf_checks(cf):
    args = cf.args
    want = np.asarray(cf.probs(*args), dtype=np.float64)

    def cdf():
        expect_near_rel(
            float(getattr(d, cf.name + "_cdf")(*args)),
            float(np.prod(want)),
            cf.tol,
            cf.name + "_cdf",
        )

    def lcdf():
        expect_near_rel(
            float(getattr(d, cf.name + "_lcdf")(*args)),
            float(np.sum(np.log(want))),
            cf.tol,
            cf.name + "_lcdf",
        )

    def lccdf():
        # route through the log-space survival oracle when the family has
        # one (want==1 at the support top makes log1p(-want) warn)
        want_lccdf = (
            float(np.sum(cf.logsf(*args)))
            if cf.logsf is not None
            else float(np.sum(np.log1p(-want)))
        )
        expect_near_rel(
            float(getattr(d, cf.name + "_lccdf")(*args)),
            want_lccdf,
            10 * cf.tol,
            cf.name + "_lccdf",
        )

    return cdf, lcdf, lccdf


for cf in CDFS:
    cdf, lcdf, lccdf = _cdf_checks(cf)
    if cf.name + "_cdf" in REF_NAMES:
        CHECKS[cf.name + "_cdf"] = cdf
    CHECKS[cf.name + "_lcdf"] = lcdf
    CHECKS[cf.name + "_lccdf"] = lccdf
    CHECKS[cf.name + "_cdf_log"] = _alias_check(
        cf.name + "_cdf_log", cf.name + "_lcdf", cf.args
    )
    CHECKS[cf.name + "_ccdf_log"] = _alias_check(
        cf.name + "_ccdf_log", cf.name + "_lccdf", cf.args
    )


def _rng_check(name, args, stat, n=30_000):
    def check():
        key = jax.random.PRNGKey(sum(map(ord, name)))
        x = getattr(d, name + "_rng")(key, *args, shape=(n,))
        result = stat(np.asarray(x))
        assert result is None or result, f"{name}_rng stat failed"

    return check


for _name, (_args, _stat) in RNGS.items():
    CHECKS[_name + "_rng"] = _rng_check(_name, _args, _stat)


# multivariate / structured rngs need bespoke stats ---------------------------

def _reg(name, thunk):
    CHECKS[name] = thunk


_reg(
    "multi_normal_rng",
    lambda: expect_near_rel(
        np.asarray(
            d.multi_normal_rng(jax.random.PRNGKey(0), MU3, SIGMA3, shape=(30_000,))
        ).mean(0),
        MU3,
        0.06,
        "multi_normal_rng mean",
    ),
)
_reg(
    "multi_normal_cholesky_rng",
    lambda: expect_near_rel(
        np.asarray(
            d.multi_normal_cholesky_rng(jax.random.PRNGKey(1), MU3, L3, shape=(30_000,))
        ).mean(0),
        MU3,
        0.06,
        "multi_normal_cholesky_rng mean",
    ),
)
_reg(
    "multi_normal_prec_rng",
    lambda: expect_near_rel(
        np.asarray(
            d.multi_normal_prec_rng(jax.random.PRNGKey(2), MU3, OMEGA3, shape=(30_000,))
        ).mean(0),
        MU3,
        0.06,
        "multi_normal_prec_rng mean",
    ),
)
_reg(
    "multi_student_t_rng",
    lambda: expect_near_rel(
        np.asarray(
            d.multi_student_t_rng(
                jax.random.PRNGKey(3), 7.0, MU3, SIGMA3, shape=(30_000,)
            )
        ).mean(0),
        MU3,
        0.1,
        "multi_student_t_rng mean",
    ),
)
_reg(
    "dirichlet_rng",
    lambda: expect_near_rel(
        np.asarray(
            d.dirichlet_rng(
                jax.random.PRNGKey(4), np.array([1.5, 2.0, 3.0]), shape=(30_000,)
            )
        ).mean(0),
        np.array([1.5, 2.0, 3.0]) / 6.5,
        0.01,
        "dirichlet_rng mean",
    ),
)


def _multinomial_rng_check():
    y = np.asarray(
        d.multinomial_rng(
            jax.random.PRNGKey(5), np.array([0.2, 0.3, 0.5]), 10, shape=(20_000,)
        )
    )
    assert (y.sum(-1) == 10).all()
    expect_near_rel(y.mean(0), 10 * np.array([0.2, 0.3, 0.5]), 0.03, "multinomial mean")


_reg("multinomial_rng", _multinomial_rng_check)


def _wishart_rng_check():
    w = np.asarray(d.wishart_rng(jax.random.PRNGKey(6), 7.0, SIGMA3, shape=(8_000,)))
    expect_near_rel(w.mean(0), 7.0 * SIGMA3, 0.25, "wishart_rng mean")


_reg("wishart_rng", _wishart_rng_check)


def _inv_wishart_rng_check():
    w = np.asarray(
        d.inv_wishart_rng(jax.random.PRNGKey(7), 9.0, SIGMA3, shape=(8_000,))
    )
    expect_near_rel(w.mean(0), SIGMA3 / (9.0 - 3 - 1), 0.3, "inv_wishart_rng mean")


_reg("inv_wishart_rng", _inv_wishart_rng_check)


def _lkj_corr_rng_check():
    y = np.asarray(d.lkj_corr_rng(jax.random.PRNGKey(8), 3, 2.0, shape=(4_000,)))
    assert np.abs(np.diagonal(y, axis1=-2, axis2=-1) - 1).max() < 1e-6
    assert abs(y[:, 1, 0].mean()) < 0.05


_reg("lkj_corr_rng", _lkj_corr_rng_check)


def _lkj_corr_cholesky_rng_check():
    L = np.asarray(
        d.lkj_corr_cholesky_rng(jax.random.PRNGKey(9), 3, 2.0, shape=(4_000,))
    )
    y = L @ np.swapaxes(L, -1, -2)
    assert np.abs(np.diagonal(y, axis1=-2, axis2=-1) - 1).max() < 1e-6
    assert abs(y[:, 1, 0].mean()) < 0.05


_reg("lkj_corr_cholesky_rng", _lkj_corr_cholesky_rng_check)


def _matrix_normal_prec_rng_check():
    mu = np.arange(6.0).reshape(2, 3)
    y = np.asarray(
        d.matrix_normal_prec_rng(
            jax.random.PRNGKey(10), mu, np.eye(2) * 2.0, OMEGA3, shape=(20_000,)
        )
    )
    expect_near_rel(y.mean(0), mu, 0.06, "matrix_normal_prec_rng mean")


_reg("matrix_normal_prec_rng", _matrix_normal_prec_rng_check)


def _gaussian_dlm_obs_rng_check():
    n, r, T = 3, 2, 8
    F = np.ones((n, r)) * 0.5
    G = 0.8 * np.eye(n)
    y = np.asarray(
        d.gaussian_dlm_obs_rng(
            jax.random.PRNGKey(11), F, G, np.eye(r) * 0.4, np.eye(n) * 0.3,
            np.zeros(n), np.eye(n), T,
        )
    )
    assert y.shape == (r, T) and np.isfinite(y).all()


_reg("gaussian_dlm_obs_rng", _gaussian_dlm_obs_rng_check)


def _bernoulli_logit_glm_rng_check():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 3))
    beta = np.array([0.5, -0.3, 0.8])
    p = sp.expit(x @ beta + 0.4)
    y = np.asarray(
        d.bernoulli_logit_glm_rng(
            jax.random.PRNGKey(12), x, 0.4, beta, shape=(20_000, 4)
        )
    )
    expect_near_rel(y.mean(0), p, 0.02, "bernoulli_logit_glm_rng mean")


_reg("bernoulli_logit_glm_rng", _bernoulli_logit_glm_rng_check)


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_every_reference_name_has_a_value_check():
    missing = sorted(n for n in REF_NAMES if n not in CHECKS)
    assert not missing, f"{len(missing)} names lack value checks: {missing}"


_RUN = sorted(CHECKS)


@pytest.mark.parametrize("name", _RUN, ids=_RUN)
def test_value_check(name):
    CHECKS[name]()
