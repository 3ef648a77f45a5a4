"""Second-order AD sweep for custom-derivative specials and transforms.

The reference instantiates EVERY function at fvar<var> / fvar<fvar<var>>
(test/unit/math/test_ad.hpp:1106-1204; 274 mix test files); the density
layer already gets this via tests/test_dist_sweep.py.  This file covers the
remaining highest-NaN-risk code — hand-written derivative rules
(custom_jvp, quadrature partials, where-masked series) in special/ and the
constrain/free pairs — at interior AND boundary-adjacent points, where
double-where second-derivative hazards actually fire.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from math_tpu import special as sp
from math_tpu import transforms as tf
from math_tpu.testing import expect_ad

# --- specials with hand-written derivative rules -----------------------------
# (fn-returning-scalar, args, tol, hess_tol)

SPECIAL_CASES = [
    # inc_beta: custom_jvp with tanh-sinh quadrature partials
    # (special/incbeta.py; ref: inc_beta.hpp + grad_reg_inc_beta.hpp)
    # grad tol 1e-4: the a/b partials are tanh-sinh quadratures, fd noise
    # at 1e-6 steps sits just above 1e-5 relative
    ("inc_beta_interior", lambda a, b, x: sp.inc_beta(a, b, x),
     (0.7, 1.3, 0.4), 1e-4, 2e-3),
    ("inc_beta_left", lambda a, b, x: sp.inc_beta(a, b, x),
     (2.0, 3.0, 0.02), 1e-4, 2e-3),
    ("inc_beta_right", lambda a, b, x: sp.inc_beta(a, b, x),
     (2.0, 3.0, 0.98), 1e-4, 2e-3),
    # grad_2F1: the reference's log-space series (grad_2F1.hpp:35-90) is a
    # quadrature/series hybrid here; 2nd order of its sum = 3rd of 2F1
    ("grad_2F1", lambda a1, a2, b1: jnp.asarray(
        sp.grad_2F1(a1, a2, b1, 0.3)).sum(),
     (1.1, 0.9, 1.5), 1e-4, 5e-3),
    ("F32", lambda a1, a2, a3: sp.F32(a1, a2, a3, 2.1, 1.9, 0.4),
     (1.2, 0.8, 1.1), 1e-5, 1e-3),
    ("grad_inc_beta", lambda a, b: jnp.asarray(
        sp.grad_inc_beta(a, b, 0.6)).sum(),
     (2.0, 3.0), 5e-4, 5e-3),
    ("grad_reg_inc_gamma", lambda a, z: sp.grad_reg_inc_gamma(a, z),
     (2.5, 1.5), 5e-4, 5e-3),
    ("grad_reg_lower_inc_gamma", lambda a, z: sp.grad_reg_lower_inc_gamma(a, z),
     (2.5, 1.5), 5e-4, 5e-3),
    # owens_t: Gauss-Legendre panels (special/owens_t.py; ref: owens_t.hpp)
    ("owens_t_interior", lambda h, a: sp.owens_t(h, a),
     (0.8, 0.5), 1e-5, 1e-3),
    ("owens_t_neg_a", lambda h, a: sp.owens_t(h, a),
     (2.0, -1.0), 1e-5, 1e-3),
    ("owens_t_small_a", lambda h, a: sp.owens_t(h, a),
     (0.5, 1e-3), 1e-5, 1e-3),
    # bessels: quadrature + Hankel-series switchovers (special/bessel.py)
    ("bessel_J", lambda z: sp.bessel_first_kind(2, z), (2.5,), 1e-5, 1e-3),
    ("bessel_Y", lambda z: sp.bessel_second_kind(1, z), (3.0,), 1e-5, 1e-3),
    ("bessel_I", lambda z: sp.modified_bessel_first_kind(2, z),
     (1.8,), 1e-5, 1e-3),
    ("bessel_K", lambda z: sp.modified_bessel_second_kind(1, z),
     (2.2,), 1e-5, 1e-3),
    ("log_modified_bessel_I", lambda v, z: sp.log_modified_bessel_first_kind(v, z),
     (1.3, 2.0), 1e-5, 2e-3),
    # where-masked log-space helpers
    ("log_mix", lambda t, l1, l2: sp.log_mix(t, l1, l2),
     (0.3, -1.2, -2.3), 1e-5, 1e-4),
    ("log1m_exp", lambda x: sp.log1m_exp(x), (-0.5,), 1e-5, 1e-4),
    ("log1m_exp_near0", lambda x: sp.log1m_exp(x), (-1e-4,), 1e-4, 5e-2),
    ("log_diff_exp", lambda a, b: sp.log_diff_exp(a, b),
     (1.0, 0.2), 1e-5, 1e-4),
    ("multiply_log", lambda a, b: sp.multiply_log(a, b),
     (1.5, 2.5), 1e-5, 1e-4),
    ("lbeta", lambda a, b: sp.lbeta(a, b), (2.5, 0.7), 1e-5, 1e-4),
    ("lmgamma", lambda x: sp.lmgamma(3, x), (4.2,), 1e-5, 1e-4),
    ("gamma_p", lambda a, z: sp.gamma_p(a, z), (2.0, 1.5), 1e-4, 5e-3),
    ("gamma_q", lambda a, z: sp.gamma_q(a, z), (2.0, 1.5), 1e-4, 5e-3),
    ("Phi_tail", lambda x: sp.Phi(x), (-4.0,), 1e-5, 1e-3),
    ("log_Phi_tail", lambda x: sp.log_Phi(x), (-8.0,), 1e-5, 1e-3),
    ("inv_Phi", lambda p: sp.inv_Phi(p), (0.975,), 1e-5, 1e-3),
    ("trigamma", lambda x: sp.trigamma(x), (1.7,), 1e-5, 1e-3),
    ("owens_t_big_h", lambda h, a: sp.owens_t(h, a), (6.0, 0.7), 1e-5, 1e-3),
    ("log_falling_factorial", lambda x, n: sp.log_falling_factorial(x, n),
     (5.5, 2.5), 1e-5, 1e-4),
    ("log_rising_factorial", lambda x, n: sp.log_rising_factorial(x, n),
     (5.5, 2.5), 1e-5, 1e-4),
    ("log_inv_logit_diff", lambda x, y: sp.log_inv_logit_diff(x, y),
     (1.2, 0.3), 1e-5, 1e-4),
]


@pytest.mark.parametrize(
    "name,f,point,tol,hess_tol",
    SPECIAL_CASES,
    ids=[c[0] for c in SPECIAL_CASES],
)
def test_special_second_order(name, f, point, tol, hess_tol):
    expect_ad(f, *point, tol=tol, hessian=True, hess_tol=hess_tol)


# --- constrain/free pairs -----------------------------------------------------
# Scalarized: sum(constrained) + logdetJ, differentiated w.r.t. the free
# params; the lp accumulation is exactly what NUTS differentiates twice in
# Riemannian-like settings and what dense-metric warmup senses.

RNG = np.random.default_rng(42)
V4 = RNG.normal(size=4) * 0.8
V6 = RNG.normal(size=6) * 0.8
V9 = RNG.normal(size=9) * 0.6  # cov_matrix k=3: k + k(k-1)/2 = 6 -> use 6
V3 = RNG.normal(size=3) * 0.8

TRANSFORM_CASES = [
    ("lb", lambda x: _lpsum(tf.lb_constrain_lp(x, 0.5)), (0.7,)),
    ("ub", lambda x: _lpsum(tf.ub_constrain_lp(x, 2.0)), (0.7,)),
    ("lub", lambda x: _lpsum(tf.lub_constrain_lp(x, -1.0, 2.0)), (0.7,)),
    ("lub_far", lambda x: _lpsum(tf.lub_constrain_lp(x, -1.0, 2.0)), (12.0,)),
    ("offset_multiplier",
     lambda x: _lpsum(tf.offset_multiplier_constrain_lp(x, 1.0, 2.5)), (0.7,)),
    ("positive", lambda x: _lpsum(tf.positive_constrain_lp(x)), (0.7,)),
    ("prob", lambda x: _lpsum(tf.prob_constrain_lp(x)), (0.7,)),
    ("prob_far", lambda x: _lpsum(tf.prob_constrain_lp(x)), (-11.0,)),
    ("corr", lambda x: _lpsum(tf.corr_constrain_lp(x)), (0.7,)),
    # 4.0 not 7.0: past tanh saturation 1-z^2 ~ 4e-7 and the fd probe of
    # the hessian is pure cancellation noise; 4.0 is still boundary-adjacent
    ("corr_far", lambda x: _lpsum(tf.corr_constrain_lp(x)), (4.0,)),
    ("ordered", lambda x: _lpsum(tf.ordered_constrain_lp(x)), (V4,)),
    ("positive_ordered",
     lambda x: _lpsum(tf.positive_ordered_constrain_lp(x)), (V4,)),
    ("simplex", lambda x: _lpsum(tf.simplex_constrain_lp(x)), (V4,)),
    ("simplex_far", lambda x: _lpsum(tf.simplex_constrain_lp(x)),
     (np.array([8.0, -8.0, 5.0, -5.0]),)),
    ("unit_vector", lambda x: _lpsum(tf.unit_vector_constrain_lp(x)), (V4,)),
    ("cholesky_corr",
     lambda x: _lpsum(tf.cholesky_corr_constrain_lp(x, 4)), (V6,)),
    ("cholesky_factor",
     lambda x: _lpsum(tf.cholesky_factor_constrain_lp(x, 3, 3)), (V6,)),
    ("corr_matrix",
     lambda x: _lpsum(tf.corr_matrix_constrain_lp(x, 3)), (V3,)),
    ("cov_matrix",
     lambda x: _lpsum(tf.cov_matrix_constrain_lp(x, 3)), (V6,)),
    ("cov_matrix_lkj",
     lambda x: _lpsum(tf.cov_matrix_constrain_lkj_lp(x, 3)), (V6,)),
]


def _lpsum(out):
    val, lp = out
    return jnp.sum(val) + lp


@pytest.mark.parametrize(
    "name,f,point", TRANSFORM_CASES, ids=[c[0] for c in TRANSFORM_CASES]
)
def test_transform_second_order(name, f, point):
    expect_ad(f, *point, tol=1e-5, hessian=True, hess_tol=5e-4)
