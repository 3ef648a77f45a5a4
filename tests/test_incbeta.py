"""inc_beta shape-parameter derivatives + hypergeometric gradients."""

import numpy as np
import pytest
import scipy.special as sp

import jax
import jax.numpy as jnp

from math_tpu.special import (
    grad_2F1,
    inc_beta,
    inc_beta_dda,
    inc_beta_ddb,
    inc_beta_ddz,
)
from math_tpu.testing import expect_ad, expect_near_rel


@pytest.mark.parametrize(
    "a,b,x",
    [(1.5, 2.0, 0.3), (0.5, 0.7, 0.6), (3.0, 4.0, 0.8), (2.0, 0.3, 0.9)],
)
def test_inc_beta_full_gradients(a, b, x):
    expect_near_rel(float(inc_beta(a, b, x)), sp.betainc(a, b, x), 1e-12)
    h = 1e-6
    fd_a = (sp.betainc(a + h, b, x) - sp.betainc(a - h, b, x)) / (2 * h)
    fd_b = (sp.betainc(a, b + h, x) - sp.betainc(a, b - h, x)) / (2 * h)
    fd_x = (sp.betainc(a, b, x + h) - sp.betainc(a, b, x - h)) / (2 * h)
    expect_near_rel(float(inc_beta_dda(a, b, x)), fd_a, 1e-5, "dda")
    expect_near_rel(float(inc_beta_ddb(a, b, x)), fd_b, 1e-5, "ddb")
    expect_near_rel(float(inc_beta_ddz(a, b, x)), fd_x, 1e-5, "ddz")
    # full expect_ad pass: rev == fwd == fd, jit/vmap consistent
    expect_ad(inc_beta, a, b, x, tol=1e-5)


def test_student_t_cdf_nu_gradient():
    """The differentiable inc_beta unlocks d/dnu of student_t_cdf."""
    from math_tpu.dists import student_t_cdf

    g = float(jax.grad(lambda n: student_t_cdf(1.3, n, 0.0, 1.0))(5.0))
    h = 1e-5
    from scipy.stats import t as st_t

    fd = (st_t.cdf(1.3, 5.0 + h) - st_t.cdf(1.3, 5.0 - h)) / (2 * h)
    expect_near_rel(g, fd, 1e-4)


def test_grad_2F1():
    a1, a2, b1, z = 1.2, 2.3, 3.1, 0.4
    ga, gb = grad_2F1(a1, a2, b1, z)
    h = 1e-6
    fda = (sp.hyp2f1(a1 + h, a2, b1, z) - sp.hyp2f1(a1 - h, a2, b1, z)) / (2 * h)
    fdb = (sp.hyp2f1(a1, a2, b1 + h, z) - sp.hyp2f1(a1, a2, b1 - h, z)) / (2 * h)
    expect_near_rel(float(ga), fda, 1e-7)
    expect_near_rel(float(gb), fdb, 1e-7)
