"""Special functions: values vs scipy, AD vs finite differences.

Model: the reference's expect_ad sweeps (test/unit/math/test_ad.hpp) plus
value checks against an independent oracle (scipy plays the role of Boost).
"""

import numpy as np
import pytest
import scipy.special as sp

import jax.numpy as jnp

import math_tpu.special as ms
from math_tpu.testing import expect_ad, expect_near_rel


def test_log1m_exp_values():
    x = np.array([-1e-8, -0.1, -0.5, -0.6931, -1.0, -10.0, -50.0])
    got = np.asarray(ms.log1m_exp(x))
    want = np.log(-np.expm1(x))
    expect_near_rel(got, want, 1e-12)


def test_log1m_exp_domain():
    assert np.isnan(float(ms.log1m_exp(0.5)))


def test_log_diff_exp():
    got = float(ms.log_diff_exp(2.0, 1.0))
    want = np.log(np.exp(2.0) - np.exp(1.0))
    expect_near_rel(got, want, 1e-12)


def test_owens_t_values():
    hs = np.array([0.0625, 0.5, 1.0, 2.0, 4.0, 0.1])
    aas = np.array([0.25, 0.5, 1.0, 2.0, 10.0, 0.999])
    for h in hs:
        for a in aas:
            got = float(ms.owens_t(h, a))
            want = float(sp.owens_t(h, a))
            expect_near_rel(got, want, 1e-10, f"owens_t({h},{a})")


def test_owens_t_symmetry():
    assert np.isclose(float(ms.owens_t(-1.3, 0.7)), float(sp.owens_t(-1.3, 0.7)))
    assert np.isclose(float(ms.owens_t(1.3, -0.7)), float(sp.owens_t(1.3, -0.7)))


def test_owens_t_grad():
    expect_ad(lambda h, a: ms.owens_t(h, a), 0.8, 0.6)
    expect_ad(lambda h, a: ms.owens_t(h, a), 1.5, 2.5)


def test_log_i0():
    for z in [0.1, 1.0, 5.0, 20.0, 100.0]:
        expect_near_rel(float(ms.log_i0(z)), float(np.log(sp.i0(z))), 1e-10)


def test_log_modified_bessel_first_kind():
    for v in [0.0, 0.5, 1.5, 3.0]:
        for z in [0.5, 2.0, 10.0]:
            got = float(ms.log_modified_bessel_first_kind(v, z))
            want = float(np.log(sp.iv(v, z)))
            expect_near_rel(got, want, 1e-8, f"log_iv({v},{z})")


def test_lchoose():
    expect_near_rel(float(ms.lchoose(10.0, 3.0)), np.log(120.0), 1e-12)


def test_lmultiply_zero():
    assert float(ms.multiply_log(0.0, 0.0)) == 0.0


def test_inv_Phi_roundtrip():
    p = np.array([0.01, 0.3, 0.5, 0.975])
    expect_near_rel(np.asarray(ms.Phi(ms.inv_Phi(p))), p, 1e-12)


def test_Phi_approx_close():
    x = np.linspace(-3, 3, 13)
    assert np.max(np.abs(np.asarray(ms.Phi_approx(x)) - sp.ndtr(x))) < 2e-3


@pytest.mark.parametrize(
    "f,args",
    [
        (ms.log1p_exp, (0.3,)),
        (ms.log1m_exp, (-0.3,)),
        (ms.log1m_exp, (-2.0,)),
        (ms.log_inv_logit, (0.7,)),
        (ms.lbeta, (2.0, 3.0)),
        (ms.lmgamma, (3, 4.5)),
        (ms.log_i0, (2.0,)),
        (ms.trigamma, (1.7,)),
    ],
)
def test_expect_ad_specials(f, args):
    if f is ms.lmgamma:
        expect_ad(lambda x: ms.lmgamma(3, x), 4.5)
    else:
        expect_ad(f, *args)


def test_log_mix():
    got = float(ms.log_mix(0.3, -1.0, -2.0))
    want = np.log(0.3 * np.exp(-1.0) + 0.7 * np.exp(-2.0))
    expect_near_rel(got, want, 1e-12)
    expect_ad(ms.log_mix, 0.3, -1.0, -2.0)
