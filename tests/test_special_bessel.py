"""Bessel J/Y/I/K and incomplete-function gradients vs scipy oracles.

Mirrors the reference's boost-backed tests for bessel_first_kind.hpp,
bessel_second_kind.hpp, modified_bessel_{first,second}_kind.hpp,
grad_reg_inc_gamma.hpp, grad_reg_lower_inc_gamma.hpp, F32.hpp.
"""

import numpy as np
import pytest
import scipy.special as ss

import jax

from math_tpu.special import (
    F32,
    bessel_first_kind,
    bessel_second_kind,
    grad_inc_beta,
    grad_reg_inc_gamma,
    grad_reg_lower_inc_gamma,
    modified_bessel_first_kind,
    modified_bessel_second_kind,
)

NS = np.array([0, 1, 2, 3, 5, 8, 10, 15])
XS = np.array([1e-3, 0.1, 0.5, 1.0, 3.0, 10.0, 30.0, 80.0, 200.0, 600.0, 2000.0])


def _grid():
    n, x = np.meshgrid(NS, XS, indexing="ij")
    return n, x


@pytest.mark.parametrize(
    "ours, ref",
    [
        (bessel_first_kind, ss.jv),
        (bessel_second_kind, ss.yv),
        (modified_bessel_first_kind, ss.iv),
        (modified_bessel_second_kind, ss.kv),
    ],
    ids=["J", "Y", "I", "K"],
)
def test_bessel_grid(ours, ref):
    n, x = _grid()
    got = np.asarray(ours(n, x))
    want = ref(n, x)
    # I_n overflows f64 at large x in both implementations; compare only the
    # finite entries (inf - inf would poison the rel-err array with NaNs) and
    # require overflow agreement elsewhere.
    finite = np.isfinite(want)
    assert np.array_equal(np.isfinite(got), finite)
    rel = np.zeros_like(want)
    np.divide(
        np.abs(np.where(finite, got, 0.0) - np.where(finite, want, 0.0)),
        np.maximum(np.abs(np.where(finite, want, 1.0)), 1e-280),
        out=rel,
        where=finite,
    )
    assert rel.max() < 1e-8, rel.max()


def test_bessel_reflections():
    assert np.isclose(float(bessel_first_kind(2, -5.0)), ss.jv(2, -5.0))
    assert np.isclose(float(bessel_first_kind(-3, 5.0)), ss.jv(-3, 5.0))
    assert np.isclose(float(bessel_second_kind(-2, 3.0)), ss.yv(-2, 3.0))
    assert np.isclose(float(modified_bessel_first_kind(3, -7.0)), ss.iv(3, -7.0))
    assert float(bessel_first_kind(0, 0.0)) == 1.0
    assert float(bessel_first_kind(2, 0.0)) == 0.0
    assert np.isnan(float(bessel_second_kind(1, -1.0)))
    assert np.isnan(float(modified_bessel_second_kind(1, 0.0)))


@pytest.mark.parametrize(
    "fn, dref",
    [
        (bessel_first_kind, ss.jvp),
        (bessel_second_kind, ss.yvp),
        (modified_bessel_first_kind, ss.ivp),
        (modified_bessel_second_kind, ss.kvp),
    ],
    ids=["J", "Y", "I", "K"],
)
def test_bessel_gradients(fn, dref):
    for n, x in [(0, 2.5), (3, 0.7), (5, 40.0), (2, 600.0)]:
        g = float(jax.grad(lambda z: fn(n, z))(x))
        want = dref(n, x)
        assert abs(g - want) / max(abs(want), 1e-300) < 1e-6, (n, x, g, want)


def test_grad_reg_inc_gamma_grid():
    h = 1e-6
    for a in [0.3, 0.5, 1.0, 2.5, 5.0, 11.0, 20.0, 50.0]:
        for z in [0.0, 1e-3, 0.1, 1.0, 5.0, 10.0, 25.0, 40.0, 80.0]:
            fd = (ss.gammainc(a + h, z) - ss.gammainc(a - h, z)) / (2 * h)
            gl = float(grad_reg_lower_inc_gamma(a, z))
            gu = float(grad_reg_inc_gamma(a, z))
            assert abs(gl - fd) < 1e-4 * max(abs(fd), 1e-4), (a, z)
            assert abs(gu + fd) < 1e-4 * max(abs(fd), 1e-4), (a, z)


def test_F32_dilogarithm_identity():
    # 3F2(1,1,1; 2,2; z) = Li2(z) / z
    for z in [0.1, 0.5, 0.9]:
        got = float(F32(1.0, 1.0, 1.0, 2.0, 2.0, z))
        want = ss.spence(1 - z) / z
        assert abs(got - want) < 1e-12


def test_grad_inc_beta_vs_fd():
    def B(a, b, z):
        return ss.beta(a, b) * ss.betainc(a, b, z)

    h = 1e-6
    for a, b, z in [(0.5, 0.7, 0.3), (2.0, 3.0, 0.6), (5.0, 1.5, 0.9)]:
        g1, g2 = grad_inc_beta(a, b, z)
        fd1 = (B(a + h, b, z) - B(a - h, b, z)) / (2 * h)
        fd2 = (B(a, b + h, z) - B(a, b - h, z)) / (2 * h)
        assert abs(float(g1) - fd1) < 1e-5 * max(abs(fd1), 1.0)
        assert abs(float(g2) - fd2) < 1e-5 * max(abs(fd2), 1.0)
