"""Broadcast-shape sweeps over representative densities.

Analog of the reference's generated instantiation sweeps (SURVEY.md §4.3):
every argument combination of {scalar, vector} must agree with the summed
scalar evaluation, and gradients must hold at a mixed combination.
"""

import numpy as np
import pytest

import math_tpu.dists as d
from math_tpu.testing import expect_ad_vectorized


CASES = [
    (d.normal_lpdf, (0.7, 0.2, 1.3)),
    (d.cauchy_lpdf, (0.7, 0.2, 1.3)),
    (d.gamma_lpdf, (0.7, 2.0, 1.5)),
    (d.beta_lpdf, (0.4, 2.0, 3.0)),
    (d.weibull_lpdf, (0.7, 2.0, 1.5)),
    (d.student_t_lpdf, (0.7, 4.0, 0.2, 1.3)),
    (d.gumbel_lpdf, (0.7, 0.2, 1.3)),
    (d.exponential_lpdf, (0.7, 1.7)),
    (d.logistic_lpdf, (0.7, 0.2, 1.3)),
    (d.von_mises_lpdf, (0.7, 0.2, 1.3)),
    (d.skew_normal_lpdf, (0.7, 0.2, 1.3, 2.0)),
]


@pytest.mark.parametrize("fn,args", CASES, ids=[c[0].__name__ for c in CASES])
def test_broadcast_sweep(fn, args):
    expect_ad_vectorized(lambda *a: fn(*a), *args, tol=3e-5)


def test_mixed_vector_scalar_value():
    y = np.array([0.5, 1.5, 2.5])
    got = float(d.normal_lpdf(y, 1.0, np.array([1.0, 2.0, 3.0])))
    want = sum(
        float(d.normal_lpdf(float(yy), 1.0, float(ss)))
        for yy, ss in zip(y, [1.0, 2.0, 3.0])
    )
    assert abs(got - want) < 1e-10
