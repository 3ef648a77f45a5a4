"""Behavioral sweep of the check_*/is_* validation layer.

The reference tests every validator with passing AND failing values
(test/unit/math/prim/*/err/, ~75 files); the name-level inventory lives in
test_stan_surface.py — this file asserts actual behavior: each value check
raises under enable_debug_checks() on a violating input, passes on a valid
one, and is a no-op outside debug mode; structural checks raise eagerly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from math_tpu.utils import checks

GOOD_CORR = np.array([[1.0, 0.3], [0.3, 1.0]])
BAD_CORR = np.array([[1.0, 1.5], [1.5, 1.0]])  # not PSD
GOOD_CHOL = np.array([[1.0, 0.0], [0.5, 2.0]])
BAD_CHOL = np.array([[1.0, 0.7], [0.5, 2.0]])  # upper junk
GOOD_CHOL_CORR = np.array([[1.0, 0.0], [0.6, 0.8]])

# (check name, passing args, failing args) — all value-level validators
VALUE_CASES = [
    ("check_not_nan", (1.0,), (np.nan,)),
    ("check_finite", (1.0,), (np.inf,)),
    ("check_positive", (2.0,), (0.0,)),
    ("check_nonnegative", (0.0,), (-1e-9,)),
    ("check_positive_finite", (2.0,), (np.inf,)),
    ("check_bounded", (0.5, 0.0, 1.0), (1.5, 0.0, 1.0)),
    ("check_less_or_equal", (1.0, 1.0), (1.1, 1.0)),
    ("check_greater_or_equal", (1.0, 1.0), (0.9, 1.0)),
    ("check_greater", (1.1, 1.0), (1.0, 1.0)),
    ("check_less", (0.9, 1.0), (1.0, 1.0)),
    ("check_ordered", (np.array([1.0, 2.0, 3.0]),), (np.array([1.0, 1.0]),)),
    ("check_positive_ordered", (np.array([1.0, 2.0]),), (np.array([-1.0, 2.0]),)),
    ("check_simplex", (np.array([0.3, 0.7]),), (np.array([0.5, 0.6]),)),
    ("check_unit_vector", (np.array([0.6, 0.8]),), (np.array([1.0, 1.0]),)),
    ("check_symmetric", (GOOD_CORR,), (np.array([[1.0, 2.0], [0.0, 1.0]]),)),
    ("check_pos_definite", (GOOD_CORR,), (BAD_CORR,)),
    ("check_corr_matrix", (GOOD_CORR,), (BAD_CORR,)),
    ("check_cholesky_factor", (GOOD_CHOL,), (BAD_CHOL,)),
    ("check_cholesky_factor_corr", (GOOD_CHOL_CORR,), (GOOD_CHOL,)),
    ("check_lower_triangular", (GOOD_CHOL,), (BAD_CHOL,)),
    ("check_prob", (0.4,), (1.4,)) if hasattr(checks, "check_prob") else None,
]
VALUE_CASES = [c for c in VALUE_CASES if c is not None]


@pytest.mark.parametrize(
    "name,good,bad", VALUE_CASES, ids=[c[0] for c in VALUE_CASES]
)
def test_value_check_behavior(name, good, bad):
    fn = getattr(checks, name)
    args_good = tuple(jnp.asarray(a) for a in good)
    args_bad = tuple(jnp.asarray(a) for a in bad)
    # no-op outside debug mode, even on violating values
    fn("f", "x", *args_bad)
    with checks.enable_debug_checks():
        fn("f", "x", *args_good)  # valid input must NOT raise
        jax.effects_barrier()
        with pytest.raises(Exception):
            fn("f", "x", *args_bad)
            jax.effects_barrier()


STRUCT_CASES = [
    ("check_square", (np.zeros((2, 3)),)),
    ("check_vector", (np.zeros((2, 2)),)),
    ("check_nonzero_size", (np.zeros((0,)),)),
    ("check_nonempty", (np.zeros((0,)),)),
]


@pytest.mark.parametrize(
    "name,bad", STRUCT_CASES, ids=[c[0] for c in STRUCT_CASES]
)
def test_structural_check_raises_eagerly(name, bad):
    fn = getattr(checks, name)
    with pytest.raises(Exception):
        fn("f", "x", *bad)


def test_value_check_inside_jit():
    """Debug checks funnel through jax.debug.callback, so they fire from
    compiled code too (the Stan-like development mode)."""

    @jax.jit
    def f(x):
        checks.check_positive("f", "x", x)
        return x * 2

    with checks.enable_debug_checks():
        f(jnp.asarray(2.0)).block_until_ready()
        jax.effects_barrier()
        with pytest.raises(Exception):
            f(jnp.asarray(-1.0)).block_until_ready()
            jax.effects_barrier()
