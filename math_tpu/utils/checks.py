"""Argument validation: the reference's ``check_*`` / ``is_*`` layer.

Reference: ``prim/{scal,mat,arr}/err/`` (~75 validators, SURVEY.md §2.2).
XLA cannot throw from compiled code, so the layer splits by when a check
can run:

- **Trace-time checks** (shapes, sizes, static structure): plain Python
  ``raise`` — free, faithful, and caught at trace/compile time exactly like
  Stan catches them at the call site.
- **Value checks** (positivity, finiteness, pos-definiteness): the ``is_*``
  predicates return traced booleans; ``check_*`` functions are *debug-mode*
  assertions via ``jax.debug.check`` style ``checkify``-free error funneling:
  under ``enable_debug_checks()`` they call ``jax.debug.callback`` to raise
  host-side; otherwise they are no-ops (densities already guard by
  returning -inf, matching sampler-facing semantics).

``CONSTRAINT_TOLERANCE`` matches the reference
(``prim/mat/err/constraint_tolerance.hpp``).
"""

from __future__ import annotations

import contextlib
import threading

import numpy as np

import jax
import jax.numpy as jnp

CONSTRAINT_TOLERANCE = 1e-8

_state = threading.local()


def debug_checks_enabled() -> bool:
    return getattr(_state, "enabled", False)


@contextlib.contextmanager
def enable_debug_checks():
    """Within this context, ``check_*`` raise host-side on violation."""
    prev = debug_checks_enabled()
    _state.enabled = True
    try:
        yield
    finally:
        _state.enabled = prev


# --- is_* predicates (traced booleans; ref: prim/*/err/is_*.hpp) ------------


def is_not_nan(x):
    return jnp.all(~jnp.isnan(jnp.asarray(x)))


def is_finite(x):
    return jnp.all(jnp.isfinite(jnp.asarray(x)))


def is_positive(x):
    return jnp.all(jnp.asarray(x) > 0)


def is_nonnegative(x):
    return jnp.all(jnp.asarray(x) >= 0)


def is_positive_finite(x):
    x = jnp.asarray(x)
    return jnp.all((x > 0) & jnp.isfinite(x))


def is_bounded(x, lb, ub):
    x = jnp.asarray(x)
    return jnp.all((x >= lb) & (x <= ub))


def is_prob(x):
    return is_bounded(x, 0.0, 1.0)


def is_less_or_equal(x, ub):
    return jnp.all(jnp.asarray(x) <= ub)


def is_greater_or_equal(x, lb):
    return jnp.all(jnp.asarray(x) >= lb)


def is_ordered(x):
    x = jnp.asarray(x)
    return jnp.all(jnp.diff(x, axis=-1) > 0)


def is_positive_ordered(x):
    x = jnp.asarray(x)
    return is_ordered(x) & jnp.all(x[..., 0] > 0)


def is_simplex(x, tol=CONSTRAINT_TOLERANCE):
    x = jnp.asarray(x)
    return jnp.all(x >= 0) & jnp.all(
        jnp.abs(jnp.sum(x, axis=-1) - 1.0) <= tol
    )


def is_unit_vector(x, tol=CONSTRAINT_TOLERANCE):
    x = jnp.asarray(x)
    return jnp.all(jnp.abs(jnp.sum(jnp.square(x), axis=-1) - 1.0) <= tol)


def is_symmetric(x, tol=CONSTRAINT_TOLERANCE):
    x = jnp.asarray(x)
    return jnp.all(jnp.abs(x - jnp.swapaxes(x, -1, -2)) <= tol)


def is_pos_definite(x):
    x = jnp.asarray(x)
    L = jnp.linalg.cholesky(x)
    return jnp.all(jnp.isfinite(jnp.diagonal(L, axis1=-2, axis2=-1)))


def is_corr_matrix(x, tol=CONSTRAINT_TOLERANCE):
    x = jnp.asarray(x)
    return (
        is_symmetric(x, tol)
        & is_pos_definite(x)
        & jnp.all(jnp.abs(jnp.diagonal(x, axis1=-2, axis2=-1) - 1.0) <= tol)
    )


def is_cholesky_factor(x, tol=CONSTRAINT_TOLERANCE):
    x = jnp.asarray(x)
    upper_zero = jnp.all(jnp.abs(jnp.triu(x, 1)) <= tol)
    return upper_zero & jnp.all(jnp.diagonal(x, axis1=-2, axis2=-1) > 0)


def is_cholesky_factor_corr(x, tol=CONSTRAINT_TOLERANCE):
    x = jnp.asarray(x)
    unit_rows = jnp.all(
        jnp.abs(jnp.sum(jnp.square(x), axis=-1) - 1.0) <= jnp.sqrt(tol)
    )
    return is_cholesky_factor(x, tol) & unit_rows


def is_square(x):
    x = jnp.asarray(x)
    return x.ndim >= 2 and x.shape[-1] == x.shape[-2]


def is_lower_triangular(x, tol=CONSTRAINT_TOLERANCE):
    return jnp.all(jnp.abs(jnp.triu(jnp.asarray(x), 1)) <= tol)


# --- check_* (trace-time raise for structure; debug callback for values) ----


def _value_check(pred, function, name, value, must):
    if not debug_checks_enabled():
        return
    def _raise(ok):
        if not bool(ok):
            raise ValueError(f"{function}: {name} must be {must}")

    jax.debug.callback(_raise, pred)


def check_size_match(function, name1, size1, name2, size2):
    if int(size1) != int(size2):
        raise ValueError(f"{function}: {name1} ({size1}) != {name2} ({size2})")


def check_consistent_sizes(function, *name_value_pairs):
    sizes = [
        (name, np.shape(v))
        for name, v in zip(name_value_pairs[::2], name_value_pairs[1::2])
    ]
    shapes = [s for _, s in sizes if s != ()]
    if shapes:
        try:
            np.broadcast_shapes(*shapes)
        except ValueError as e:
            raise ValueError(f"{function}: inconsistent sizes {sizes}") from e


def check_square(function, name, x):
    if not is_square(x):
        raise ValueError(f"{function}: {name} must be square, got {jnp.shape(x)}")


def check_vector(function, name, x):
    if jnp.ndim(x) != 1:
        raise ValueError(f"{function}: {name} must be a vector, got {jnp.shape(x)}")


def check_multiplier(function, name, x):
    check_positive(function, name, x)


def check_not_nan(function, name, x):
    _value_check(is_not_nan(x), function, name, x, "not nan")


def check_finite(function, name, x):
    _value_check(is_finite(x), function, name, x, "finite")


def check_positive(function, name, x):
    _value_check(is_positive(x), function, name, x, "positive")


def check_nonnegative(function, name, x):
    _value_check(is_nonnegative(x), function, name, x, "nonnegative")


def check_positive_finite(function, name, x):
    _value_check(is_positive_finite(x), function, name, x, "positive finite")


def check_bounded(function, name, x, lb, ub):
    _value_check(is_bounded(x, lb, ub), function, name, x, f"in [{lb}, {ub}]")


def check_less_or_equal(function, name, x, ub):
    _value_check(is_less_or_equal(x, ub), function, name, x, f"<= {ub}")


def check_greater_or_equal(function, name, x, lb):
    _value_check(is_greater_or_equal(x, lb), function, name, x, f">= {lb}")


def check_ordered(function, name, x):
    _value_check(is_ordered(x), function, name, x, "strictly ordered")


def check_simplex(function, name, x):
    _value_check(is_simplex(x), function, name, x, "a simplex")


def check_unit_vector(function, name, x):
    _value_check(is_unit_vector(x), function, name, x, "a unit vector")


def check_symmetric(function, name, x):
    check_square(function, name, x)
    _value_check(is_symmetric(x), function, name, x, "symmetric")


def check_pos_definite(function, name, x):
    check_square(function, name, x)
    _value_check(is_pos_definite(x), function, name, x, "positive definite")


def check_corr_matrix(function, name, x):
    check_square(function, name, x)
    _value_check(is_corr_matrix(x), function, name, x, "a correlation matrix")


def check_cholesky_factor(function, name, x):
    _value_check(is_cholesky_factor(x), function, name, x, "a Cholesky factor")


def check_cholesky_factor_corr(function, name, x):
    check_square(function, name, x)
    _value_check(
        is_cholesky_factor_corr(x), function, name, x,
        "a correlation Cholesky factor",
    )


def check_lower_triangular(function, name, x):
    _value_check(is_lower_triangular(x), function, name, x, "lower triangular")


def check_range(function, name, max_value, index):
    if not (1 <= int(index) <= int(max_value)):
        raise IndexError(
            f"{function}: {name} index {index} out of range [1, {max_value}]"
        )
