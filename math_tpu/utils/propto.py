"""Trace-time analog of Stan's ``include_summand`` constant-term pruning.

Reference behavior (``prim/scal/meta/include_summand.hpp``): when a density
is evaluated with ``propto=true``, any summand whose operands are all plain
``double``s (no autodiff ``var``/``fvar``) is dropped at compile time.

TPU-native equivalent: under JAX everything is traced, but we can still
distinguish *host constants* (Python/numpy values baked into the trace) from
*JAX values* (arrays/tracers that may carry gradients).  Data passed as
numpy arrays — the common pattern for fixed observations — therefore gets
its constant terms pruned exactly like Stan's ``double`` arguments, while
anything flowing through ``jit``/``grad`` keeps every term it touches.
"""

from __future__ import annotations

import numpy as np

import jax


def is_autodiff(x) -> bool:
    """True when ``x`` is a JAX value that could carry gradients.

    Trace-time analog of Stan's ``!is_constant_all<T>`` (ref:
    ``prim/scal/meta/is_constant.hpp``): floating-point JAX arrays and
    tracers count; Python floats, numpy arrays, and integer arrays do not.
    """
    if isinstance(x, jax.core.Tracer):
        return np.issubdtype(jax.numpy.result_type(x), np.floating)
    if isinstance(x, jax.Array):
        return np.issubdtype(x.dtype, np.floating)
    return False


def include_summand(propto: bool, *args) -> bool:
    """Whether a term depending only on ``args`` must be kept.

    ``include_summand(propto)`` with no args gates pure normalization
    constants (e.g. ``-0.5*log(2*pi)``).  Mirrors
    ``include_summand<propto, T...>::value`` (ref:
    ``prim/scal/meta/include_summand.hpp``).
    """
    if not propto:
        return True
    return any(is_autodiff(a) for a in args)
