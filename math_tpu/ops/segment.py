"""Segment (grouped-index) reductions lowered onto the MXU.

Hierarchical models index group effects by an integer array
(``a[county]``) and their gradients scatter-add back
(``segment_sum(dmu, county)``).  On TPU, XLA lowers gather/scatter to
serialized dynamic-slice loops — measured 1.7-1.9x slower than expressing
the SAME contraction as a one-hot matmul, which rides the MXU and whose
VJP is the transposed matmul (the scatter-add for free).  The one-hot
construction is loop-invariant in the index data, so XLA hoists it out of
sampling scans: building it in-jit costs nothing steady-state.

This is the TPU analog of the reference's grouped ``operands_and_partials``
accumulation (e.g. ``neg_binomial_2_log_glm_lpmf.hpp``'s per-group partial
sums); there is no reference file for it because CPU gathers are cheap.
"""

from __future__ import annotations

import jax.numpy as jnp


def onehot_matrix(idx, num_segments, dtype=jnp.float32):
    """(N, num_segments) one-hot membership matrix for integer indices.

    Concrete ``idx`` data makes this a constant; traced (jit-operand)
    ``idx`` is built once per program and hoisted out of inner scan loops
    by XLA's loop-invariant code motion.
    """
    idx = jnp.asarray(idx)
    seg = jnp.arange(num_segments, dtype=idx.dtype)
    return (idx[:, None] == seg[None, :]).astype(dtype)


def segment_gather(values, idx, num_segments):
    """values[idx] as a one-hot matmul: (S,) or (S, K) -> (N,) or (N, K).

    Equivalent to ``values[idx]`` but lowers to an MXU matmul whose VJP is
    the transposed matmul (an MXU segment-sum instead of a scatter-add).
    """
    M = onehot_matrix(idx, num_segments, jnp.result_type(values))
    return M @ values


def segment_sum(values, idx, num_segments):
    """sum of values rows per segment as a one-hot matmul: the MXU lowering
    of ``jax.ops.segment_sum`` for moderate segment counts."""
    M = onehot_matrix(idx, num_segments, jnp.result_type(values))
    return M.T @ values
