"""Blocked Cholesky factorization built from scan + MXU matmuls.

ref: ``rev/mat/fun/cholesky_decompose.hpp`` (cholesky_block, the blocked
Murray adjoint) and the OpenCL offload path
(``opencl/kernels/cholesky_decompose.hpp``, ``tri_inverse`` pieces) with
its size-threshold dispatch (``opencl_context.hpp:164-183``).

Why not ``jnp.linalg.cholesky`` everywhere: XLA:TPU's cholesky/
triangular-solve lowerings compile pathologically slowly through the
remote-compile relay for n ~ 2000 (observed: 187 s for one chol+VJP; a
full NUTS program embedding several instances crashes the TPU worker).
This implementation uses only ``lax.scan`` and dense matmuls:

- diagonal blocks: unblocked scan over columns (rank-1 updates, VPU);
- panel solves: explicit triangular inverse of the (small) diagonal
  block by forward-substitution scan, then one MXU matmul — the same
  diag_inv + multiply trick the reference's OpenCL path uses;
- trailing updates: plain matmuls (MXU).

The resulting HLO is a handful of While loops + dots: compiles in
seconds, runs at XLA-cholesky speed, and reverse-differentiates through
``scan`` without any custom lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _chol_unblocked(a):
    """Cholesky of a small (B, B) SPD block via a column scan.

    Column k of L is fixed per step with masked rank-1 trailing update:
    a_next = a - outer(col_k, col_k) restricted to the trailing block.
    """
    n = a.shape[-1]
    idx = jnp.arange(n)

    def step(mat, k):
        # non-PSD input must yield NaN (NUTS rejects on nan/-inf logp), not
        # finite garbage; the padded identity tail has pivot == 1 so the
        # guard never triggers for valid inputs
        p2 = mat[..., k, k]
        pivot = jnp.where(p2 > 0, jnp.sqrt(jnp.where(p2 > 0, p2, 1.0)), jnp.nan)
        col = mat[..., :, k] / pivot
        col = jnp.where(idx >= k, col, 0.0)  # zero above the diagonal
        trailing = jnp.where(idx > k, col, 0.0)
        mat = mat - trailing[..., :, None] * trailing[..., None, :]
        return mat, col

    _, cols = lax.scan(step, a, idx)
    # cols: (n, ..., n) with leading scan axis = column index
    L = jnp.moveaxis(cols, 0, -1)
    return L


def _tri_inv_unblocked(L):
    """Inverse of a small lower-triangular block by forward substitution.

    Row scan: X[k, :] = (I[k, :] - L[k, :k] @ X[:k, :]) / L[k, k], carried
    as a full matrix with masked updates (ref: the OpenCL ``diag_inv``
    kernel's role).
    """
    n = L.shape[-1]
    idx = jnp.arange(n)
    eye = jnp.eye(n, dtype=L.dtype)

    def step(X, k):
        lk = jnp.where(idx < k, L[..., k, :], 0.0)  # row k, strictly left
        row = (eye[k] - jnp.einsum("...j,...jm->...m", lk, X)) / L[..., k, k][..., None]
        X = jnp.where((idx == k)[:, None], row[..., None, :], X)
        return X, None

    X0 = jnp.zeros_like(L)
    X, _ = lax.scan(step, X0, idx)
    return X


def cholesky_blocked(a, block_size: int = 256):
    """Lower Cholesky factor of SPD ``a`` via right-looking blocked scan.

    ref: ``cholesky_decompose.hpp`` blocked variant; block size follows the
    reference's max(M/8, 8)..128 heuristic scaled to MXU tiles.  Handles
    any n by padding to a block multiple with an identity tail.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    nb = max(1, -(-n // block_size))
    npad = nb * block_size - n
    if npad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, npad), (0, npad)])
        tail = jnp.arange(n, n + npad)
        a = a.at[..., tail, tail].set(1.0)

    B = block_size
    L = jnp.zeros_like(a)
    # full-f32 matmuls: bf16 trailing updates lose the PSD margin and feed
    # negative diagonals into the unblocked factorization
    with jax.default_matmul_precision("float32"):
        for j in range(nb):
            s = j * B
            prior = L[..., s : s + B, :s]
            d = a[..., s : s + B, s : s + B] - prior @ jnp.swapaxes(prior, -1, -2)
            Ljj = _chol_unblocked(d)
            L = L.at[..., s : s + B, s : s + B].set(Ljj)
            if j + 1 < nb:
                rows = L[..., s + B :, :s]
                off = a[..., s + B :, s : s + B] - rows @ jnp.swapaxes(prior, -1, -2)
                # panel = off @ Ljj^{-T}: triangular solve as inverse+matmul
                panel = off @ jnp.swapaxes(_tri_inv_unblocked(Ljj), -1, -2)
                L = L.at[..., s + B :, s : s + B].set(panel)
    if npad:
        L = L[..., :n, :n]
    return L


def _tri_solve_impl(L, b, B):
    """Blocked forward substitution on padded operands; also returns the
    per-block triangular inverses so the adjoint's upper solve is pure
    matmuls."""
    nb = L.shape[-1] // B
    y = jnp.zeros_like(b)
    winvs = []
    with jax.default_matmul_precision("float32"):
        for j in range(nb):
            s = j * B
            rhs = b[..., s : s + B, :] - L[..., s : s + B, :s] @ y[..., :s, :]
            winv = _tri_inv_unblocked(L[..., s : s + B, s : s + B])
            winvs.append(winv)
            y = y.at[..., s : s + B, :].set(winv @ rhs)
    return y, winvs


def _tri_upper_solve_winv(L, winvs, b, B):
    """x with Lᵀ x = b by block back substitution, (Lᵀ)_jj⁻¹ = winv_jᵀ."""
    sw = lambda m: jnp.swapaxes(m, -1, -2)
    x = jnp.zeros_like(b)
    with jax.default_matmul_precision("float32"):
        for j in reversed(range(len(winvs))):
            s = j * B
            rhs = b[..., s : s + B, :] - sw(L[..., s + B :, s : s + B]) @ x[
                ..., s + B :, :
            ]
            x = x.at[..., s : s + B, :].set(sw(winvs[j]) @ rhs)
    return x


from functools import partial as _partial


def _tri_lower_solve_winv(L, winvs, b, B):
    """y with L y = b by block forward substitution over SAVED block
    inverses (no re-inversion)."""
    y = jnp.zeros_like(b)
    with jax.default_matmul_precision("float32"):
        for j in range(len(winvs)):
            s = j * B
            rhs = b[..., s : s + B, :] - L[..., s : s + B, :s] @ y[..., :s, :]
            y = y.at[..., s : s + B, :].set(winvs[j] @ rhs)
    return y


# AD wiring (r5): custom_jvp, not custom_vjp, so any differentiation
# order works.  The rule dy = L⁻¹(db − tril(dL) y) is linear in the
# tangents; its transpose is exactly the old hand bwd — b̄ = L⁻ᵀ ȳ
# (block upper solve with the saved inverses), L̄ = tril(−b̄ yᵀ) —
# tracing back through the substitution loop instead is the same
# 18x-slower pattern as the Cholesky glue.
@_partial(jax.custom_jvp, nondiff_argnums=(2,))
def _tri_solve_vjp(L, b, B):
    return _tri_solve_impl(L, b, B)[0]


@_tri_solve_vjp.defjvp
def _tri_solve_jvp(B, primals, tangents):
    L, b = primals
    dL, db = tangents
    y, winvs = _tri_solve_impl(L, b, B)
    with jax.default_matmul_precision("float32"):
        rhs = db - jnp.tril(dL) @ y
    dy = _tri_lower_solve_winv(L, winvs, rhs, B)
    return y, dy


def mdivide_left_tri_low_blocked(L, b, block_size: int = 256):
    """L^{-1} b for lower-triangular L via blocked forward substitution.

    Same motivation as ``cholesky_blocked``: XLA:TPU's triangular_solve
    lowering compiles pathologically at n ~ 2000 through the remote
    relay; this formulation is nb small triangular inverses (scan) plus
    MXU matmuls and compiles in seconds, with a block-substitution
    adjoint.  ref: mdivide_left_tri_low.hpp.
    """
    L = jnp.asarray(L)
    b = jnp.asarray(b)
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    n = L.shape[-1]
    nb = max(1, -(-n // block_size))
    npad = nb * block_size - n
    if npad:
        L = jnp.pad(L, [(0, 0)] * (L.ndim - 2) + [(0, npad), (0, npad)])
        tail = jnp.arange(n, n + npad)
        L = L.at[..., tail, tail].set(1.0)
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, npad), (0, 0)])
    y = _tri_solve_vjp(L, b, block_size)
    if npad:
        y = y[..., :n, :]
    return y[..., 0] if vec else y


def mdivide_left_tri_low_tpu(L, b, threshold: int | None = None,
                             block_size: int | None = None):
    """Size-dispatched lower-triangular solve: XLA's lowering below the
    blocked-cholesky threshold, the blocked substitution above it (the
    same compile-pathology dispatch as ``cholesky_decompose_tpu``)."""
    from math_tpu.config import get_config

    th = get_config().thresholds
    threshold = th.cholesky_blocked_min_dim if threshold is None else threshold
    block_size = th.cholesky_block_size if block_size is None else block_size
    n = jnp.shape(L)[-1]
    if n >= threshold:
        return mdivide_left_tri_low_blocked(L, b, block_size=block_size)
    import jax.scipy.linalg as jsl

    return jsl.solve_triangular(L, b, lower=True)


def spd_solve_logdiag_tpu(a, b, threshold: int | None = None,
                          block_size: int | None = None):
    """(chol(a)⁻¹ b, Σ log diag chol(a)) — the O(n³) core of a
    multi-normal / marginal-GP log density, size-dispatched: XLA
    lowerings below the blocked threshold, the fused Pallas blocked
    factorization (block inverses reused for the solve and the joint
    adjoint) above it.  ref: multi_normal_lpdf.hpp's LDLT reuse."""
    from math_tpu.config import get_config

    th = get_config().thresholds
    threshold = th.cholesky_blocked_min_dim if threshold is None else threshold
    block_size = th.cholesky_block_size if block_size is None else block_size
    n = jnp.shape(a)[-1]
    if n >= threshold:
        from math_tpu.ops.chol_pallas import cholesky_solve_logdiag_pallas

        return cholesky_solve_logdiag_pallas(a, b, block_size=block_size)
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(a)
    y = jsl.solve_triangular(L, b, lower=True)
    s = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return y, s


def cholesky_decompose_tpu(a, threshold: int | None = None, block_size: int | None = None):
    """Size-dispatched Cholesky: XLA's lowering below ``threshold``, the
    scan-blocked factorization above it (≙ the reference's
    ``cholesky_size_worth_transfer`` OpenCL dispatch,
    ``opencl_context.hpp:168``).  Defaults from ``config.KernelThresholds``."""
    from math_tpu.config import get_config

    th = get_config().thresholds
    threshold = th.cholesky_blocked_min_dim if threshold is None else threshold
    block_size = th.cholesky_block_size if block_size is None else block_size
    n = jnp.shape(a)[-1]
    if n >= threshold:
        if jax.default_backend() == "tpu":
            # VMEM-resident diagonal-block kernel with chain batching +
            # blocked Murray adjoint: 34 ms fwd+VJP at n=2000 C=8, 123 ms
            # at C=32 (3.8 ms/chain) vs ~100 ms/chain for the scan
            # formulation (v5e, r3; and no interpret penalty)
            from math_tpu.ops.chol_pallas import cholesky_blocked_pallas

            return cholesky_blocked_pallas(a, block_size=block_size)
        return cholesky_blocked(a, block_size=block_size)
    return jnp.linalg.cholesky(a)
