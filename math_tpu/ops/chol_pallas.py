"""Pallas TPU kernel: fused diagonal-block Cholesky + triangular inverse.

ref: ``rev/mat/fun/cholesky_decompose.hpp`` (cholesky_block) and the
OpenCL blocked kernels ``opencl/kernels/cholesky_decompose.hpp`` +
``diag_inv`` (tri_inverse) — the same decomposition of the factorization
into {small diagonal-block factor, diagonal-block inverse, MXU panel
multiply, MXU trailing update}.

Motivation (measured, v5e): the pure-``lax.scan`` formulation in
``ops/cholesky.py`` round-trips its (B, B) carry through HBM on each of
2·B sequential steps, costing ~100 ms per 2000-dim factorization+VJP.
Here each diagonal block's 2·B-step loop runs in ONE kernel with the
block resident in VMEM; everything between blocks is plain f32 MXU
matmuls.  The backward pass is the Murray block adjoint written with the
already-computed block inverses, via ``jax.custom_vjp`` (kernels are not
auto-differentiable).

Layout choice: the kernel factors d = Uᵀ U with U UPPER-triangular and
returns (U, W = U⁻¹).  Rows of U/W live on the sublane dimension, so the
per-step dynamic index (``pl.ds(k, 1)``) hits the cheap dimension; a
lower-triangular formulation would need per-step *lane* indexing, which
Mosaic lowers poorly.  Then L = Uᵀ, L⁻¹ = Wᵀ, and panels need
``off @ W`` — no transposes materialize outside the final assembly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_kernel(d_ref, u_ref, w_ref, m_ref):
    """U = upper-chol(d) (d = Uᵀ U) and W = U⁻¹, block resident in VMEM."""
    B = d_ref.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (1, B), 1)

    m_ref[:] = d_ref[:]
    u_ref[:] = jnp.zeros((B, B), dtype=d_ref.dtype)
    w_ref[:] = jnp.zeros((B, B), dtype=d_ref.dtype)

    def factor_step(k, _):
        # row k of the (symmetric) residual == column k: sublane read only
        row = m_ref[pl.ds(k, 1), :]
        # non-PSD pivot → NaN so the factorization (and any logp built on
        # it) signals failure instead of returning finite garbage
        p2 = jnp.sum(jnp.where(lane == k, row, 0.0))
        pivot = jnp.where(p2 > 0, jnp.sqrt(jnp.where(p2 > 0, p2, 1.0)), jnp.nan)
        urow = jnp.where(lane >= k, row / pivot, 0.0)
        u_ref[pl.ds(k, 1), :] = urow
        # trailing rank-1 update; urow is zero below k, so the outer product
        # only touches the (i >= k, j >= k) block — no extra masking needed
        m_ref[:] = m_ref[:] - urow.reshape(B, 1) * urow
        return 0

    lax.fori_loop(0, B, factor_step, 0)

    def inv_step(i, _):
        k = B - 1 - i
        urow = u_ref[pl.ds(k, 1), :]
        diag = jnp.sum(jnp.where(lane == k, urow, 0.0))
        tail = jnp.where(lane > k, urow, 0.0)
        # rows of W below k are already final; rows <= k still zero, and
        # tail is zero there, so the contraction only sees finished rows
        acc = jnp.dot(tail, w_ref[:], preferred_element_type=d_ref.dtype)
        ek = jnp.where(lane == k, 1.0, 0.0).astype(w_ref.dtype)
        w_ref[pl.ds(k, 1), :] = (ek - acc) / diag
        return 0

    lax.fori_loop(0, B, inv_step, 0)


def _run_block_kernel(d, interpret):
    B = d.shape[-1]
    return pl.pallas_call(
        _chol_inv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(d.shape, d.dtype),
            jax.ShapeDtypeStruct(d.shape, d.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((B, B), d.dtype)],
        interpret=interpret,
    )(d)


def _phi(x):
    """Lower triangle with halved diagonal (Murray's Φ)."""
    return jnp.tril(x) - 0.5 * jnp.diagflat(jnp.diagonal(x))


@jax.custom_vjp
def chol_inv_block(d):
    """(U, W): upper Cholesky factor of SPD block d (d = Uᵀ U) and W = U⁻¹.

    Gradient convention matches XLA's cholesky through any symmetric
    construction of ``d`` (the cotangent is symmetrized; Cholesky of a
    non-symmetric matrix is not a meaningful differentiation target).
    """
    interpret = jax.default_backend() != "tpu"
    return _run_block_kernel(d, interpret)


def _chol_inv_block_fwd(d):
    out = chol_inv_block(d)
    return out, out


def _chol_inv_block_bwd(res, cot):
    u, w = res
    ubar, wbar = cot
    # W = U⁻¹ ⇒ Ū += upper(−Wᵀ w̄ Wᵀ)
    ubar = ubar + jnp.triu(-(w.T @ wbar) @ w.T)
    # Murray adjoint for L = Uᵀ, L̄ = Ūᵀ, L⁻¹ = Wᵀ:
    #   d̄ = sym( L⁻ᵀ Φ(Lᵀ L̄) L⁻¹ )
    L = u.T
    Lbar = ubar.T
    Linv = w.T
    P = _phi(L.T @ Lbar)
    g = Linv.T @ P @ Linv
    return (0.5 * (g + g.T),)


chol_inv_block.defvjp(_chol_inv_block_fwd, _chol_inv_block_bwd)


def cholesky_blocked_pallas(a, block_size: int = 256):
    """Lower Cholesky factor via Pallas diagonal blocks + MXU updates.

    Same algorithm as ``ops.cholesky.cholesky_blocked`` with the two
    sequential scans per block fused into one VMEM-resident kernel.
    Differentiable end-to-end: the block kernel carries a custom VJP and
    the inter-block glue is plain jnp.
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
    blk = chol_inv_block
    for _ in range(a.ndim - 2):  # batch dims → vmap the kernel
        blk = jax.vmap(blk)

    L = jnp.zeros_like(a)
    with jax.default_matmul_precision("float32"):
        for j in range(nb):
            s = j * B
            prior = L[..., s : s + B, :s]
            d = a[..., s : s + B, s : s + B] - prior @ jnp.swapaxes(prior, -1, -2)
            U, W = blk(d)
            L = L.at[..., s : s + B, s : s + B].set(jnp.swapaxes(U, -1, -2))
            if j + 1 < nb:
                rows = L[..., s + B :, :s]
                off = a[..., s + B :, s : s + B] - rows @ jnp.swapaxes(prior, -1, -2)
                # off @ L_jj⁻ᵀ == off @ W
                L = L.at[..., s + B :, s : s + B].set(off @ W)
    if npad:
        L = L[..., :n, :n]
    return L
