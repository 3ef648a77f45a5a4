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

BATCHED blocks (round 3): the sequential 2·B-step loop is latency-bound
(~1 us/step overhead vs ~70 ns of VPU work at B=256), so vmapping the
kernel over a chain batch serializes chains at full per-step cost
(measured: 3.5 ms/chain flat from C=8 to C=32).  The kernel therefore
takes a ``(Cb, B, B)`` batch and applies every step to all Cb blocks at
once — same step count for the whole batch, amortizing the overhead
C-fold.  The batch axis is chunked outside the kernel to fit VMEM.

Layout choice: the kernel factors d = Uᵀ U with U UPPER-triangular and
returns (U, W = U⁻¹).  Rows of U/W live on the sublane dimension, so the
per-step dynamic index (``pl.ds(k, 1)``) hits the cheap dimension; the
batch axis rides the (untouched) leading tile dimension, and the rank-1
outer product is a batched K=1 ``dot_general`` (no in-kernel transposes).
Then L = Uᵀ, L⁻¹ = Wᵀ, and panels need ``off @ W`` — no transposes
materialize outside the final assembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_kernel(d_ref, u_ref, w_ref, m_ref):
    """U = upper-chol(d) (d = Uᵀ U) and W = U⁻¹ for a (Cb, B, B) batch,
    all blocks resident in VMEM; every sequential step updates the whole
    batch at once."""
    cb, B, _ = d_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (cb, 1, B), 2)

    m_ref[:] = d_ref[:]
    u_ref[:] = jnp.zeros((cb, B, B), dtype=d_ref.dtype)
    w_ref[:] = jnp.zeros((cb, B, B), dtype=d_ref.dtype)

    outer_dn = (((1,), (1,)), ((0,), (0,)))  # contract the singleton row dim

    def factor_step(k, _):
        # row k of the (symmetric) residual == column k: sublane read only
        row = m_ref[:, pl.ds(k, 1), :]  # (Cb, 1, B)
        # non-PSD pivot → NaN so the factorization (and any logp built on
        # it) signals failure instead of returning finite garbage
        p2 = jnp.sum(jnp.where(lane == k, row, 0.0), axis=(1, 2))
        pivot = jnp.where(
            p2 > 0, jnp.sqrt(jnp.where(p2 > 0, p2, 1.0)), jnp.nan
        )
        urow = jnp.where(lane >= k, row / pivot[:, None, None], 0.0)
        u_ref[:, pl.ds(k, 1), :] = urow
        # trailing rank-1 update as a batched (B,1)x(1,B) outer product;
        # urow is zero below k, so it only touches the (i>=k, j>=k) block
        upd = lax.dot_general(
            urow, urow, outer_dn, preferred_element_type=d_ref.dtype
        )
        m_ref[:] = m_ref[:] - upd
        return 0

    lax.fori_loop(0, B, factor_step, 0)

    def inv_step(i, _):
        k = B - 1 - i
        urow = u_ref[:, pl.ds(k, 1), :]
        diag = jnp.sum(jnp.where(lane == k, urow, 0.0), axis=(1, 2))
        tail = jnp.where(lane > k, urow, 0.0)
        # rows of W below k are already final; rows <= k still zero, and
        # tail is zero there, so the contraction only sees finished rows
        acc = lax.dot_general(
            tail,
            w_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=d_ref.dtype,
        )  # (Cb, 1, B)
        ek = jnp.where(lane == k, 1.0, 0.0).astype(w_ref.dtype)
        w_ref[:, pl.ds(k, 1), :] = (ek - acc) / diag[:, None, None]
        return 0

    lax.fori_loop(0, B, inv_step, 0)


def _run_block_kernel(d, interpret):
    cb, B, _ = d.shape
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
        scratch_shapes=[pltpu.VMEM((cb, B, B), d.dtype)],
        interpret=interpret,
    )(d)


def _chunked_blocks(d):
    """Invoke the kernel over a (Cb, B, B) batch in VMEM-sized chunks."""
    interpret = jax.default_backend() != "tpu"
    cb, B, _ = d.shape
    per = 4 * B * B * d.dtype.itemsize  # d, u, w, scratch per block
    chunk = max(1, min(cb, (8 * 1024 * 1024) // per))
    if chunk >= cb:
        return _run_block_kernel(d, interpret)
    us, ws = [], []
    for s in range(0, cb, chunk):
        u, w = _run_block_kernel(d[s : s + chunk], interpret)
        us.append(u)
        ws.append(w)
    return jnp.concatenate(us, axis=0), jnp.concatenate(ws, axis=0)


# --- primitive with a MERGING batching rule ---------------------------------
# Samplers vmap whole log densities, so the kernel usually meets its chain
# batch as a vmap axis.  pallas_call's default vmap rule prepends a GRID
# dimension, which executes sequentially on a TensorCore — exactly the
# serialization the batched kernel exists to avoid.  A first-class
# primitive lets vmap FOLD the mapped axis into the kernel's batch axis.

from jax.extend import core as _jex_core
from jax.interpreters import batching as _batching
from jax.interpreters import mlir as _mlir

_chol_inv_p = _jex_core.Primitive("math_tpu_chol_inv_block")
_chol_inv_p.multiple_results = True


@_chol_inv_p.def_abstract_eval
def _chol_inv_abstract(d):
    return d, d


_chol_inv_p.def_impl(_chunked_blocks)
_mlir.register_lowering(
    _chol_inv_p, _mlir.lower_fun(_chunked_blocks, multiple_results=True)
)


def _chol_inv_batcher(args, dims):
    (d,) = args
    (bd,) = dims
    d = jnp.moveaxis(d, bd, 0)  # (V, Cb, B, B)
    shp = d.shape
    flat = d.reshape((-1,) + shp[-2:])
    u, w = _chol_inv_p.bind(flat)
    return (u.reshape(shp), w.reshape(shp)), (0, 0)


_batching.primitive_batchers[_chol_inv_p] = _chol_inv_batcher


def _phi(x):
    """Lower triangle with halved diagonal (Murray's Φ), batched."""
    il = jnp.tril(jnp.ones(x.shape[-2:], x.dtype))
    diag = jnp.diagonal(x, axis1=-2, axis2=-1)
    return x * il - 0.5 * (
        jnp.zeros_like(x)
        + diag[..., None] * jnp.eye(x.shape[-1], dtype=x.dtype)
    )


def _T(x):
    return jnp.swapaxes(x, -1, -2)


@jax.custom_vjp
def chol_inv_block(d):
    """(U, W): upper Cholesky factor of SPD block(s) d (d = Uᵀ U) and
    W = U⁻¹; d is (B, B) or (Cb, B, B) — the batch runs in ONE kernel,
    and vmapped axes MERGE into the kernel batch (primitive batching
    rule) instead of serializing through a Pallas grid.

    Gradient convention matches XLA's cholesky through any symmetric
    construction of ``d`` (the cotangent is symmetrized; Cholesky of a
    non-symmetric matrix is not a meaningful differentiation target).
    """
    squeeze = d.ndim == 2
    if squeeze:
        d = d[None]
    u, w = _chol_inv_p.bind(d)
    if squeeze:
        u, w = u[0], w[0]
    return u, w


def _chol_inv_block_fwd(d):
    out = chol_inv_block(d)
    return out, out


def _chol_inv_block_bwd(res, cot):
    u, w = res
    ubar, wbar = cot
    # W = U⁻¹ ⇒ Ū += upper(−Wᵀ w̄ Wᵀ)
    ubar = ubar + jnp.triu(-_T(w) @ wbar @ _T(w))
    # Murray adjoint for L = Uᵀ, L̄ = Ūᵀ, L⁻¹ = Wᵀ:
    #   d̄ = sym( L⁻ᵀ Φ(Lᵀ L̄) L⁻¹ )
    L = _T(u)
    Lbar = _T(ubar)
    Linv = _T(w)
    P = _phi(_T(L) @ Lbar)
    g = _T(Linv) @ P @ Linv
    return (0.5 * (g + _T(g)),)


chol_inv_block.defvjp(_chol_inv_block_fwd, _chol_inv_block_bwd)


def cholesky_blocked_pallas(a, block_size: int = 256):
    """Lower Cholesky factor via Pallas diagonal blocks + MXU updates.

    Same algorithm as ``ops.cholesky.cholesky_blocked`` with the two
    sequential scans per block fused into one VMEM-resident kernel, and
    any leading batch (vmapped chains) folded INTO the kernel batch so
    the latency-bound sequential loop is paid once per step, not once
    per chain.  Differentiable end-to-end: the block kernel carries a
    custom VJP and the inter-block glue is plain jnp.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    nb = max(1, -(-n // block_size))
    npad = nb * block_size - n
    if npad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, npad), (0, npad)])
        tail = jnp.arange(n, n + npad)
        a = a.at[..., tail, tail].set(1.0)

    batch_shape = a.shape[:-2]
    flat = a.reshape((-1,) + a.shape[-2:]) if batch_shape else a[None]
    B = block_size

    L = jnp.zeros_like(flat)
    # full-f32 matmuls: bf16 trailing updates lose the PSD margin and feed
    # negative diagonals into the unblocked factorization
    with jax.default_matmul_precision("float32"):
        for j in range(nb):
            s = j * B
            prior = L[..., s : s + B, :s]
            d = flat[..., s : s + B, s : s + B] - prior @ _T(prior)
            U, W = chol_inv_block(d)
            L = L.at[..., s : s + B, s : s + B].set(_T(U))
            if j + 1 < nb:
                rows = L[..., s + B :, :s]
                off = flat[..., s + B :, s : s + B] - rows @ _T(prior)
                # off @ L_jj⁻ᵀ == off @ W
                L = L.at[..., s + B :, s : s + B].set(off @ W)
    L = L.reshape(batch_shape + L.shape[-2:]) if batch_shape else L[0]
    if npad:
        L = L[..., :n, :n]
    return L
