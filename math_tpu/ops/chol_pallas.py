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
matmuls.  Differentiation is a linear ``jax.custom_jvp``
rule (forward-mode Murray differential); reverse mode is its transpose —
the Murray block adjoint over the already-computed block inverses — and
because the rule is built from differentiable ops, ANY order of
differentiation works (jax.hessian included).

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
    batch at once.

    Mosaic constraint: layout inference crashes on rank-1 (Cb,)
    intermediates (and on the rank-1→rank-3 reshape that ``keepdims``
    lowers to), so the per-batch pivot/diag reductions are written as
    broadcast-reduces — masked row × ones(B, B) on the MXU — keeping
    every value rank-3.  All in-kernel dot_generals pin
    ``Precision.HIGHEST``: the pivot would otherwise round through bf16
    and the trailing updates would lose the PSD margin.
    """
    cb, B, _ = d_ref.shape
    f32 = lax.Precision.HIGHEST
    lane = lax.broadcasted_iota(jnp.int32, (cb, 1, B), 2)
    ones_bb = jnp.ones((B, B), dtype=d_ref.dtype)
    bcast_dn = (((2,), (0,)), ((), ()))  # (Cb,1,B)x(B,B) → (Cb,1,B)

    m_ref[:] = d_ref[:]
    u_ref[:] = jnp.zeros((cb, B, B), dtype=d_ref.dtype)
    w_ref[:] = jnp.zeros((cb, B, B), dtype=d_ref.dtype)

    outer_dn = (((1,), (1,)), ((0,), (0,)))  # contract the singleton row dim

    def factor_step(k, _):
        # row k of the (symmetric) residual == column k: sublane read only
        row = m_ref[:, pl.ds(k, 1), :]  # (Cb, 1, B)
        # non-PSD pivot → NaN so the factorization (and any logp built on
        # it) signals failure instead of returning finite garbage
        p2 = lax.dot_general(
            jnp.where(lane == k, row, 0.0),
            ones_bb,
            bcast_dn,
            precision=f32,
            preferred_element_type=d_ref.dtype,
        )  # every lane = m[k, k]
        pivot = jnp.where(
            p2 > 0, jnp.sqrt(jnp.where(p2 > 0, p2, 1.0)), jnp.nan
        )
        urow = jnp.where(lane >= k, row / pivot, 0.0)
        u_ref[:, pl.ds(k, 1), :] = urow
        # trailing rank-1 update as a batched (B,1)x(1,B) outer product;
        # urow is zero below k, so it only touches the (i>=k, j>=k) block
        upd = lax.dot_general(
            urow,
            urow,
            outer_dn,
            precision=f32,
            preferred_element_type=d_ref.dtype,
        )
        m_ref[:] = m_ref[:] - upd
        return 0

    lax.fori_loop(0, B, factor_step, 0)

    def inv_step(i, _):
        k = B - 1 - i
        urow = u_ref[:, pl.ds(k, 1), :]
        diag = lax.dot_general(
            jnp.where(lane == k, urow, 0.0),
            ones_bb,
            bcast_dn,
            precision=f32,
            preferred_element_type=d_ref.dtype,
        )  # every lane = U[k, k]
        tail = jnp.where(lane > k, urow, 0.0)
        # rows of W below k are already final; rows <= k still zero, and
        # tail is zero there, so the contraction only sees finished rows
        acc = lax.dot_general(
            tail,
            w_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            precision=f32,
            preferred_element_type=d_ref.dtype,
        )  # (Cb, 1, B)
        ek = jnp.where(lane == k, 1.0, 0.0).astype(w_ref.dtype)
        w_ref[:, pl.ds(k, 1), :] = (ek - acc) / diag
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


def _psi_upper(x):
    """Upper triangle with halved diagonal (the upper-factor analog of
    Murray's Φ), batched."""
    diag = jnp.diagonal(x, axis1=-2, axis2=-1)
    return jnp.triu(x) - 0.5 * diag[..., None, :] * jnp.eye(
        x.shape[-1], dtype=x.dtype
    )


# AD wiring (r5): custom_jvp, not custom_vjp.  A custom_vjp admits exactly
# one reverse differentiation — jax.hessian through a density embedding
# the blocked Cholesky died at the kernel.  The JVP rule below is LINEAR
# in the input tangent with primal-only coefficients, so reverse mode is
# its transpose — algebraically Murray's adjoint (arXiv:1602.07527): the
# transpose of dU = Ψ(U⁻ᵀ dd U⁻¹) U is d̄ = W Ψᵀ(Ū Uᵀ ∘ mask) Wᵀ, the
# same solve-multiply-mask pipeline the old hand bwd ran — and the rule
# itself is built from differentiable ops, so any higher order works.


@jax.custom_jvp
def chol_inv_block(d):
    """(U, W): upper Cholesky factor of SPD block(s) d (d = Uᵀ U) and
    W = U⁻¹; d is (B, B) or (Cb, B, B) — the batch runs in ONE kernel,
    and vmapped axes MERGE into the kernel batch (primitive batching
    rule) instead of serializing through a Pallas grid.

    Gradient convention matches XLA's cholesky through any symmetric
    construction of ``d`` (Cholesky of a non-symmetric matrix is not a
    meaningful differentiation target).
    """
    squeeze = d.ndim == 2
    if squeeze:
        d = d[None]
    u, w = _chol_inv_p.bind(d)
    if squeeze:
        u, w = u[0], w[0]
    return u, w


@chol_inv_block.defjvp
def _chol_inv_block_jvp(primals, tangents):
    (d,) = primals
    (dd,) = tangents
    u, w = chol_inv_block(d)
    with jax.default_matmul_precision("float32"):
        # d = UᵀU ⇒ U⁻ᵀ dd U⁻¹ = Sᵀ + S with S = dU U⁻¹ upper-triangular
        m = _T(w) @ dd @ w
        du = _psi_upper(m) @ u
        dw = -w @ du @ w  # W = U⁻¹
    return (u, w), (du, dw)


def _pad_spd(a, n, npad):
    """Zero-pad trailing dims to the block grid, identity on the tail diag."""
    if npad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, npad), (0, npad)])
        tail = jnp.arange(n, n + npad)
        a = a.at[..., tail, tail].set(1.0)
    return a


def _chol_blocked_impl(flat, B):
    """Blocked factorization on a flat (C, N, N) padded batch; returns
    (L, [W_j]) where W_j = U_j⁻¹ is block j's upper-triangular inverse
    (saved so the adjoint's triangular solves are pure matmuls)."""
    nb = flat.shape[-1] // B
    L = jnp.zeros_like(flat)
    Ws = []
    # full-f32 matmuls: bf16 trailing updates lose the PSD margin and feed
    # negative diagonals into the unblocked factorization
    with jax.default_matmul_precision("float32"):
        for j in range(nb):
            s = j * B
            prior = L[..., s : s + B, :s]
            d = flat[..., s : s + B, s : s + B] - prior @ _T(prior)
            U, W = chol_inv_block(d)
            Ws.append(W)
            L = L.at[..., s : s + B, s : s + B].set(_T(U))
            if j + 1 < nb:
                rows = L[..., s + B :, :s]
                off = flat[..., s + B :, s : s + B] - rows @ _T(prior)
                # off @ L_jj⁻ᵀ == off @ W
                L = L.at[..., s + B :, s : s + B].set(off @ W)
    return L, Ws


def _lower_solve_blocks(L, Ws, b, B):
    """y with L y = b by block forward substitution; L_jj⁻¹ = W_jᵀ."""
    y = jnp.zeros_like(b)
    for j in range(len(Ws)):
        s = j * B
        rhs = b[..., s : s + B, :] - L[..., s : s + B, :s] @ y[..., :s, :]
        y = y.at[..., s : s + B, :].set(_T(Ws[j]) @ rhs)
    return y


def _upper_solve_blocks(L, Ws, b, B):
    """y with Lᵀ y = b by block back substitution; (Lᵀ)_jj⁻¹ = W_j."""
    y = jnp.zeros_like(b)
    for j in reversed(range(len(Ws))):
        s = j * B
        rhs = b[..., s : s + B, :] - _T(L[..., s + B :, s : s + B]) @ y[
            ..., s + B :, :
        ]
        y = y.at[..., s : s + B, :].set(Ws[j] @ rhs)
    return y


from functools import partial as _partial


def _flatten_pad(a, n, B):
    nb = max(1, -(-n // B))
    npad = nb * B - n
    a = _pad_spd(a, n, npad)
    batch_shape = a.shape[:-2]
    flat = a.reshape((-1,) + a.shape[-2:]) if batch_shape else a[None]
    return flat, batch_shape, npad


def _unflatten_unpad(x, batch_shape, n):
    x = x.reshape(batch_shape + x.shape[-2:]) if batch_shape else x[0]
    return x[..., :n, :n]


def _flatten_pad_zero(x, n, B, cols_only=False):
    """Flatten like ``_flatten_pad`` but ZERO-pad the tail (the tangent of
    the identity padding is zero).  ``cols_only``: trailing dims are
    (n, m) — pad rows only."""
    nb = max(1, -(-n // B))
    npad = nb * B - n
    if npad:
        pads = [(0, 0)] * (x.ndim - 2) + [
            (0, npad), (0, 0) if cols_only else (0, npad)
        ]
        x = jnp.pad(x, pads)
    batch_shape = x.shape[:-2]
    return x.reshape((-1,) + x.shape[-2:]) if batch_shape else x[None]


# AD wiring (r5): custom_jvp, not custom_vjp, so jax.hessian (and any
# order) works through densities embedding the blocked factorization.
# The linear tangent maps are additionally wrapped in ``custom_transpose``
# with HAND-WRITTEN exact transposes: JAX's mechanical transpose of the
# block-substitution loops was measured ~50% slower than the closed-form
# adjoint on the v5e (147 -> 97 ms per fused GP value+grad step at
# n=2000, C=32), and the closed forms below are exact transposes of the
# tangent maps (verified by dot-product identity on NON-symmetric
# tangents in tests/test_chol_second_order.py), so every higher order of
# differentiation still composes.

try:  # jax-private module (pinned environment); mechanical fallback below
    from jax._src import core as _jcore
    from jax._src.custom_transpose import custom_transpose as _custom_transpose

    _HAVE_CT = True
except ImportError:  # pragma: no cover - exercised only on jax upgrades
    _HAVE_CT = False


def _ct_wrap(fun, transpose):
    """fun(res, lin)->out with an exact hand transpose(res, cot)->lin_cot;
    falls back to the mechanical transpose if custom_transpose is gone."""
    if not _HAVE_CT:  # pragma: no cover
        return lambda out_types, res, lin: fun(res, lin)
    ct = _custom_transpose(fun)
    ct.def_transpose(transpose)
    return ct


def _aval_like(x):
    return _jcore.ShapedArray(x.shape, x.dtype) if _HAVE_CT else None


def _aval(shape, dtype):
    return _jcore.ShapedArray(shape, dtype) if _HAVE_CT else None


def _chb_tan_fun(res, lin):
    """dL = L Φ(L⁻¹ dA L⁻ᵀ) (Murray, arXiv:1602.07527), both triangular
    solves as block substitutions over the inverses the forward already
    computed."""
    L, Ws = res
    (da,) = lin
    B = Ws[0].shape[-1]
    with jax.default_matmul_precision("float32"):
        X = _lower_solve_blocks(L, Ws, da, B)  # L⁻¹ dA
        M = _T(_lower_solve_blocks(L, Ws, _T(X), B))  # L⁻¹ dA L⁻ᵀ
        return (L @ _phi(M),)


def _chb_tan_transpose(res, cot):
    """Exact transpose of ``_chb_tan_fun``: Ā = L⁻ᵀ Φ(Lᵀ L̄) L⁻¹ —
    Murray's level-3 adjoint WITHOUT the symmetrization (the transpose of
    the tangent map itself; symmetry-convention agreement with XLA's
    cholesky holds through any symmetric construction of A).  Strict-upper
    content of L̄ cannot reach the output: the Φ mask keeps (i >= j) and
    (Lᵀ L̄)_{ij} only reads L̄ rows k >= i >= j.
    ref: rev/mat/fun/cholesky_decompose.hpp (blocked reverse sweep)."""
    L, Ws = res
    (lbar,) = cot
    B = Ws[0].shape[-1]
    with jax.default_matmul_precision("float32"):
        P = _phi(_T(L) @ lbar)
        X = _upper_solve_blocks(L, Ws, P, B)  # L⁻ᵀ P
        abar = _T(_upper_solve_blocks(L, Ws, _T(X), B))  # (L⁻ᵀ Xᵀ)ᵀ
    return (abar,)


_chb_tan = _ct_wrap(_chb_tan_fun, _chb_tan_transpose)


@_partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _chol_blocked_vjp(a, n, block_size):
    flat, batch_shape, _ = _flatten_pad(a, n, block_size)
    L, _ = _chol_blocked_impl(flat, block_size)
    return _unflatten_unpad(L, batch_shape, n)


@_chol_blocked_vjp.defjvp
def _chol_blocked_jvp(n, block_size, primals, tangents):
    """Forward-mode blocked Cholesky via ``_chb_tan`` (tracing back
    through the factorization loop instead measured 18x slower at
    n=2000, C=8, v5e); reverse mode runs the hand transpose.
    ref: rev/mat/fun/cholesky_decompose.hpp (blocked reverse sweep)."""
    (a,) = primals
    (da,) = tangents
    B = block_size
    flat, batch_shape, _ = _flatten_pad(a, n, B)
    L, Ws = _chol_blocked_impl(flat, B)
    da_flat = _flatten_pad_zero(da, n, B)
    (dL,) = _chb_tan((_aval_like(da_flat),), (L, tuple(Ws)), (da_flat,))
    return (
        _unflatten_unpad(L, batch_shape, n),
        _unflatten_unpad(dL, batch_shape, n),
    )


def _masked_diag(m):
    """Diagonal via masked row-sum (jnp.diagonal's VJP is a serialized
    TPU scatter; this form's is a broadcast multiply)."""
    return jnp.sum(m * jnp.eye(m.shape[-1], dtype=m.dtype), axis=-1)


@_partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def _chol_solve_logdiag(a, b, n, block_size):
    y, s = _csl_fwd(a, b, n, block_size)[0]
    return y, s


def _csl_fwd(a, b, n, block_size):
    flat_a, batch_shape, npad = _flatten_pad(a, n, block_size)
    L, Ws = _chol_blocked_impl(flat_a, block_size)
    if npad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, npad), (0, 0)])
    flat_b = (
        b.reshape((-1,) + b.shape[-2:]) if batch_shape else b[None]
    )
    with jax.default_matmul_precision("float32"):
        y = _lower_solve_blocks(L, Ws, flat_b, block_size)
    # padded tail has unit diagonal -> log contributes exactly 0
    s = jnp.sum(jnp.log(_masked_diag(L)), axis=-1)
    y_out = y.reshape(batch_shape + y.shape[-2:])[..., :n, :]
    s_out = s.reshape(batch_shape)
    return (y_out, s_out), (L, Ws, y)


def _csl_tan_fun(res, lin):
    """Joint tangent of (y = L⁻¹ b, s = Σ log L_ii) wrt (dA, db), in the
    simplified form: with M = L⁻¹ dA L⁻ᵀ,

        dy = L⁻¹ db − Φ(M) y      (L⁻¹ dL = Φ(M): the dL matmul cancels)
        ds = ½ tr(M)              (dL_ii/L_ii = Φ(M)_ii = ½ M_ii)

    — two O(n³) block substitutions + one cheap rhs solve; the explicit
    dL = L Φ(M) of the textbook form never materializes."""
    L, Ws, y = res
    da, db = lin
    B = Ws[0].shape[-1]
    with jax.default_matmul_precision("float32"):
        X = _lower_solve_blocks(L, Ws, da, B)
        M = _T(_lower_solve_blocks(L, Ws, _T(X), B))
        dy = _lower_solve_blocks(L, Ws, db, B) - _phi(M) @ y
        ds = 0.5 * jnp.trace(M, axis1=-2, axis2=-1)
    return dy, ds


def _csl_tan_transpose(res, cot):
    """Exact transpose of ``_csl_tan_fun``:

        b̄ = L⁻ᵀ ȳ
        Ā = L⁻ᵀ (−Φ(ȳ yᵀ) + ½ s̄ I) L⁻¹

    (⟨ȳ, Φ(M) y⟩ = ⟨Φ-mask ∘ (ȳ yᵀ), M⟩ — the mask is elementwise and
    hence self-adjoint, and ȳ yᵀ is a rank-m outer product, so this is
    CHEAPER than the r3 hand bwd's tril/diag assembly chain; measured
    147 -> 97 ms per fused GP value+grad at n=2000, C=32, v5e.)  As with
    the factor adjoint, Ā is the un-symmetrized transpose — identical
    gradients through any symmetric construction of A.  ref: the
    composition of rev/mat/fun/{cholesky_decompose,mdivide_left_tri,
    log}.hpp varis."""
    L, Ws, y = res
    ybar, sbar = cot
    B = Ws[0].shape[-1]
    N = L.shape[-1]
    eye = jnp.eye(N, dtype=L.dtype)
    with jax.default_matmul_precision("float32"):
        bbar = _upper_solve_blocks(L, Ws, ybar, B)
        C = -_phi(ybar @ _T(y)) + 0.5 * sbar[..., None, None] * eye
        X = _upper_solve_blocks(L, Ws, C, B)
        abar = _T(_upper_solve_blocks(L, Ws, _T(X), B))
    return abar, bbar


_csl_tan = _ct_wrap(_csl_tan_fun, _csl_tan_transpose)


@_chol_solve_logdiag.defjvp
def _csl_jvp(n, block_size, primals, tangents):
    """Forward-mode joint rule for (y = L⁻¹ b, s = Σ log L_ii) via
    ``_csl_tan``; reverse mode runs the hand transpose above."""
    a, b = primals
    da, db = tangents
    B = block_size
    (y_out, s_out), (L, Ws, y) = _csl_fwd(a, b, n, B)
    batch_shape = y_out.shape[:-2]
    da_flat = _flatten_pad_zero(da, n, B)
    db_flat = _flatten_pad_zero(db, n, B, cols_only=True)
    dy, ds = _csl_tan(
        (_aval_like(db_flat), _aval(L.shape[:-2], L.dtype)),
        (L, tuple(Ws), y),
        (da_flat, db_flat),
    )
    dy_out = dy.reshape(batch_shape + dy.shape[-2:])[..., :n, :]
    ds_out = ds.reshape(batch_shape)
    return (y_out, s_out), (dy_out, ds_out)


def cholesky_solve_logdiag_pallas(a, b, block_size: int = 256):
    """(L⁻¹ b, Σ log L_ii) with L = chol(a), in ONE blocked factorization:
    the Pallas block kernel's triangular inverses are reused for the
    solve (no extra substitution scans) and for every triangular solve
    in the joint adjoint.  This is the whole O(n³) part of a
    multi-normal / marginal-GP log density.  b: (..., n) or (..., n, m).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    vec = b.ndim == a.ndim - 1
    if vec:
        b = b[..., None]
    y, s = _chol_solve_logdiag(a, b, a.shape[-1], block_size)
    return (y[..., 0] if vec else y), s


def cholesky_blocked_pallas(a, block_size: int = 256):
    """Lower Cholesky factor via Pallas diagonal blocks + MXU updates.

    Same algorithm as ``ops.cholesky.cholesky_blocked`` with the two
    sequential scans per block fused into one VMEM-resident kernel, and
    any leading batch (vmapped chains) folded INTO the kernel batch so
    the latency-bound sequential loop is paid once per step, not once
    per chain.  Differentiable end-to-end via the blocked Murray adjoint
    (``_chol_blocked_bwd``); gradient convention matches XLA's cholesky
    through any symmetric construction of ``a``.
    """
    a = jnp.asarray(a)
    return _chol_blocked_vjp(a, a.shape[-1], block_size)
