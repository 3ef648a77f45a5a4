"""Linear algebra under Stan Math names.

Reference: ``prim/mat/fun/`` (216 files) + rev specializations
(``rev/mat/fun/``, e.g. the blocked Cholesky adjoint at
``cholesky_decompose.hpp:50-155``).  On TPU, XLA supplies the factorization
kernels and their adjoints (``jnp.linalg.cholesky`` lowers to a blocked
algorithm; its VJP is the Murray-style triangular adjoint the reference
hand-writes), so these wrappers mostly encode Stan's naming, argument
conventions, and numerics (e.g. symmetrization, log-determinants via
factor diagonals).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def cholesky_decompose(a):
    """Lower Cholesky factor (ref: cholesky_decompose.hpp)."""
    return jnp.linalg.cholesky(a)


def mdivide_left(a, b):
    """A \\ b (ref: mdivide_left.hpp)."""
    return jnp.linalg.solve(a, b)


def mdivide_right(b, a):
    """b / A  i.e. b A^-1 (ref: mdivide_right.hpp)."""
    return jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(a, -1, -2), jnp.swapaxes(b, -1, -2)),
        -1,
        -2,
    )


def mdivide_left_tri_low(L, b):
    """L \\ b with L lower-triangular (ref: mdivide_left_tri_low.hpp)."""
    return jsl.solve_triangular(L, b, lower=True)


def mdivide_right_tri_low(b, L):
    return jnp.swapaxes(
        jsl.solve_triangular(
            jnp.swapaxes(L, -1, -2), jnp.swapaxes(b, -1, -2), lower=False
        ),
        -1,
        -2,
    )


def mdivide_left_spd(a, b):
    """SPD solve via Cholesky (ref: mdivide_left_spd.hpp)."""
    return jsl.cho_solve((jnp.linalg.cholesky(a), True), b)


def mdivide_left_ldlt(ldlt, b):
    """Solve using a cached factorization (ref: LDLT_factor usage)."""
    return jsl.cho_solve(ldlt, b)


def ldlt_factor(a):
    """Cached SPD factorization handle (ref: LDLT_factor.hpp).

    On TPU the natural cache is the Cholesky factor; reuse it across
    solves/log-determinants exactly like the reference caches its LDLT on
    the tape (``rev/mat/fun/LDLT_factor.hpp``).
    """
    return (jnp.linalg.cholesky(a), True)


def log_determinant(a):
    """log |det A| (ref: log_determinant.hpp)."""
    return jnp.linalg.slogdet(a)[1]


def log_determinant_spd(a):
    """log det of SPD matrix via Cholesky (ref: log_determinant_spd.hpp)."""
    L = jnp.linalg.cholesky(a)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def log_determinant_ldlt(ldlt):
    L, _ = ldlt
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def determinant(a):
    return jnp.linalg.det(a)


def inverse(a):
    return jnp.linalg.inv(a)


def inverse_spd(a):
    L = jnp.linalg.cholesky(a)
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    return jsl.cho_solve((L, True), eye)


def quad_form(a, b):
    """b^T A b (ref: quad_form.hpp)."""
    if jnp.ndim(b) == 1:
        return b @ a @ b
    return jnp.swapaxes(b, -1, -2) @ a @ b


def quad_form_sym(a, b):
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    out = jnp.swapaxes(b, -1, -2) @ a @ b if jnp.ndim(b) > 1 else b @ a @ b
    if jnp.ndim(b) > 1:
        out = 0.5 * (out + jnp.swapaxes(out, -1, -2))
    return out


def quad_form_diag(a, v):
    """diag(v) A diag(v) (ref: quad_form_diag.hpp)."""
    return a * v[..., :, None] * v[..., None, :]


def trace_quad_form(a, b):
    """tr(B^T A B) (ref: trace_quad_form.hpp)."""
    return jnp.einsum("...ij,...ik,...kj->...", b, a, b)


def trace_inv_quad_form_ldlt(ldlt, b):
    """tr(B^T A^-1 B) with cached factor (ref: trace_inv_quad_form_ldlt.hpp)."""
    L, _ = ldlt
    x = jsl.solve_triangular(L, b, lower=True)
    return jnp.sum(jnp.square(x))


def trace_gen_quad_form(d, a, b):
    """tr(D B^T A B) (ref: trace_gen_quad_form.hpp)."""
    return jnp.einsum("...ij,...ki,...kl,...lj->...", d, b, a, b)


def multiply_lower_tri_self_transpose(L):
    """L L^T (ref: multiply_lower_tri_self_transpose.hpp)."""
    L = jnp.tril(L)
    return L @ jnp.swapaxes(L, -1, -2)


def tcrossprod(a):
    return a @ jnp.swapaxes(a, -1, -2)


def crossprod(a):
    return jnp.swapaxes(a, -1, -2) @ a


def matrix_exp(a):
    """Matrix exponential (ref: matrix_exp.hpp, Pade + scaling/squaring)."""
    return jsl.expm(a)


def matrix_exp_multiply(a, b):
    """exp(A) B (ref: matrix_exp_multiply.hpp)."""
    return jsl.expm(a) @ b


def scale_matrix_exp_multiply(t, a, b):
    return jsl.expm(t * a) @ b


def matrix_power(a, n):
    return jnp.linalg.matrix_power(a, n)


def eigenvalues_sym(a):
    return jnp.linalg.eigvalsh(a)


def eigenvectors_sym(a):
    _, v = jnp.linalg.eigh(a)
    return v


def singular_values(a):
    return jnp.linalg.svd(a, compute_uv=False)


def qr_Q(a):
    q, _ = jnp.linalg.qr(a)
    return q


def qr_R(a):
    _, r = jnp.linalg.qr(a)
    return r


def qr_thin_Q(a):
    q, _ = jnp.linalg.qr(a, mode="reduced")
    return q


def qr_thin_R(a):
    _, r = jnp.linalg.qr(a, mode="reduced")
    return r


def csr_matrix_times_vector(m, n, w, v, u, b):
    """Sparse (CSR) matrix-vector product (ref: csr_matrix_times_vector.hpp).

    Args match Stan: m rows, n cols, w values, v 1-based column indices,
    u 1-based row-start pointers, b dense vector.  TPU-native: a gather +
    segment-sum — XLA lowers this to efficient fused ops; for very sparse
    production workloads prefer jax.experimental.sparse.BCOO.
    """
    w = jnp.asarray(w)
    v = jnp.asarray(v, jnp.int32) - 1
    u = jnp.asarray(u, jnp.int32) - 1
    b = jnp.asarray(b)
    nnz = w.shape[0]
    rows = jnp.searchsorted(u, jnp.arange(nnz), side="right") - 1
    prod = w * b[v]
    return jax.ops.segment_sum(prod, rows, num_segments=m)


def dot_self(x):
    return jnp.sum(jnp.square(x), axis=-1)


def columns_dot_self(x):
    return jnp.sum(jnp.square(x), axis=-2)


def rows_dot_self(x):
    return jnp.sum(jnp.square(x), axis=-1)


def distance(a, b):
    return jnp.sqrt(jnp.sum(jnp.square(a - b), axis=-1))


def squared_distance(a, b):
    return jnp.sum(jnp.square(a - b), axis=-1)
