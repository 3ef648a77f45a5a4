"""Flat Stan-Math-named function surface over ``prim/{scal,arr,mat}/fun``.

Every public function file in the reference's three ``fun`` directories
resolves here to a callable under its exact Stan name (re-exported from
``special`` / ``ops`` / ``transforms``, aliased to the jnp equivalent, or
defined below), or appears in ``NOT_APPLICABLE`` with the reason it has no
runtime analog in a traced functional framework.  ``tests/
test_stan_surface.py`` walks the full inventory.

Semantics notes (applying throughout):
- Mutating reference signatures (``fill``, ``resize``, output-parameter
  returns) become functional: the result is *returned*.
- Stan's 1-based container indexing is preserved in the indexing helpers
  (``get_base1``, ``block``, ``head``, ...): they take 1-based positions.
- ``check_*`` throwing behavior is in ``math_tpu.utils.checks``; invalid
  values inside jitted code follow the documented -inf/nan convention.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from math_tpu import special as _sp
from math_tpu import transforms as _tf
from math_tpu.ops import gp as _gp
from math_tpu.ops import linalg as _la

# --- re-exports: scalar specials (ref: prim/scal/fun) -----------------------

from math_tpu.special import (  # noqa: F401
    F32,
    Phi,
    Phi_approx,
    bessel_first_kind,
    bessel_second_kind,
    beta,
    binary_log_loss,
    choose,
    digamma,
    erf,
    erfc,
    falling_factorial,
    gamma_p,
    gamma_q,
    grad_2F1,
    grad_F32,
    grad_inc_beta,
    grad_reg_inc_beta,
    grad_reg_inc_gamma,
    grad_reg_lower_inc_gamma,
    inc_beta,
    inc_beta_dda,
    inc_beta_ddb,
    inc_beta_ddz,
    int_step,
    inv,
    inv_Phi,
    inv_cloglog,
    inv_logit,
    inv_sqrt,
    inv_square,
    lbeta,
    lgamma,
    lmgamma,
    log1m,
    log1m_exp,
    log1m_inv_logit,
    log1p_exp,
    log_diff_exp,
    log_falling_factorial,
    log_inv_logit,
    log_inv_logit_diff,
    log_mix,
    log_modified_bessel_first_kind,
    log_rising_factorial,
    log_sum_exp,
    logit,
    modified_bessel_first_kind,
    modified_bessel_second_kind,
    multiply_log,
    owens_t,
    rising_factorial,
    sign,
    square,
    step,
    trigamma,
)

# --- re-exports: matrix functions (ref: prim/mat/fun) -----------------------

from math_tpu.ops.linalg import (  # noqa: F401
    autocorrelation,
    autocovariance,
    chol2inv,
    cholesky_decompose,
    columns_dot_self,
    crossprod,
    csr_extract_u,
    csr_extract_v,
    csr_extract_w,
    csr_matrix_times_vector,
    csr_to_dense_matrix,
    csr_u_to_z,
    cumulative_sum,
    determinant,
    distance,
    dot_self,
    eigenvalues_sym,
    eigenvectors_sym,
    inverse,
    inverse_spd,
    ldlt_factor,
    log_determinant,
    log_determinant_ldlt,
    log_determinant_spd,
    log_softmax,
    matrix_exp,
    matrix_exp_2x2,
    matrix_exp_multiply,
    matrix_power,
    mdivide_left,
    mdivide_left_ldlt,
    mdivide_left_spd,
    mdivide_left_tri,
    mdivide_left_tri_low,
    mdivide_right,
    mdivide_right_ldlt,
    mdivide_right_spd,
    mdivide_right_tri,
    mdivide_right_tri_low,
    multiply_lower_tri_self_transpose,
    qr_Q,
    qr_R,
    qr_thin_Q,
    qr_thin_R,
    quad_form,
    quad_form_diag,
    quad_form_sym,
    rank,
    rows_dot_self,
    scale_matrix_exp_multiply,
    singular_values,
    softmax,
    sort_indices_asc,
    sort_indices_desc,
    squared_distance,
    tcrossprod,
    trace_gen_inv_quad_form_ldlt,
    trace_gen_quad_form,
    trace_inv_quad_form_ldlt,
    trace_quad_form,
)
from math_tpu.ops.gp import (  # noqa: F401
    add_diag,
    gp_dot_prod_cov,
    gp_exp_quad_cov,
    gp_exponential_cov,
    gp_matern32_cov,
    gp_matern52_cov,
    gp_periodic_cov,
)
from math_tpu.transforms import (  # noqa: F401
    identity_constrain,
    identity_free,
    cholesky_corr_constrain,
    cholesky_corr_free,
    cholesky_factor_constrain,
    cholesky_factor_free,
    corr_constrain,
    corr_free,
    corr_matrix_constrain,
    corr_matrix_free,
    cov_matrix_constrain,
    cov_matrix_constrain_lkj,
    cov_matrix_free,
    cov_matrix_free_lkj,
    factor_U,
    factor_cov_matrix,
    lb_constrain,
    lb_free,
    lub_constrain,
    lub_free,
    make_nu,
    offset_multiplier_constrain,
    offset_multiplier_free,
    ordered_constrain,
    ordered_free,
    positive_constrain,
    positive_free,
    positive_ordered_constrain,
    positive_ordered_free,
    prob_constrain,
    prob_free,
    read_corr_L,
    read_corr_matrix,
    read_cov_L,
    read_cov_matrix,
    simplex_constrain,
    simplex_free,
    ub_constrain,
    ub_free,
    unit_vector_constrain,
    unit_vector_free,
)

# LDLT_factor: the reference's cached-factorization type (LDLT_factor.hpp)
LDLT_factor = ldlt_factor

# cov_exp_quad: deprecated pre-2.x name for gp_exp_quad_cov
cov_exp_quad = gp_exp_quad_cov

# --- direct jnp aliases (elementwise math, ref: prim/{scal,mat}/fun) --------

abs = jnp.abs  # noqa: A001
acos = jnp.arccos
acosh = jnp.arccosh
asin = jnp.arcsin
asinh = jnp.arcsinh
atan = jnp.arctan
atan2 = jnp.arctan2
atanh = jnp.arctanh
cbrt = _sp.cbrt
ceil = jnp.ceil
cos = jnp.cos
cosh = jnp.cosh
exp = jnp.exp
exp2 = jnp.exp2
expm1 = jnp.expm1
fabs = jnp.abs
fdim = lambda x, y: jnp.maximum(jnp.asarray(x) - y, 0.0)  # noqa: E731
floor = jnp.floor
fma = _sp.fma
fmax = jnp.maximum
fmin = jnp.minimum
hypot = _sp.hypot
ldexp = jnp.ldexp
log = jnp.log
log10 = jnp.log10
log1p = jnp.log1p
log2 = jnp.log2
round = jnp.round  # noqa: A001
sin = jnp.sin
sinh = jnp.sinh
sqrt = jnp.sqrt
tan = jnp.tan
tanh = jnp.tanh
trunc = jnp.trunc


def tgamma(x):
    """Gamma function incl. negative non-integer arguments (ref: tgamma.hpp)."""
    return jnp.exp(jax.scipy.special.gammaln(x)) * jax.scipy.special.gammasgn(x)


def divide(a, b):
    """Scalar/elementwise division; integer args use C++ truncation toward
    zero (ref: divide.hpp)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    if jnp.issubdtype(a.dtype, jnp.integer) and jnp.issubdtype(b.dtype, jnp.integer):
        q = a // b
        return jnp.where((a % b != 0) & ((a < 0) ^ (b < 0)), q + 1, q)
    return a / b


def modulus(a, b):
    """C++ integer % (truncated, sign follows dividend) (ref: modulus.hpp)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    r = a % b
    return jnp.where((r != 0) & ((a < 0) ^ (b < 0)), r - b, r)


def multiply(a, b):
    """Stan multiply: matrix product for matrix/vector operands, scalar
    multiplication otherwise (ref: multiply.hpp)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    return a @ b


def add(a, b):
    return jnp.asarray(a) + b


def subtract(a, b):
    return jnp.asarray(a) - b


def minus(a):
    return -jnp.asarray(a)


def elt_multiply(a, b):
    return jnp.asarray(a) * b


def elt_divide(a, b):
    return jnp.asarray(a) / b


def dot_product(a, b):
    return jnp.sum(jnp.asarray(a) * b, axis=-1)


dot = dot_product  # ref: prim/arr/fun/dot.hpp


def columns_dot_product(a, b):
    return jnp.sum(jnp.asarray(a) * b, axis=-2)


def rows_dot_product(a, b):
    return jnp.sum(jnp.asarray(a) * b, axis=-1)


def scaled_add(x, y, lam):
    """x + lambda * y (functional form of ref: prim/arr/fun/scaled_add.hpp)."""
    return jnp.asarray(x) + lam * jnp.asarray(y)


# --- reductions & statistics (ref: sum.hpp, mean.hpp, sd.hpp, ...) ----------

sum = jnp.sum  # noqa: A001
prod = jnp.prod
mean = jnp.mean
max = jnp.max  # noqa: A001
min = jnp.min  # noqa: A001


def variance(x):
    """Sample variance, n-1 denominator (ref: variance.hpp)."""
    return jnp.var(jnp.asarray(x), ddof=1)


def sd(x):
    """Sample standard deviation (ref: sd.hpp)."""
    return jnp.std(jnp.asarray(x), ddof=1)


sort_asc = jnp.sort


def sort_desc(x):
    return -jnp.sort(-jnp.asarray(x))


def inverse_softmax(x):
    """log of a simplex (functional form of ref: prim/arr/fun/
    inverse_softmax.hpp)."""
    return jnp.log(x)


# --- shapes, construction, rearrangement (ref: dims.hpp, rep_*.hpp, ...) ----


def dims(x):
    return list(jnp.shape(x))


def num_elements(x):
    return int(np.prod(jnp.shape(x), dtype=np.int64))


def size(x):  # Stan size() = length of an array's leading dimension
    return jnp.shape(x)[0]


def rows(x):
    return jnp.shape(x)[-2]


def cols(x):
    return jnp.shape(x)[-1]


def rep_array(v, n):
    return jnp.full((n,) + jnp.shape(v), v)


def rep_vector(v, n):
    return jnp.full((n,), v)


def rep_row_vector(v, n):
    return jnp.full((n,), v)


def rep_matrix(v, m, n=None):
    v = jnp.asarray(v)
    if n is None:  # vector -> replicate columns ; row_vector -> rows
        return jnp.broadcast_to(v[..., None], v.shape + (m,))
    return jnp.full((m, n), v)


def fill(x, v):
    """Functional fill: array of x's shape holding v (ref: fill.hpp)."""
    return jnp.full_like(jnp.asarray(x), v)


def initialize(x, v):
    return jnp.full_like(jnp.asarray(x), v)


def append_array(a, b):
    return jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0)


vec_concat = append_array  # ref: prim/arr/fun/vec_concat.hpp


def append_row(a, b):
    return jnp.vstack([jnp.atleast_2d(a), jnp.atleast_2d(b)])


def append_col(a, b):
    return jnp.hstack([jnp.asarray(a), jnp.asarray(b)])


def array_builder(*xs):
    """Build an array from elements (ref: prim/arr/fun/array_builder.hpp's
    fluent builder, collapsed to a single call)."""
    return jnp.stack([jnp.asarray(x) for x in xs])


def diag_matrix(v):
    v = jnp.asarray(v)
    return v[..., None] * jnp.eye(v.shape[-1], dtype=v.dtype)


def diagonal(m):
    return jnp.diagonal(jnp.asarray(m), axis1=-2, axis2=-1)


def diag_pre_multiply(v, m):
    return jnp.asarray(v)[..., :, None] * m


def diag_post_multiply(m, v):
    return jnp.asarray(m) * jnp.asarray(v)[..., None, :]


def divide_columns(m, v):
    """Divide each row elementwise by vector v (ref: divide_columns.hpp)."""
    return jnp.asarray(m) / jnp.asarray(v)[..., None, :]


def transpose(m):
    return jnp.swapaxes(jnp.asarray(m), -1, -2)


trace = jnp.trace


def to_vector(x):
    x = jnp.asarray(x)
    # Stan matrices are column-major: to_vector stacks columns
    if x.ndim >= 2:
        return jnp.swapaxes(x, -1, -2).reshape(*x.shape[:-2], -1)
    return x.reshape(-1)


def to_row_vector(x):
    return to_vector(x)


def to_matrix(x, m=None, n=None):
    x = jnp.asarray(x)
    if m is None:
        return jnp.atleast_2d(x)
    # Stan reads the SOURCE column-major too (Eigen::Map over the matrix's
    # storage), so matrix inputs must be flattened column-by-column before
    # the column-major (n, m).T refill — a C-order reshape of a matrix
    # input would walk it row-major and permute the entries
    return to_vector(x).reshape(n, m).T


def to_array_1d(x):
    return to_vector(x)


def to_array_2d(x):
    return jnp.asarray(x)


# --- 1-based indexing helpers (ref: block.hpp, head.hpp, get_base1.hpp) -----


def block(m, i, j, nrows, ncols):
    """Submatrix at 1-based (i, j) (ref: block.hpp)."""
    return jnp.asarray(m)[..., i - 1 : i - 1 + nrows, j - 1 : j - 1 + ncols]


def row(m, i):
    return jnp.asarray(m)[..., i - 1, :]


def col(m, j):
    return jnp.asarray(m)[..., :, j - 1]


def head(v, n):
    return jnp.asarray(v)[..., :n]


def tail(v, n):
    return jnp.asarray(v)[..., -n:]


def segment(v, i, n):
    """n elements starting at 1-based i (ref: segment.hpp)."""
    return jnp.asarray(v)[..., i - 1 : i - 1 + n]


def sub_col(m, i, j, nrows):
    return jnp.asarray(m)[..., i - 1 : i - 1 + nrows, j - 1]


def sub_row(m, i, j, ncols):
    return jnp.asarray(m)[..., i - 1, j - 1 : j - 1 + ncols]


def get_base1(x, i, *idxs):
    """1-based element access (ref: get_base1.hpp)."""
    out = jnp.asarray(x)[i - 1]
    for k in idxs:
        out = out[k - 1]
    return out


get_base1_lhs = get_base1  # assignment-lvalue variant is N/A functionally


# --- predicates & value utilities (ref: is_*.hpp, value_of.hpp) -------------


def is_nan(x):
    return jnp.isnan(x)


def is_inf(x):
    return jnp.isinf(x)


def is_any_nan(*xs):
    out = jnp.asarray(False)
    for x in xs:
        out = out | jnp.any(jnp.isnan(jnp.asarray(x, dtype=jnp.result_type(x, 1.0))))
    return out


def is_integer(x):
    x = jnp.asarray(x)
    return jnp.floor(x) == x


def is_nonpositive_integer(x):
    x = jnp.asarray(x)
    return (x <= 0) & (jnp.floor(x) == x)


def as_bool(x):
    return jnp.asarray(x) != 0


def if_else(c, a, b):
    return jnp.where(c, a, b)


def logical_and(a, b):
    return ((jnp.asarray(a) != 0) & (jnp.asarray(b) != 0)).astype(jnp.int32)


def logical_or(a, b):
    return ((jnp.asarray(a) != 0) | (jnp.asarray(b) != 0)).astype(jnp.int32)


def logical_negation(a):
    return (jnp.asarray(a) == 0).astype(jnp.int32)


def logical_eq(a, b):
    return (jnp.asarray(a) == jnp.asarray(b)).astype(jnp.int32)


def logical_neq(a, b):
    return (jnp.asarray(a) != jnp.asarray(b)).astype(jnp.int32)


def logical_lt(a, b):
    return (jnp.asarray(a) < jnp.asarray(b)).astype(jnp.int32)


def logical_lte(a, b):
    return (jnp.asarray(a) <= jnp.asarray(b)).astype(jnp.int32)


def logical_gt(a, b):
    return (jnp.asarray(a) > jnp.asarray(b)).astype(jnp.int32)


def logical_gte(a, b):
    return (jnp.asarray(a) >= jnp.asarray(b)).astype(jnp.int32)


def value_of(x):
    """Strip derivative information (ref: value_of.hpp == stop_gradient)."""
    return jax.lax.stop_gradient(x)


value_of_rec = value_of
primitive_value = value_of


def size_zero(*xs):
    return any(int(np.prod(jnp.shape(x), dtype=np.int64)) == 0 for x in xs)


def ibeta(a, b, x):
    """Regularized incomplete beta (ref: ibeta.hpp -> boost ibeta)."""
    return inc_beta(a, b, x)


def binomial_coefficient_log(n, k):
    return _sp.lchoose(n, k)


def finite_diff_stepsize(u):
    """cbrt(eps) * max(1, |u|) (ref: finite_diff_stepsize.hpp)."""
    eps_cbrt = float(np.cbrt(np.finfo(np.float64).eps))
    return eps_cbrt * jnp.maximum(1.0, jnp.abs(u))


def stan_print(fmt_or_value, *args):
    """Print from traced code (ref: stan_print.hpp -> jax.debug.print)."""
    if args:
        jax.debug.print(fmt_or_value, *args)
    else:
        jax.debug.print("{}", fmt_or_value)


def matrix_exp_pade(m):
    """Pade matrix exponential (ref: matrix_exp_pade.hpp); XLA's expm IS a
    scaled Pade 13 implementation."""
    return matrix_exp(m)


# --- accumulators (ref: accumulator.hpp, welford_{var,covar}_estimator.hpp) -


class accumulator:
    """Functional log-prob accumulator (ref: accumulator.hpp)."""

    def __init__(self):
        self._terms = []

    def add(self, x):
        self._terms.append(jnp.sum(jnp.asarray(x)))
        return self

    def sum(self):  # noqa: A003
        if not self._terms:
            return jnp.asarray(0.0)
        out = self._terms[0]
        for t in self._terms[1:]:
            out = out + t
        return out


class welford_var_estimator:
    """Online mean/variance (ref: welford_var_estimator.hpp).

    Stateful convenience facade over the functional core used by warmup
    adaptation (``infer.adapt.welford_init/update``, kept functional there
    for use inside ``lax.scan``)."""

    def __init__(self, dim, dtype=jnp.float64):
        self._n = 0.0
        self._mean = jnp.zeros(dim, dtype=dtype)
        self._m2 = jnp.zeros(dim, dtype=dtype)

    def add_sample(self, x):
        x = jnp.asarray(x)
        self._n += 1.0
        delta = x - self._mean
        self._mean = self._mean + delta / self._n
        self._m2 = self._m2 + delta * (x - self._mean)

    def num_samples(self):
        return self._n

    def sample_mean(self):
        return self._mean

    def sample_variance(self):
        return self._m2 / (self._n - 1.0)


class welford_covar_estimator:
    """Online mean/covariance (ref: welford_covar_estimator.hpp)."""

    def __init__(self, dim, dtype=jnp.float64):
        self._n = 0.0
        self._mean = jnp.zeros(dim, dtype=dtype)
        self._m2 = jnp.zeros((dim, dim), dtype=dtype)

    def add_sample(self, x):
        x = jnp.asarray(x)
        self._n += 1.0
        delta = x - self._mean
        self._mean = self._mean + delta / self._n
        self._m2 = self._m2 + jnp.outer(x - self._mean, delta)

    def num_samples(self):
        return self._n

    def sample_mean(self):
        return self._mean

    def sample_covariance(self):
        return self._m2 / (self._n - 1.0)


# --- names with no runtime analog here --------------------------------------

NOT_APPLICABLE = {
    # C++ compile-time metaprogramming: types, not runtime functions
    "common_type": "C++ type trait; jnp dtype promotion plays this role",
    "promote_common": "C++ type promotion; jnp.result_type",
    "promote_elements": "C++ type promotion; jnp.result_type",
    "promote_scalar": "C++ type promotion; jnp.asarray(dtype=...)",
    "promote_scalar_type": "C++ type trait",
    "typedefs": "Eigen typedef header",
    "Eigen": "Eigen forward-declaration header",
    "MatrixExponential.h": "vendored Eigen internal; matrix_exp covers it",
    "matrix_exp_action_handler": (
        "implemented: ops/linalg._expm_action_core (shifted truncated-Taylor"
        " action with static substeps), dispatched by matrix_exp_multiply"
    ),
    "boost_policy": "boost error-policy configuration header",
    "constants": "constants live in math_tpu.special.basic (LOG_TWO, ...)",
    "is_uninitialized": "no uninitialized vars in a functional framework",
    "resize": "shapes are static under XLA; allocate with rep_*/fill",
    "assign": "in-place assignment; use jnp .at[].set functional updates",
    "get_lp": "Stan-language accumulator plumbing; model layer handles lp",
    "sort_indices": "internal comparator of sort_indices_{asc,desc}",
    "read_corr_matrix": None,  # provided (transforms); listed for clarity
    "stan_print": None,  # provided above
}
NOT_APPLICABLE = {k: v for k, v in NOT_APPLICABLE.items() if v is not None}
