"""Line-by-line parity of the flat Stan-name surface (``math_tpu.stan``)
against the reference's ``prim/{scal,arr,mat}/fun`` file inventory
(SURVEY.md §2.3).

The three lists below are the exact ``.hpp`` basenames of the reference's
function directories (129 + 18 + 216 files, generated from the tree at
survey time).  Every name must resolve to a callable/class attribute of
``math_tpu.stan`` (possibly under a mapped name) or be present in
``math_tpu.stan.NOT_APPLICABLE`` with a reason.
"""

import math_tpu.stan as stan

SCAL_FUN = [
    "F32", "Phi", "Phi_approx", "abs", "acosh", "as_bool", "asinh",
    "atanh", "bessel_first_kind", "bessel_second_kind", "beta",
    "binary_log_loss", "binomial_coefficient_log", "boost_policy", "cbrt",
    "choose", "common_type", "constants", "corr_constrain", "corr_free",
    "digamma", "distance", "divide", "erf", "erfc", "exp", "exp2",
    "expm1", "falling_factorial", "fdim", "fill", "finite_diff_stepsize",
    "fma", "fmax", "fmin", "gamma_p", "gamma_q", "grad_2F1", "grad_F32",
    "grad_inc_beta", "grad_reg_inc_beta", "grad_reg_inc_gamma",
    "grad_reg_lower_inc_gamma", "hypot", "ibeta", "identity_constrain",
    "identity_free", "if_else", "inc_beta", "inc_beta_dda",
    "inc_beta_ddb", "inc_beta_ddz", "int_step", "inv", "inv_Phi",
    "inv_cloglog", "inv_logit", "inv_sqrt", "inv_square", "is_any_nan",
    "is_inf", "is_integer", "is_nan", "is_nonpositive_integer",
    "is_uninitialized", "lb_constrain", "lb_free", "lbeta", "ldexp",
    "lgamma", "lmgamma", "log", "log1m", "log1m_exp", "log1m_inv_logit",
    "log1p", "log1p_exp", "log2", "log_diff_exp", "log_falling_factorial",
    "log_inv_logit", "log_inv_logit_diff", "log_mix",
    "log_modified_bessel_first_kind", "log_rising_factorial",
    "log_sum_exp", "logical_and", "logical_eq", "logical_gt",
    "logical_gte", "logical_lt", "logical_lte", "logical_negation",
    "logical_neq", "logical_or", "logit", "lub_constrain", "lub_free",
    "modified_bessel_first_kind", "modified_bessel_second_kind",
    "modulus", "multiply_log", "offset_multiplier_constrain",
    "offset_multiplier_free", "owens_t", "positive_constrain",
    "positive_free", "primitive_value", "prob_constrain", "prob_free",
    "promote_elements", "promote_scalar", "promote_scalar_type",
    "rising_factorial", "round", "sign", "size_zero", "sqrt", "square",
    "squared_distance", "step", "sum", "tgamma", "trigamma", "trunc",
    "ub_constrain", "ub_free", "value_of", "value_of_rec",
]
ARR_FUN = [
    "array_builder", "common_type", "dot", "dot_self", "fill",
    "inverse_softmax", "log_sum_exp", "promote_elements",
    "promote_scalar", "promote_scalar_type", "rep_array", "scaled_add",
    "sort_asc", "sort_desc", "sum", "value_of", "value_of_rec",
    "vec_concat",
]
MAT_FUN = [
    "Eigen", "LDLT_factor", "MatrixExponential.h", "Phi", "Phi_approx",
    "accumulator", "acos", "acosh", "add", "add_diag", "append_array",
    "append_col", "append_row", "asin", "asinh", "assign", "atan",
    "atanh", "autocorrelation", "autocovariance", "block", "cbrt", "ceil",
    "chol2inv", "cholesky_corr_constrain", "cholesky_corr_free",
    "cholesky_decompose", "cholesky_factor_constrain",
    "cholesky_factor_free", "col", "cols", "columns_dot_product",
    "columns_dot_self", "common_type", "corr_matrix_constrain",
    "corr_matrix_free", "cos", "cosh", "cov_exp_quad",
    "cov_matrix_constrain", "cov_matrix_constrain_lkj", "cov_matrix_free",
    "cov_matrix_free_lkj", "crossprod", "csr_extract_u", "csr_extract_v",
    "csr_extract_w", "csr_matrix_times_vector", "csr_to_dense_matrix",
    "csr_u_to_z", "cumulative_sum", "determinant", "diag_matrix",
    "diag_post_multiply", "diag_pre_multiply", "diagonal", "digamma",
    "dims", "distance", "divide", "divide_columns", "dot_product",
    "dot_self", "eigenvalues_sym", "eigenvectors_sym", "elt_divide",
    "elt_multiply", "erf", "erfc", "exp", "exp2", "expm1", "fabs",
    "factor_U", "factor_cov_matrix", "fill", "floor", "get_base1",
    "get_base1_lhs", "get_lp", "gp_dot_prod_cov", "gp_exp_quad_cov",
    "gp_exponential_cov", "gp_matern32_cov", "gp_matern52_cov",
    "gp_periodic_cov", "head", "initialize", "inv", "inv_Phi",
    "inv_cloglog", "inv_logit", "inv_sqrt", "inv_square", "inverse",
    "inverse_spd", "lgamma", "log", "log10", "log1m", "log1m_exp",
    "log1m_inv_logit", "log1p", "log1p_exp", "log2", "log_determinant",
    "log_determinant_ldlt", "log_determinant_spd", "log_inv_logit",
    "log_mix", "log_softmax", "log_sum_exp", "logit", "make_nu",
    "matrix_exp", "matrix_exp_2x2", "matrix_exp_action_handler",
    "matrix_exp_multiply", "matrix_exp_pade", "matrix_power", "max",
    "mdivide_left", "mdivide_left_ldlt", "mdivide_left_spd",
    "mdivide_left_tri", "mdivide_left_tri_low", "mdivide_right",
    "mdivide_right_ldlt", "mdivide_right_spd", "mdivide_right_tri",
    "mdivide_right_tri_low", "mean", "min", "minus", "multiply",
    "multiply_lower_tri_self_transpose", "num_elements",
    "ordered_constrain", "ordered_free", "positive_ordered_constrain",
    "positive_ordered_free", "prod", "promote_common", "promote_elements",
    "promote_scalar", "promote_scalar_type", "qr_Q", "qr_R", "qr_thin_Q",
    "qr_thin_R", "quad_form", "quad_form_diag", "quad_form_sym", "rank",
    "read_corr_L", "read_corr_matrix", "read_cov_L", "read_cov_matrix",
    "rep_matrix", "rep_row_vector", "rep_vector", "resize", "round",
    "row", "rows", "rows_dot_product", "rows_dot_self",
    "scale_matrix_exp_multiply", "sd", "segment", "simplex_constrain",
    "simplex_free", "sin", "singular_values", "sinh", "size", "softmax",
    "sort_asc", "sort_desc", "sort_indices", "sort_indices_asc",
    "sort_indices_desc", "sqrt", "square", "squared_distance",
    "stan_print", "sub_col", "sub_row", "subtract", "sum", "tail", "tan",
    "tanh", "tcrossprod", "tgamma", "to_array_1d", "to_array_2d",
    "to_matrix", "to_row_vector", "to_vector", "trace",
    "trace_gen_inv_quad_form_ldlt", "trace_gen_quad_form",
    "trace_inv_quad_form_ldlt", "trace_quad_form", "transpose",
    "trigamma", "trunc", "typedefs", "unit_vector_constrain",
    "unit_vector_free", "value_of", "value_of_rec", "variance",
    "welford_covar_estimator", "welford_var_estimator",
]

# reference file -> attribute name when they differ
RENAMES = {
    "dot": "dot_product",
    "Eigen": None,
    "MatrixExponential.h": None,
}


def _covered(name):
    if name in stan.NOT_APPLICABLE:
        return True
    name = RENAMES.get(name, name)
    if name is None:
        return name in stan.NOT_APPLICABLE
    return hasattr(stan, name)


def test_scal_fun_surface():
    missing = [n for n in SCAL_FUN if not _covered(n)]
    assert not missing, f"prim/scal/fun names unmapped: {missing}"


def test_arr_fun_surface():
    missing = [n for n in ARR_FUN if not _covered(n)]
    assert not missing, f"prim/arr/fun names unmapped: {missing}"


def test_mat_fun_surface():
    missing = [n for n in MAT_FUN if not _covered(n)]
    assert not missing, f"prim/mat/fun names unmapped: {missing}"


def test_na_list_is_tight():
    """Everything marked N/A must actually be in the reference inventory."""
    inv = set(SCAL_FUN) | set(ARR_FUN) | set(MAT_FUN)
    stray = [n for n in stan.NOT_APPLICABLE if n not in inv]
    assert not stray, f"NOT_APPLICABLE entries not in the reference: {stray}"


ERR_FUN = [
    "check_2F1_converges", "check_3F2_converges", "check_bounded",
    "check_cholesky_factor", "check_cholesky_factor_corr",
    "check_column_index", "check_consistent_size",
    "check_consistent_size_mvt", "check_consistent_sizes",
    "check_consistent_sizes_mvt", "check_corr_matrix", "check_cov_matrix",
    "check_finite", "check_flag_sundials", "check_greater",
    "check_greater_or_equal", "check_ldlt_factor", "check_less",
    "check_less_or_equal", "check_lower_triangular",
    "check_matching_dims", "check_matching_sizes", "check_multiplicable",
    "check_nonempty", "check_nonnegative", "check_nonzero_size",
    "check_not_nan", "check_ordered", "check_pos_definite",
    "check_pos_semidefinite", "check_positive", "check_positive_finite",
    "check_positive_ordered", "check_range", "check_row_index",
    "check_simplex", "check_size_match", "check_square",
    "check_std_vector_index", "check_symmetric", "check_unit_vector",
    "check_vector", "constraint_tolerance", "domain_error",
    "domain_error_vec", "invalid_argument", "invalid_argument_vec",
    "is_cholesky_factor", "is_cholesky_factor_corr", "is_column_index",
    "is_corr_matrix", "is_ldlt_factor", "is_less_or_equal",
    "is_lower_triangular", "is_mat_finite", "is_matching_dims",
    "is_matching_size", "is_nonzero_size", "is_not_nan", "is_ordered",
    "is_pos_definite", "is_positive", "is_scal_finite", "is_size_match",
    "is_square", "is_symmetric", "is_unit_vector", "out_of_range",
    "system_error", "validate_non_negative_index",
]


def test_err_surface():
    """Every prim/*/err validator name resolves in math_tpu.utils.checks."""
    from math_tpu.utils import checks

    missing = [n for n in ERR_FUN if not hasattr(checks, n)]
    assert not missing, f"prim err names unmapped: {missing}"
