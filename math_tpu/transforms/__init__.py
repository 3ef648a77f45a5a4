"""Constraint transforms: unconstrained R^n <-> constrained manifolds.

Reference: the ``*_constrain`` / ``*_free`` pairs in
``prim/scal/fun/{lb,ub,lub,offset_multiplier,positive,prob,corr}_constrain.hpp``
and ``prim/mat/fun/{ordered,positive_ordered,simplex,unit_vector,
cholesky_corr,cholesky_factor,corr_matrix,cov_matrix}_constrain.hpp``.

Every ``*_constrain_lp`` returns ``(constrained_value, log|det J|)`` with the
Jacobian accumulation matching the reference exactly (same identities, same
dropped/retained constants).  Implementations are vectorized jnp (cumprod /
cumsum formulations) rather than the reference's sequential loops, so they
map onto the VPU and stay ``vmap``/``grad`` friendly.
"""

from math_tpu.transforms.scalar import (  # noqa: F401
    identity_constrain,
    identity_free,
    lb_constrain,
    lb_constrain_lp,
    lb_free,
    ub_constrain,
    ub_constrain_lp,
    ub_free,
    lub_constrain,
    lub_constrain_lp,
    lub_free,
    offset_multiplier_constrain,
    offset_multiplier_constrain_lp,
    offset_multiplier_free,
    positive_constrain,
    positive_constrain_lp,
    positive_free,
    prob_constrain,
    prob_constrain_lp,
    prob_free,
    corr_constrain,
    corr_constrain_lp,
    corr_free,
)
from math_tpu.transforms.vector import (  # noqa: F401
    ordered_constrain,
    ordered_constrain_lp,
    ordered_free,
    positive_ordered_constrain,
    positive_ordered_constrain_lp,
    positive_ordered_free,
    simplex_constrain,
    simplex_constrain_lp,
    simplex_free,
    unit_vector_constrain,
    unit_vector_constrain_lp,
    unit_vector_free,
)
from math_tpu.transforms.matrix import (  # noqa: F401
    cholesky_corr_constrain,
    cholesky_corr_constrain_lp,
    cholesky_corr_free,
    cholesky_factor_constrain,
    cholesky_factor_constrain_lp,
    cholesky_factor_free,
    corr_matrix_constrain,
    corr_matrix_constrain_lp,
    corr_matrix_free,
    cov_matrix_constrain,
    cov_matrix_constrain_lp,
    cov_matrix_free,
    cov_matrix_constrain_lkj,
    cov_matrix_constrain_lkj_lp,
    cov_matrix_free_lkj,
    read_corr_L,
    read_corr_matrix,
    read_cov_L,
    read_cov_matrix,
    factor_U,
    factor_cov_matrix,
    make_nu,
)
from math_tpu.transforms.api import (  # noqa: F401
    Transform,
    Identity,
    LowerBound,
    UpperBound,
    Bounded,
    OffsetMultiplier,
    Ordered,
    PositiveOrdered,
    Simplex,
    UnitVector,
    CholeskyCorr,
    CholeskyCov,
    CorrMatrix,
    CovMatrix,
)
